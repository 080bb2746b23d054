"""Sector-bucketed shared sweeps over heterogeneous time grids.

VERDICT r4 item 4: the fast (MXU-matmul) BLS path required one shared
time grid per batch; real workloads mix sectors/cadences.  SweepRunner's
shared method now buckets curves by time grid, runs the shared kernel per
bucket, and scatters winners back — these tests pin equality against
per-group runs, kill/resume, and the injected-signal recovery.
"""
import numpy as np
import pytest

from lightkurve_tpu import LightCurve, LightCurveCollection
from lightkurve_tpu.batch import LightCurveStack
from lightkurve_tpu.parallel.checkpoint import SweepRunner

import jax.numpy as jnp


def _hetero_stack(rng, groups=((6, 0.0), (5, 3.1), (4, 7.7)), n=400,
                  period=2.3):
    """A stack whose curves come from len(groups) distinct time grids
    (same cadence, different epochs — the multi-sector case)."""
    lcs, group_of = [], []
    for gi, (count, t0) in enumerate(groups):
        t = t0 + np.arange(n) * 0.02
        for _ in range(count):
            y = np.ones(n) + 5e-4 * rng.standard_normal(n)
            ph = np.mod(t - 0.5 + period / 2, period) - period / 2
            y[np.abs(ph) < 0.05] -= 0.01
            lcs.append(LightCurve(time=t, flux=y,
                                  flux_err=np.full(n, 5e-4)))
            group_of.append(gi)
    # interleave the groups so bucketing must handle scattered rows
    order = np.argsort(rng.random(len(lcs)), kind="stable")
    lcs = [lcs[i] for i in order]
    group_of = [group_of[i] for i in order]
    stack = LightCurveCollection(lcs).to_stack(pad_to_pow2=False)
    return stack, np.asarray(group_of), order


def test_bucketed_matches_per_group_runs(tmp_path, rng):
    """The bucketed sweep equals running each time-grid group through its
    own homogeneous shared sweep."""
    stack, group_of, _ = _hetero_stack(rng)
    periods = np.linspace(1.5, 3.5, 64)
    durations = np.array([0.1])

    out = SweepRunner(stack, periods, durations,
                      str(tmp_path / "het.npz"), chunk_periods=16,
                      method="shared").run()

    for gi in np.unique(group_of):
        idx = np.flatnonzero(group_of == gi)
        sub = LightCurveStack(time=stack.time[idx], flux=stack.flux[idx],
                              flux_err=stack.flux_err[idx],
                              mask=stack.mask[idx])
        ref = SweepRunner(sub, periods, durations,
                          str(tmp_path / f"g{gi}.npz"), chunk_periods=16,
                          method="shared").run()
        for f in ("power", "period", "depth", "duration", "transit_time"):
            np.testing.assert_allclose(
                out[f][idx], ref[f], rtol=1e-6, atol=1e-9,
                err_msg=f"bucketed vs per-group mismatch in {f} "
                        f"(group {gi})")


def test_bucketed_recovers_injected_period(tmp_path, rng):
    stack, _, _ = _hetero_stack(rng, period=2.3)
    periods = np.linspace(1.5, 3.5, 128)
    out = SweepRunner(stack, periods, np.array([0.1]),
                      str(tmp_path / "rec.npz"), chunk_periods=32,
                      method="shared").run()
    assert np.all(np.abs(out["period"] - 2.3) < 0.1)


def test_bucketed_kill_resume(tmp_path, rng):
    stack, _, _ = _hetero_stack(rng)
    periods = np.linspace(1.5, 3.5, 64)
    durations = np.array([0.1])
    kw = dict(chunk_periods=16, method="shared")
    full = SweepRunner(stack, periods, durations,
                       str(tmp_path / "full.npz"), **kw).run()
    r1 = SweepRunner(stack, periods, durations,
                     str(tmp_path / "kill.npz"), **kw)
    r1.run(max_chunks=2)
    assert not r1.done
    r2 = SweepRunner(stack, periods, durations,
                     str(tmp_path / "kill.npz"), **kw)
    assert r2.next_chunk == 2
    resumed = r2.run()
    for f in ("power", "period"):
        np.testing.assert_array_equal(resumed[f], full[f])


def test_bucketed_with_masked_cadences(tmp_path, rng):
    """Non-uniform weights (masked cadences) route through the weighted
    kernel per bucket and still match per-group runs."""
    stack, group_of, _ = _hetero_stack(rng, groups=((3, 0.0), (3, 5.0)))
    mask = np.asarray(stack.mask).copy()
    mask[:, 10:40] = False
    stack = LightCurveStack(time=stack.time, flux=stack.flux,
                            flux_err=stack.flux_err,
                            mask=jnp.asarray(mask))
    periods = np.linspace(1.5, 3.5, 32)
    durations = np.array([0.1])
    out = SweepRunner(stack, periods, durations,
                      str(tmp_path / "m.npz"), chunk_periods=16,
                      method="shared").run()
    for gi in np.unique(group_of):
        idx = np.flatnonzero(group_of == gi)
        sub = LightCurveStack(time=stack.time[idx], flux=stack.flux[idx],
                              flux_err=stack.flux_err[idx],
                              mask=stack.mask[idx])
        ref = SweepRunner(sub, periods, durations,
                          str(tmp_path / f"m{gi}.npz"), chunk_periods=16,
                          method="shared").run()
        np.testing.assert_allclose(out["power"][idx], ref["power"],
                                   rtol=1e-6, atol=1e-9)


def test_bucketed_prewarm_covers_bucket_sizes(tmp_path, rng):
    """prewarm() compiles the padded per-bucket programs; a prewarmed
    bucketed sweep returns bit-identical results."""
    stack, _, _ = _hetero_stack(rng)
    periods = np.linspace(1.5, 3.5, 64)
    durations = np.array([0.1])
    plain = SweepRunner(stack, periods, durations,
                        str(tmp_path / "p.npz"), chunk_periods=16,
                        method="shared").run()
    warm_runner = SweepRunner(stack, periods, durations,
                              str(tmp_path / "w.npz"), chunk_periods=16,
                              method="shared")
    futures = warm_runner.prewarm(wait=True)
    assert futures, "prewarm returned no compile futures"
    warm = warm_runner.run()
    for f in ("power", "period"):
        np.testing.assert_array_equal(warm[f], plain[f])


def test_homogeneous_stack_does_not_bucket(tmp_path, rng):
    """A shared-grid stack must keep the single-bucket fast path (the
    bucketing branch is only for heterogeneous grids)."""
    t = np.arange(400) * 0.02
    lcs = [LightCurve(time=t, flux=np.ones(400)
                      + 5e-4 * rng.standard_normal(400),
                      flux_err=np.full(400, 5e-4)) for _ in range(3)]
    stack = LightCurveCollection(lcs).to_stack(pad_to_pow2=False)
    runner = SweepRunner(stack, np.linspace(1.5, 3.5, 32),
                         np.array([0.1]), str(tmp_path / "h.npz"),
                         chunk_periods=16, method="shared")
    step = runner._make_step()
    # the bucketed step closes over `segments`; the homogeneous one
    # doesn't
    assert "segments" not in (step.__code__.co_freevars
                              if hasattr(step, "__code__") else ())
    runner.run()
