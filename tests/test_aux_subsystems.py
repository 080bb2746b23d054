"""Aux subsystems: profiling counters, checkpointed sweeps, config."""
import os

import numpy as np
import pytest

from lightkurve_tpu import LightCurve, diagnostics
from lightkurve_tpu.batch import LightCurveStack
from lightkurve_tpu.collections import LightCurveCollection
from lightkurve_tpu.parallel.checkpoint import SweepRunner


def test_kernel_timers():
    diagnostics.reset()
    with diagnostics.KernelTimer("block"):
        np.sum(np.arange(1000))

    @diagnostics.timed("fn")
    def f(x):
        return x * 2

    f(np.arange(10))
    f(np.arange(10))
    rep = diagnostics.report()
    assert rep["block"]["calls"] == 1
    assert rep["fn"]["calls"] == 2
    assert rep["fn"]["total_s"] >= 0
    diagnostics.reset()
    assert diagnostics.report() == {}


def _make_stack(rng, B=2, n=400, period=2.3):
    t = np.arange(n) * 0.02
    lcs = []
    for _ in range(B):
        y = np.ones(n) + 5e-4 * rng.standard_normal(n)
        ph = np.mod(t - 0.5 + period / 2, period) - period / 2
        y[np.abs(ph) < 0.05] -= 0.01
        lcs.append(LightCurve(time=t, flux=y, flux_err=np.full(n, 5e-4)))
    return LightCurveCollection(lcs).to_stack(pad_to_pow2=False)


def test_sweep_checkpoint_resume(tmp_path, rng):
    stack = _make_stack(rng)
    periods = np.linspace(1.5, 3.5, 64)
    durations = np.array([0.1])
    ckpt = str(tmp_path / "sweep.npz")

    # full run in one go
    full = SweepRunner(stack, periods, durations, ckpt + ".ref",
                       chunk_periods=16).run()
    # interrupted run: 2 chunks, then a fresh runner resumes
    r1 = SweepRunner(stack, periods, durations, ckpt, chunk_periods=16)
    r1.run(max_chunks=2)
    assert not r1.done
    r2 = SweepRunner(stack, periods, durations, ckpt, chunk_periods=16)
    assert r2.next_chunk == 2
    resumed = r2.run()
    assert r2.done
    np.testing.assert_allclose(resumed["power"], full["power"], rtol=1e-9)
    np.testing.assert_allclose(resumed["period"], full["period"],
                               rtol=1e-12)
    assert abs(resumed["period"][0] - 2.3) < 0.1


def test_config_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    from lightkurve_tpu.config import Conf, get_cache_dir
    conf = Conf()
    conf.cache_dir = str(tmp_path / "cache")
    conf.fft_backend = "custom"
    conf.save()
    conf2 = Conf()
    assert conf2.cache_dir == str(tmp_path / "cache")
    assert conf2.fft_backend == "custom"
    os.makedirs(conf2.cache_dir, exist_ok=True)
    assert get_cache_dir()  # resolves without error


def test_sweep_shared_method_matches_fast(tmp_path, rng):
    """method='shared' (MXU batched kernel + device-side winner
    reduction) recovers the same winners as the per-curve binned path on
    a shared time grid."""
    stack = _make_stack(rng, B=4)
    periods = np.linspace(1.5, 3.5, 64)
    durations = np.array([0.1])
    fast = SweepRunner(stack, periods, durations,
                       str(tmp_path / "a.npz"), chunk_periods=16).run()
    shared = SweepRunner(stack, periods, durations,
                         str(tmp_path / "b.npz"), chunk_periods=16,
                         method="shared").run()
    np.testing.assert_allclose(shared["power"], fast["power"], rtol=1e-6)
    np.testing.assert_allclose(shared["period"], fast["period"],
                               rtol=1e-12)


def test_sweep_mesh_sharded_matches_single(tmp_path, rng):
    """SweepRunner(mesh=...) shards each period chunk over the device
    mesh (targets x grid) while keeping host checkpoint/resume — the
    combined scaling + fault-tolerance path for sector-scale sweeps."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from lightkurve_tpu.parallel.grid import make_mesh
    stack = _make_stack(rng, B=4)
    periods = np.linspace(1.5, 3.5, 64)
    durations = np.array([0.1])
    ref = SweepRunner(stack, periods, durations,
                      str(tmp_path / "a.npz"), chunk_periods=16).run()
    mesh = make_mesh(n_targets_axis=2, n_grid_axis=4)
    runner = SweepRunner(stack, periods, durations,
                         str(tmp_path / "b.npz"), chunk_periods=16,
                         mesh=mesh)
    out = runner.run(max_chunks=2)
    assert not runner.done
    # resume with a fresh runner (checkpoint carries the partial state)
    runner2 = SweepRunner(stack, periods, durations,
                          str(tmp_path / "b.npz"), chunk_periods=16,
                          mesh=mesh)
    out = runner2.run()
    np.testing.assert_allclose(out["power"], ref["power"], rtol=1e-6)
    np.testing.assert_allclose(out["period"], ref["period"], rtol=1e-12)
