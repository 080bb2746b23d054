"""Memory-stress tier (reference runs a dedicated memtest CI job;
SURVEY.md §4 tier 5, conftest.py:28-43).  Skipped unless ``-m memtest``.

Each test pushes one subsystem to a size where accidental O(B·N·P)
materialization or host-copy blowups would exhaust memory, and asserts
both correctness of a spot value and (where measurable) a resident-set
bound.
"""
import gc
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.memtest


def _rss_mb():
    try:
        with open(f"/proc/{os.getpid()}/statm") as fh:
            return int(fh.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") \
                / 1e6
    except Exception:
        return None


def test_sweep_runner_streaming_memory(tmp_path, rng):
    """A 128-curve x 6k-period sweep holds only (B,) winner state on
    host — resident set must not grow by more than ~the input stack.
    (Sized for the CPU test backend; the 10^4 x 10^5 version runs on
    hardware via tools/northstar_run.py → NORTHSTAR.json.)"""
    from lightkurve_tpu.batch import LightCurveStack
    from lightkurve_tpu.parallel.checkpoint import SweepRunner
    B, N, P = 128, 4096, 6000
    t = np.arange(N) * 0.004
    flux = 1.0 + 1e-4 * rng.standard_normal((B, N))
    ph = np.mod(t - 0.5 + 1.15, 2.3) - 1.15
    flux[:, np.abs(ph) < 0.05] -= 5e-3
    stack = LightCurveStack(
        time=jnp.asarray(np.broadcast_to(t, (B, N)), jnp.float32),
        flux=jnp.asarray(flux, jnp.float32),
        flux_err=jnp.full((B, N), 1e-4, jnp.float32),
        mask=jnp.ones((B, N), bool))
    gc.collect()
    rss0 = _rss_mb()
    runner = SweepRunner(stack, np.linspace(1.5, 3.5, P),
                         np.array([0.1]), str(tmp_path / "s.npz"),
                         chunk_periods=1500, method="shared",
                         save_every=2)
    best = runner.run()
    assert np.isfinite(best["power"]).all()
    assert np.abs(np.median(best["period"]) - 2.3) < 0.1
    if rss0 is not None:
        growth = _rss_mb() - rss0
        # full (B, P) fields would be 128*6000*8 fields*8B ≈ 50 MB;
        # XLA CPU workspace dominates — bound the total loosely
        assert growth < 600, f"sweep held too much on host: +{growth:.0f}MB"


def test_tpf_stack_photometry_memory(rng):
    """1000 TPF cubes (6x6x500) through photometry+PLD on device."""
    from lightkurve_tpu.batch import TPFStack
    B, T, H, W = 1000, 500, 6, 6
    cube = rng.normal(1.0, 0.01, (B, T, H, W)).astype(np.float32)
    trend = 1.0 + 0.02 * np.sin(np.arange(T) * 0.06)
    # each core pixel responds to the pointing systematic differently —
    # the flux-normalized pixel series PLD regresses on
    amps = np.array([[60.0, 35.0], [25.0, 15.0]])
    for di in range(2):
        for dj in range(2):
            cube[:, :, 2 + di, 2 + dj] += (
                amps[di, dj] * trend[None, :] ** (1 + di + dj))
    ap = np.zeros((B, H, W), bool)
    ap[:, 2:4, 2:4] = True
    stack = TPFStack(flux=jnp.asarray(cube),
                     flux_err=jnp.full(cube.shape, 0.01, jnp.float32),
                     time=jnp.broadcast_to(
                         jnp.arange(T, dtype=jnp.float32) * 0.02, (B, T)),
                     aperture=jnp.asarray(ap))
    out = stack.pld_correct(n_pca_terms=2)
    corr = np.asarray(out.flux)
    assert corr.shape == (B, T)
    assert np.isfinite(corr).all()
    raw = np.asarray(stack.extract_aperture_photometry().flux)
    assert (np.std(corr, axis=1) < 0.5 * np.std(raw, axis=1)).all()


def test_long_cadence_flatten_memory(rng):
    """A single quarter-million-cadence curve (20-s TESS fast cadence
    scale) through flatten without materializing O(N·window)
    intermediates.  (Sized for the f64 CPU test backend; bench.py
    exercises the (512, 8192) f32 version on hardware.)"""
    from lightkurve_tpu import LightCurve
    N = 250_000
    t = np.arange(N) * (20.0 / 86400)
    flux = (1.0 + 0.01 * np.sin(2 * np.pi * t / 7.0)
            + 1e-4 * rng.standard_normal(N)).astype(np.float32)
    lc = LightCurve(time=t, flux=flux)
    flat = lc.flatten(window_length=201)
    fv = np.asarray(flat.flux.value)
    assert fv.shape == (N,)
    assert abs(np.nanmedian(fv) - 1.0) < 1e-3
    assert np.nanstd(fv) < 5e-4   # trend removed


def test_periodogram_grid_guard_before_allocation():
    """The >1e7-point BLS grid guard fires BEFORE any device allocation
    (reference periodogram.py:1144-1158)."""
    from lightkurve_tpu import LightCurve
    t = np.arange(20000) * 0.0001
    lc = LightCurve(time=t, flux=np.ones(20000),
                    flux_err=np.full(20000, 1e-4))
    with pytest.raises(ValueError, match="too large"):
        lc.to_periodogram(method="bls", frequency_factor=1e-5)


def test_sparse_spline_100_knots_memory(rng):
    """SparseDesignMatrix is dense-backed by design (TPUs have no sparse
    matmul); this pins the memory story for the reference's largest
    advertised use — a 100-knot spline over a long TESS light curve.
    Dense (N, ~102) f64 at N=120k is ~100 MB; regression solve included."""
    from lightkurve_tpu import LightCurve
    from lightkurve_tpu.correctors import (RegressionCorrector,
                                           create_sparse_spline_matrix)
    N = 120_000
    t = np.arange(N) * (2.0 / 60 / 24)
    trend = 1.0 + 0.01 * np.sin(2 * np.pi * t / 5.0)
    flux = trend + 2e-4 * rng.standard_normal(N)
    gc.collect()
    rss0 = _rss_mb()
    dm = create_sparse_spline_matrix(t, n_knots=100)
    assert dm.shape == (N, dm.shape[1])
    assert dm.shape[1] >= 100
    lc = LightCurve(time=t, flux=flux, flux_err=np.full(N, 2e-4))
    corrected = RegressionCorrector(lc).correct(dm.append_constant())
    resid = np.asarray(corrected.flux.value)
    assert np.nanstd(resid) < 3 * 2e-4   # spline absorbed the trend
    if rss0 is not None:
        growth = _rss_mb() - rss0
        assert growth < 1200, f"sparse-spline path held +{growth:.0f}MB"


@pytest.mark.parametrize("bin_args", [
    dict(bins=10000), dict(binsize=10), dict(time_bin_size=20 / 60 / 24),
])
def test_bin_memory_usage(bin_args, rng):
    """Reference #1092 mirror: lc.bin() on a large stitched curve must not
    blow memory (the reference caps the address space at 1.5 GB)."""
    import resource
    from lightkurve_tpu import LightCurve, LightCurveCollection

    n = 120_000
    base = LightCurve(time=np.arange(n) * 2.0 / 60 / 24,
                      flux=1 + 0.001 * rng.standard_normal(n),
                      flux_err=0.001 * np.ones(n))
    lcc = [base]
    duration = base.time.value.max() - base.time.value.min()
    for i in range(1, 10):
        c = base.copy()
        c.time = c.time.value + (duration + 1.0) * i
        lcc.append(c)
    lc = LightCurveCollection(lcc).stitch(corrector_func=None)

    soft, hard = resource.getrlimit(resource.RLIMIT_AS)
    limit = int(3.0 * 1024 ** 3)
    try:
        resource.setrlimit(resource.RLIMIT_AS, (limit, hard))
        lc.bin(**bin_args)
    finally:
        resource.setrlimit(resource.RLIMIT_AS, (soft, hard))
