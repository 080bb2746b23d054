"""float32 robustness: the TPU runs f32/bf16 — kernels must stay accurate.

These tests run the device kernels in float32 (as the real chip will) and
compare against the float64 path, bounding the precision loss.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from lightkurve_tpu.ops.bls import bls_power_binned
from lightkurve_tpu.ops.detrend import flatten
from lightkurve_tpu.ops.lombscargle import lombscargle_fast
from lightkurve_tpu.ops.savgol import savgol_design_matrix
from lightkurve_tpu.config import conf


@pytest.fixture(autouse=True)
def force_custom_fft():
    old = conf.fft_backend
    conf.fft_backend = "custom"
    yield
    conf.fft_backend = old


def test_ls_fast_f32_peak(rng):
    n = 4000
    t = np.arange(n) * 0.02
    y = 1.0 + 500e-6 * np.sin(2 * np.pi * t / 2.7) \
        + 100e-6 * rng.standard_normal(n)
    f0, df, Nf = 0.05, 0.001, 2000
    p64 = np.asarray(lombscargle_fast(t, jnp.asarray(y, jnp.float64),
                                      f0, df, Nf, normalization="psd"))
    p32 = np.asarray(lombscargle_fast(t, jnp.asarray(y, jnp.float32),
                                      f0, df, Nf, normalization="psd"))
    assert np.argmax(p32) == np.argmax(p64)
    # relative error at meaningful power levels
    scale = p64.max()
    assert np.max(np.abs(p32 - p64)) / scale < 5e-3


def test_bls_binned_f32(rng):
    n = 4000
    t = (np.arange(n) * 0.02)
    y = np.ones(n) + 2e-4 * rng.standard_normal(n)
    ph = np.mod(t - 1.0 + 1.65, 3.3) - 1.65
    y[np.abs(ph) < 0.07] -= 0.004
    dy = np.full(n, 2e-4)
    periods = np.linspace(2.5, 4.5, 200)
    durations = np.array([0.1, 0.15])

    def run(dt):
        out = bls_power_binned(jnp.asarray(t, dt), jnp.asarray(y, dt),
                               jnp.asarray(dy, dt),
                               jnp.asarray(periods, dt),
                               jnp.asarray(durations, dt))
        return {k: np.asarray(v) for k, v in out.items()}

    o64 = run(jnp.float64)
    o32 = run(jnp.float32)
    i64, i32 = np.argmax(o64["power"]), np.argmax(o32["power"])
    assert abs(periods[i64] - periods[i32]) < 0.05
    assert abs(o32["depth"][i32] - o64["depth"][i64]) < 5e-4


def test_flatten_f32(rng):
    n = 2000
    t = np.arange(n) * 0.02
    f = 1.0 + 0.03 * np.sin(2 * np.pi * t / 7.0) \
        + 3e-4 * rng.standard_normal(n)
    H = savgol_design_matrix(101, 2)
    valid = np.ones(n, dtype=bool)

    def run(dt):
        tr, _ = flatten(jnp.asarray(t, dt), jnp.asarray(f, dt),
                        jnp.asarray(valid), jnp.asarray(H, dt),
                        jnp.asarray(5.0, dt), jnp.asarray(3.0, dt),
                        niters=3)
        return np.asarray(tr, dtype=np.float64)

    t64 = run(jnp.float64)
    t32 = run(jnp.float32)
    assert np.max(np.abs(t32 - t64)) < 5e-4


@pytest.mark.memtest
def test_large_stack_memory(rng):
    """Memory-stress tier (reference conftest.py:28-43): a 512x16384 stack
    through flatten+BLS without exhausting host memory."""
    from lightkurve_tpu.batch import LightCurveStack
    B, N = 64, 16384
    t = np.arange(N) * 0.02
    flux = 1.0 + 1e-4 * rng.standard_normal((B, N))
    import jax.numpy as jnp
    stack = LightCurveStack(
        time=jnp.asarray(np.broadcast_to(t, (B, N)), jnp.float32),
        flux=jnp.asarray(flux, jnp.float32),
        flux_err=jnp.full((B, N), 1e-4, jnp.float32),
        mask=jnp.ones((B, N), dtype=bool))
    out = stack.bls_search(np.linspace(1.0, 5.0, 64),
                           np.array([0.1]), oversample=5)
    assert np.isfinite(np.asarray(out["power"])).all()


def test_shared_bls_mean_shift_invariance(rng):
    """The shared-batch kernel mean-shifts flux before the histogram matmul
    so TPU bf16 MXU input rounding stays relative to the SIGNAL, not the
    continuum.  Depth is exactly shift-invariant, so un-normalized e-/s
    fluxes with a large offset must give the same answer as ppm-scale
    fluxes in f32."""
    import jax.numpy as jnp
    from lightkurve_tpu.ops.bls import bls_power_shared_batch

    n = 600
    t = np.arange(n) * 0.01
    P_true = 0.9
    ph = np.mod(t + P_true / 2, P_true) - P_true / 2
    base = 1.0 + 1e-4 * rng.standard_normal(n)
    base[np.abs(ph) < 0.02] -= 2e-3
    periods = np.linspace(0.5, 1.5, 32)
    durs = np.array([0.03, 0.05])

    def run(scale):
        out = bls_power_shared_batch(
            jnp.asarray(t, jnp.float32),
            jnp.asarray(scale * base[None], jnp.float32),
            jnp.asarray(np.full((1, n), scale * 1e-4), jnp.float32),
            jnp.asarray(periods, jnp.float32), jnp.asarray(durs,
                                                           jnp.float32))
        return (np.asarray(out["power"])[0],
                np.asarray(out["depth"])[0] / scale)

    p1, d1 = run(1.0)
    p2, d2 = run(12345.0)          # raw e-/s scale
    assert periods[np.argmax(p1)] == periods[np.argmax(p2)]
    assert abs(periods[np.argmax(p1)] - P_true) < 0.05
    np.testing.assert_allclose(p2, p1, rtol=2e-3)
    np.testing.assert_allclose(d2, d1, rtol=2e-3, atol=1e-7)
