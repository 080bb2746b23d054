"""Parity tests: device flatten vs reference-style numpy/scipy oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from lightkurve_tpu.ops.detrend import flatten
from lightkurve_tpu.ops.savgol import savgol_design_matrix, \
    savgol_filter_interp
from oracles import flatten_np
from scipy.signal import savgol_filter


def _run_flatten(t, f, valid, w=31, poly=2, bt=5.0, sigma=3.0, niters=3):
    H = savgol_design_matrix(w, poly)
    trend, vout = flatten(jnp.asarray(t), jnp.asarray(f), jnp.asarray(valid),
                          jnp.asarray(H), jnp.asarray(bt),
                          jnp.asarray(sigma), niters=niters)
    return np.asarray(trend), np.asarray(vout)


def _initial_mask(f, sigma=3.0):
    extra = np.isfinite(f)
    extra &= np.nan_to_num(np.abs(f - np.nanmedian(f))) <= (
        np.nanstd(f) * sigma)
    return extra


def test_savgol_matches_scipy_interp_mode(rng):
    y = np.cumsum(rng.normal(size=400)) + 100
    for w, p in [(11, 2), (31, 3), (101, 2)]:
        H = savgol_design_matrix(w, p)
        got = np.asarray(savgol_filter_interp(jnp.asarray(y), jnp.asarray(H)))
        want = savgol_filter(y, w, p)  # mode='interp' default
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_flatten_matches_oracle_simple(rng):
    n = 500
    t = np.arange(n) * 0.02
    f = 1.0 + 0.05 * np.sin(2 * np.pi * t / 4.0) + 0.005 * rng.normal(size=n)
    trend, vout = _run_flatten(t, f, _initial_mask(f))
    want_trend, want_mask = flatten_np(t, f, window_length=31, polyorder=2,
                                       break_tolerance=5, niters=3, sigma=3)
    np.testing.assert_allclose(trend, want_trend, rtol=1e-8, atol=1e-10)
    np.testing.assert_array_equal(vout, want_mask)


def test_flatten_with_gaps(rng):
    n = 600
    t = np.arange(n) * 0.02
    t[n // 3:] += 2.0       # a large gap
    t[2 * n // 3:] += 3.0   # another gap
    f = 1.0 + 0.03 * np.sin(2 * np.pi * t / 3.0) + 0.004 * rng.normal(size=n)
    trend, vout = _run_flatten(t, f, _initial_mask(f))
    want_trend, want_mask = flatten_np(t, f, window_length=31, polyorder=2,
                                       break_tolerance=5, niters=3, sigma=3)
    np.testing.assert_allclose(trend, want_trend, rtol=1e-8, atol=1e-10)
    np.testing.assert_array_equal(vout, want_mask)


def test_flatten_with_outliers_and_nans(rng):
    n = 400
    t = np.arange(n) * 0.02
    f = 1.0 + 0.02 * np.sin(2 * np.pi * t / 2.0) + 0.003 * rng.normal(size=n)
    f[50] = 3.0          # large outlier: removed by initial global clip
    f[100] = np.nan
    f[200] += 0.05       # mild outlier: removed by the iteration loop
    trend, vout = _run_flatten(t, f, _initial_mask(f))
    want_trend, want_mask = flatten_np(t, f, window_length=31, polyorder=2,
                                       break_tolerance=5, niters=3, sigma=3)
    np.testing.assert_allclose(trend, want_trend, rtol=1e-7, atol=1e-9)
    np.testing.assert_array_equal(vout, want_mask)


def test_flatten_short_segment_median(rng):
    """A segment shorter than the SG window must fall back to its median."""
    n = 200
    t = np.arange(n) * 0.02
    t[190:] += 5.0  # 10-point trailing segment (< window 31)
    f = 1.0 + 0.01 * rng.normal(size=n)
    trend, _ = _run_flatten(t, f, _initial_mask(f))
    want_trend, _ = flatten_np(t, f, window_length=31, polyorder=2,
                               break_tolerance=5, niters=3, sigma=3)
    np.testing.assert_allclose(trend, want_trend, rtol=1e-8, atol=1e-10)


def test_flatten_no_break_tolerance(rng):
    n = 300
    t = np.arange(n) * 0.02
    t[150:] += 4.0
    f = 1.0 + 0.02 * np.sin(t) + 0.002 * rng.normal(size=n)
    trend, _ = _run_flatten(t, f, _initial_mask(f), bt=np.nan)
    want_trend, _ = flatten_np(t, f, window_length=31, polyorder=2,
                               break_tolerance=None, niters=3, sigma=3)
    np.testing.assert_allclose(trend, want_trend, rtol=1e-8, atol=1e-10)


def test_flatten_with_padding(rng):
    """Padded (valid=False) tail entries must not affect the result."""
    n = 300
    t = np.arange(n) * 0.02
    f = 1.0 + 0.03 * np.sin(2 * np.pi * t / 2.5) + 0.003 * rng.normal(size=n)
    trend_ref, _ = _run_flatten(t, f, _initial_mask(f))
    # pad with garbage
    pad = 50
    tp = np.concatenate([t, t[-1] + 0.02 * (1 + np.arange(pad))])
    fp = np.concatenate([f, np.full(pad, 99.0)])
    vp = np.concatenate([_initial_mask(f), np.zeros(pad, dtype=bool)])
    trend_pad, _ = _run_flatten(tp, fp, vp)
    np.testing.assert_allclose(trend_pad[:n], trend_ref, rtol=1e-8)


def test_savgol_padding_does_not_shift_trend():
    """Padded (zero-filled, out-of-segment) tail samples must not
    perturb the in-segment trend: the mean-shift must be computed over
    in-segment samples only (review finding: a padding-dragged mean
    forfeits the bf16 rounding protection on TPU)."""
    import jax.numpy as jnp
    from lightkurve_tpu.ops.savgol import savgol_design_matrix, \
        savgol_filter_interp
    rng = np.random.default_rng(0)
    n_valid, n_pad = 300, 212
    x_valid = 1 + 0.001 * rng.standard_normal(n_valid)
    H = jnp.asarray(savgol_design_matrix(31, 2))

    ref = np.asarray(savgol_filter_interp(
        jnp.asarray(x_valid),
        H,
        jnp.zeros(n_valid, dtype=jnp.int32),
        jnp.full(n_valid, n_valid, dtype=jnp.int32)))

    x_padded = np.concatenate([x_valid, np.zeros(n_pad)])
    n = n_valid + n_pad
    padded = np.asarray(savgol_filter_interp(
        jnp.asarray(x_padded),
        H,
        jnp.where(jnp.arange(n) < n_valid, 0, jnp.arange(n)).astype(
            jnp.int32),
        jnp.where(jnp.arange(n) < n_valid, n_valid,
                  jnp.arange(n)).astype(jnp.int32)))
    np.testing.assert_allclose(padded[:n_valid], ref, rtol=1e-10)
