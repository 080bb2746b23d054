"""Parity tests for the core device kernels vs numpy/scipy."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.interpolate import PchipInterpolator, interp1d
from scipy.signal import savgol_filter

from lightkurve_tpu.ops import masked, stats
from lightkurve_tpu.ops.binning import bin_aggregate
from lightkurve_tpu.ops.fold import fold_phase, transit_mask
from lightkurve_tpu.ops.interp import interp_linear_extrap, pchip_interpolate
from lightkurve_tpu.ops.fft import fft_pair, ifft_pair
from lightkurve_tpu.ops.acf import autocorrelate_windows
from lightkurve_tpu.ops.solve import randomized_pca, solve_regression
from lightkurve_tpu.config import conf


def test_masked_reductions(rng):
    x = rng.normal(size=(3, 500))
    x[:, ::37] = np.nan
    m = np.isfinite(x)
    x0 = np.where(m, x, 0.0)
    np.testing.assert_allclose(
        np.asarray(masked.masked_median(jnp.asarray(x0), jnp.asarray(m))),
        np.nanmedian(x, axis=1), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(masked.masked_mean(jnp.asarray(x0), jnp.asarray(m))),
        np.nanmean(x, axis=1), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(masked.masked_std(jnp.asarray(x0), jnp.asarray(m))),
        np.nanstd(x, axis=1), rtol=1e-12)
    q = np.asarray(masked.masked_quantile(jnp.asarray(x0), jnp.asarray(m),
                                          0.25))
    np.testing.assert_allclose(q, np.nanquantile(x, 0.25, axis=1),
                               rtol=1e-12)
    # all-invalid rows → NaN
    m2 = np.zeros_like(m)
    out = np.asarray(masked.masked_median(jnp.asarray(x0),
                                          jnp.asarray(m2)))
    assert np.isnan(out).all()


def test_sigma_clip_matches_iterative_oracle(rng):
    x = rng.normal(size=800)
    x[10] = 50.0
    x[20] = -30.0
    got = np.asarray(stats.sigma_clip_mask(jnp.asarray(x), sigma=3.0,
                                           maxiters=5))
    # oracle: iterate median/std clipping to convergence
    keep = np.isfinite(x)
    for _ in range(5):
        med = np.median(x[keep])
        std = np.std(x[keep])
        keep = keep & (x >= med - 3 * std) & (x <= med + 3 * std)
    np.testing.assert_array_equal(got, ~keep)
    assert got[10] and got[20]


def test_running_mean_matches_reference(rng):
    from lightkurve_tpu.utils import running_mean as rm_ref
    x = rng.normal(size=200)
    got = np.asarray(stats.running_mean(jnp.asarray(x), 13))
    np.testing.assert_allclose(got, rm_ref(x, 13), rtol=1e-12)


def test_bin_aggregate_matches_reduceat_semantics(rng):
    """Matches the reference's rmse_reduceat / nanstd_reduceat
    (lightcurve.py:175-251)."""
    n, nb = 100, 7
    v = rng.normal(size=n)
    v[::11] = np.nan
    ids = rng.integers(0, nb, size=n)
    mask = np.isfinite(v)
    mean, rmse, std, cnt = [np.asarray(a) for a in bin_aggregate(
        jnp.asarray(np.nan_to_num(v)), jnp.asarray(mask),
        jnp.asarray(ids), nb)]
    for b in range(nb):
        sel = (ids == b) & mask
        if sel.sum() == 0:
            assert np.isnan(mean[b])
            continue
        np.testing.assert_allclose(mean[b], v[sel].mean(), rtol=1e-12)
        np.testing.assert_allclose(rmse[b],
                                   np.sqrt((v[sel] ** 2).mean()),
                                   rtol=1e-12)
        np.testing.assert_allclose(std[b], v[sel].std(), rtol=1e-12)
        assert cnt[b] == sel.sum()


def test_fold_phase_and_transit_mask():
    t = np.arange(0, 30, 0.01)
    p, t0 = 2.5, 1.0
    ph = np.asarray(fold_phase(jnp.asarray(t), p, epoch_time=t0))
    want = np.mod(t - t0, p)
    want = np.where(want >= p / 2, want - p, want)
    np.testing.assert_allclose(ph, want, atol=1e-12)
    m = np.asarray(transit_mask(jnp.asarray(t), p, t0, 0.2))
    want_m = np.abs(np.mod(t - t0 + p / 2, p) - p / 2) < 0.1
    np.testing.assert_array_equal(m, want_m)


def test_interp_matches_scipy(rng):
    xp = np.sort(rng.uniform(0, 10, 40))
    fp = np.sin(xp)
    xq = np.linspace(-2, 12, 200)
    got = np.asarray(interp_linear_extrap(jnp.asarray(xq), jnp.asarray(xp),
                                          jnp.asarray(fp)))
    want = interp1d(xp, fp, fill_value="extrapolate")(xq)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    got = np.asarray(pchip_interpolate(jnp.asarray(xq), jnp.asarray(xp),
                                       jnp.asarray(fp)))
    want = PchipInterpolator(xp, fp, extrapolate=True)(xq)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)


def test_savgol_interp_edges(rng):
    from lightkurve_tpu.ops.savgol import (savgol_design_matrix,
                                           savgol_filter_interp)
    y = np.cumsum(rng.normal(size=300))
    for w, p in [(15, 2), (51, 4)]:
        H = savgol_design_matrix(w, p)
        got = np.asarray(savgol_filter_interp(jnp.asarray(y),
                                              jnp.asarray(H)))
        np.testing.assert_allclose(got, savgol_filter(y, w, p), rtol=1e-7,
                                   atol=1e-9)
    with pytest.raises(ValueError):
        savgol_design_matrix(10, 2)   # even window
    with pytest.raises(ValueError):
        savgol_design_matrix(5, 7)    # polyorder >= window


def test_custom_fft_matches_numpy(rng):
    old = conf.fft_backend
    conf.fft_backend = "custom"
    try:
        for n in (32, 128, 4096):
            xr = rng.normal(size=n)
            xi = rng.normal(size=n)
            fr, fi = fft_pair(jnp.asarray(xr), jnp.asarray(xi))
            ref = np.fft.fft(xr + 1j * xi)
            np.testing.assert_allclose(np.asarray(fr) + 1j * np.asarray(fi),
                                       ref, rtol=1e-10,
                                       atol=1e-12 * np.abs(ref).max())
            gr, gi = ifft_pair(jnp.asarray(xr), jnp.asarray(xi))
            refi = np.fft.ifft(xr + 1j * xi)
            np.testing.assert_allclose(np.asarray(gr) + 1j * np.asarray(gi),
                                       refi, rtol=1e-10, atol=1e-15)
        with pytest.raises(ValueError):
            fft_pair(jnp.ones(100), jnp.zeros(100))  # non power of two
    finally:
        conf.fft_backend = old


def test_acf_matches_npcorrelate(rng):
    p = rng.normal(size=400)
    starts = np.array([0, 50, 336])   # includes clipped-at-end window
    acf, nv = autocorrelate_windows(jnp.asarray(p), jnp.asarray(starts), 64)
    acf = np.asarray(acf)
    for i, s in enumerate(starts):
        seg = p[max(s, 0): s + 64]
        seg = seg - seg.mean()
        want = np.correlate(seg, seg, "full")[len(seg) - 1:]
        np.testing.assert_allclose(acf[i, : len(want)], want, atol=1e-10)
        assert nv[i] == len(seg)


def test_solve_regression_priors(rng):
    n, k = 200, 4
    X = rng.normal(size=(n, k))
    w_true = np.array([1.0, -2.0, 0.5, 3.0])
    y = X @ w_true + 0.01 * rng.normal(size=n)
    fe = np.full(n, 0.01)
    mask = np.ones(n, dtype=bool)
    w, _ = solve_regression(jnp.asarray(X), jnp.asarray(y),
                            jnp.asarray(fe), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(w), w_true, atol=0.01)
    # masked rows are excluded: corrupt half the rows, mask them out
    y2 = y.copy()
    y2[:100] = 1e6
    m2 = np.ones(n, dtype=bool)
    m2[:100] = False
    w2, _ = solve_regression(jnp.asarray(X), jnp.asarray(y2),
                             jnp.asarray(fe), jnp.asarray(m2))
    np.testing.assert_allclose(np.asarray(w2), w_true, atol=0.02)


def test_randomized_pca_spans_column_space(rng):
    base = rng.normal(size=(300, 4))
    A = base @ rng.normal(size=(4, 20))
    U, s, Vt = randomized_pca(jnp.asarray(A), 4, n_iter=8)
    U = np.asarray(U)
    proj = U @ (U.T @ A)
    np.testing.assert_allclose(proj, A, atol=1e-8)
    # orthonormal columns
    np.testing.assert_allclose(U.T @ U, np.eye(4), atol=1e-10)


def test_masked_quantile_integer_rank_edges():
    """Integer fractional ranks read the +inf invalid padding: n==1 medians
    and q==1.0 maxima must not produce 0*inf = NaN (regression: isolated
    one-cadence segments inside flatten's clip loop NaN'd whole curves)."""
    import jax.numpy as jnp
    from lightkurve_tpu.ops.masked import masked_median, masked_quantile

    x = jnp.asarray([5.0, 99.0, 99.0, 99.0])
    one = jnp.asarray([True, False, False, False])
    assert float(masked_median(x, one)) == 5.0
    m = jnp.asarray([True, True, True, False])
    assert float(masked_quantile(x, m, 1.0)) == 99.0
    assert float(masked_quantile(x, m, 0.0)) == 5.0
    # odd-count median (integer rank inside the valid prefix) still exact
    assert float(masked_median(x, m)) == 99.0


def test_flatten_isolated_single_point_segment():
    """A lone cadence between two wide gaps must not NaN the trend."""
    import jax.numpy as jnp
    from lightkurve_tpu.ops.detrend import flatten
    from lightkurve_tpu.ops.savgol import savgol_design_matrix

    rng = np.random.default_rng(5)
    t = np.concatenate([np.arange(200) * 0.01,
                        [5.0],                      # isolated point
                        8.0 + np.arange(200) * 0.01])
    f = 1.0 + 1e-3 * rng.standard_normal(t.size)
    H = jnp.asarray(savgol_design_matrix(21, 2))
    trend, valid = flatten(jnp.asarray(t), jnp.asarray(f),
                           jnp.ones(t.size, bool), H, jnp.asarray(5.0),
                           jnp.asarray(3.0), niters=3)
    assert np.isfinite(np.asarray(trend)).all()
    assert np.asarray(valid).sum() > 350


def test_interp_linear_ranked_matches_searchsorted_path():
    """interp_linear_ranked with cumsum ranks equals interp_linear_extrap
    when sample positions are a subset of the sorted query grid."""
    import jax.numpy as jnp
    from lightkurve_tpu.ops.interp import (interp_linear_extrap,
                                           interp_linear_ranked)

    rng = np.random.default_rng(2)
    n = 200
    x = np.sort(rng.uniform(0, 10, n))
    kept = rng.random(n) < 0.6
    kept[[0, -1]] = True
    m = int(kept.sum())
    xp = np.full(n, np.nan)
    fp = np.full(n, np.nan)
    xp[:m] = x[kept]
    fp[:m] = np.sin(x[kept])
    want = np.asarray(interp_linear_extrap(jnp.asarray(x), jnp.asarray(xp),
                                           jnp.asarray(fp), m))
    ki = kept.astype(np.int32)
    ranks = np.cumsum(ki) - ki
    got = np.asarray(interp_linear_ranked(jnp.asarray(x), jnp.asarray(xp),
                                          jnp.asarray(fp),
                                          jnp.asarray(ranks), m))
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # kept points reproduce their values exactly
    np.testing.assert_allclose(got[kept], np.sin(x[kept]), rtol=1e-12)


def test_acf_large_window_four_step_fft(rng):
    """Autocorrelation windows above the four-step FFT threshold (n>=1024
    after pow2 padding) must still match np.correlate — pins the Bailey
    factorization inside the seismology ACF path with the custom backend
    the TPU always uses."""
    from lightkurve_tpu.config import conf
    from lightkurve_tpu.ops.acf import autocorrelate_windows

    p = rng.normal(size=4000)
    starts = np.array([0, 1200, 2800])
    old = conf.fft_backend
    try:
        conf.fft_backend = "custom"
        acf, nv = autocorrelate_windows(jnp.asarray(p),
                                        jnp.asarray(starts), 1100)
    finally:
        conf.fft_backend = old
    acf = np.asarray(acf)
    for i, s in enumerate(starts):
        seg = p[s:s + 1100]
        seg = seg - seg.mean()
        want = np.correlate(seg, seg, "full")[len(seg) - 1:]
        np.testing.assert_allclose(acf[i, :len(want)], want, rtol=1e-8,
                                   atol=1e-8 * np.abs(want).max())


def test_interp_linear_fill_matches_ranked(rng):
    """interp_linear_fill (scan-based, gather-free) is bit-equivalent to
    compacting the kept points and calling interp_linear_ranked — over
    random masks including invalid heads/tails and a single kept point."""
    from lightkurve_tpu.ops.interp import (interp_linear_fill,
                                           interp_linear_ranked)
    n = 257
    x = np.sort(rng.uniform(0, 10, n))
    f = np.sin(x) + 0.1 * rng.normal(size=n)
    masks = [rng.random(n) < 0.6]
    m_edge = rng.random(n) < 0.5
    m_edge[:7] = False
    m_edge[-9:] = False
    masks.append(m_edge)
    m_two = np.zeros(n, bool)
    m_two[[40, 200]] = True
    masks.append(m_two)
    for kept in masks:
        m = int(kept.sum())
        xp = np.full(n, np.nan)
        fp = np.full(n, np.nan)
        xp[:m] = x[kept]
        fp[:m] = f[kept]
        ki = kept.astype(np.int32)
        ranks = np.cumsum(ki) - ki
        want = np.asarray(interp_linear_ranked(
            jnp.asarray(x), jnp.asarray(xp), jnp.asarray(fp),
            jnp.asarray(ranks), m))
        got = np.asarray(interp_linear_fill(
            jnp.asarray(x), jnp.asarray(kept), jnp.asarray(f)))
        np.testing.assert_array_equal(got, want)


def test_segment_bounds_fill_scan(rng):
    """_segment_bounds (fill scans) against a python reference over
    random break patterns."""
    from lightkurve_tpu.ops.detrend import _segment_bounds
    n = 200
    for trial in range(5):
        brk = rng.random(n) < 0.05
        brk[0] = True
        lo_ref = np.empty(n, np.int32)
        hi_ref = np.empty(n, np.int32)
        cur = 0
        for i in range(n):
            if brk[i]:
                cur = i
            lo_ref[i] = cur
        nxt = n
        for i in range(n - 1, -1, -1):
            hi_ref[i] = nxt
            if brk[i]:
                nxt = i
        lo, hi = _segment_bounds(jnp.asarray(brk), n)
        np.testing.assert_array_equal(np.asarray(lo), lo_ref)
        np.testing.assert_array_equal(np.asarray(hi), hi_ref)


def test_chol_solve_small_matches_linalg_solve(rng):
    """Unrolled static Cholesky solve (ops.solve.chol_solve_small) equals
    jnp.linalg.solve on stacked SPD systems."""
    from lightkurve_tpu.ops.solve import chol_solve_small
    for k in (1, 3, 7):
        X = rng.standard_normal((32, 24, k))
        A = np.einsum("bni,bnj->bij", X, X) + 0.1 * np.eye(k)
        b = rng.standard_normal((32, k))
        want = np.linalg.solve(A, b[..., None])[..., 0]
        got = np.asarray(chol_solve_small(jnp.asarray(A), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
