"""RegressionCorrector + SFF tests."""
import numpy as np
import pytest

from lightkurve_tpu import LightCurve
from lightkurve_tpu.correctors import (DesignMatrix, DesignMatrixCollection,
                                       RegressionCorrector, SFFCorrector,
                                       create_spline_matrix)


def make_noisy_lc(rng, n=500):
    t = np.arange(n) * 0.02
    systematic = 0.01 * np.sin(2 * np.pi * t / 3.7)
    flux = 1.0 + systematic + 0.001 * rng.standard_normal(n)
    lc = LightCurve(time=t, flux=flux, flux_err=np.full(n, 0.001))
    return lc, systematic, t


def test_fit_recovers_coefficients(rng):
    """Ridge solve vs a direct numpy normal-equation oracle
    (reference regressioncorrector.py:127-189)."""
    lc, systematic, t = make_noisy_lc(rng)
    X = np.stack([np.sin(2 * np.pi * t / 3.7),
                  np.cos(2 * np.pi * t / 3.7), np.ones_like(t)], axis=1)
    dm = DesignMatrix(X, name="sys", prior_mu=np.zeros(3),
                      prior_sigma=np.full(3, np.inf))
    rc = RegressionCorrector(lc)
    corrected = rc.correct(dm, niters=1, sigma=10)
    # oracle solve
    fe = lc.flux_err.value
    sigma_w_inv = X.T @ (X / fe[:, None] ** 2)
    B = X.T @ (lc.flux.value / fe ** 2)
    w = np.linalg.solve(sigma_w_inv, B)
    np.testing.assert_allclose(rc.coefficients, w, rtol=1e-8)
    assert abs(w[0] - 0.01) < 0.001
    # corrected lc has the systematic removed
    assert np.std(corrected.flux.value) < 0.5 * np.std(lc.flux.value)
    # model median-subtracted (reference :278-284)
    assert abs(np.median(rc.model_lc.flux.value)) < 1e-12
    # diagnostic lightcurves per submatrix
    assert "sys" in rc.diagnostic_lightcurves


def test_gaussian_priors_shrink(rng):
    lc, _, t = make_noisy_lc(rng)
    X = np.stack([np.sin(2 * np.pi * t / 3.7)], axis=1)
    loose = DesignMatrix(X, prior_mu=[0.0], prior_sigma=[np.inf])
    tight = DesignMatrix(X, prior_mu=[0.0], prior_sigma=[1e-6])
    w_loose = RegressionCorrector(lc)
    w_loose.correct(loose, niters=1)
    w_tight = RegressionCorrector(lc)
    w_tight.correct(tight, niters=1)
    assert abs(w_tight.coefficients[0]) < abs(w_loose.coefficients[0])
    assert abs(w_tight.coefficients[0]) < 1e-4


def test_outlier_clipping(rng):
    lc, systematic, t = make_noisy_lc(rng)
    flux = lc.flux.value.copy()
    flux[50] += 0.5
    flux[250] -= 0.5
    lc.flux = flux
    X = np.stack([np.sin(2 * np.pi * t / 3.7), np.ones_like(t)], axis=1)
    rc = RegressionCorrector(lc)
    rc.correct(DesignMatrix(X), sigma=5, niters=5)
    assert rc.outlier_mask[50]
    assert rc.outlier_mask[250]
    assert rc.outlier_mask.sum() < 20


def test_input_validation():
    with pytest.raises(ValueError, match="NaNs"):
        RegressionCorrector(LightCurve(time=[1, 2, 3],
                                       flux=[1, np.nan, 1]))
    with pytest.raises(ValueError, match="uncertainties"):
        RegressionCorrector(LightCurve(time=[1, 2], flux=[1.0, 2.0],
                                       flux_err=[0.0, 1.0]))


def test_sff_corrector_removes_roll(rng):
    """SFF end-to-end: inject an arclength-correlated systematic
    (reference test strategy, tests/correctors/test_sffcorrector.py)."""
    n = 1200
    t = np.arange(n) * 0.02
    # sawtooth roll motion (K2-like, ~0.25 d period)
    roll = ((t / 0.245) % 1.0) - 0.5
    centroid_col = 100 + roll
    centroid_row = 200 + 0.5 * roll
    arclength_effect = 0.02 * (roll ** 2 - np.mean(roll ** 2))
    flux = 1.0 + arclength_effect + 0.0005 * rng.standard_normal(n)
    lc = LightCurve(time=t, flux=flux, flux_err=np.full(n, 0.0005),
                    centroid_col=centroid_col, centroid_row=centroid_row)
    sff = SFFCorrector(lc)
    corrected = sff.correct(windows=10, bins=5)
    raw_std = np.std(flux)
    cor_std = np.std(corrected.flux.value / np.mean(corrected.flux.value))
    # systematic (~1.5e-3) must be mostly removed; noise floor is 5e-4
    assert cor_std < 0.45 * raw_std
    assert cor_std < 1.5 * 0.0005
    assert sff.window_points is not None


def test_sff_requires_centroids():
    lc = LightCurve(time=np.arange(10.0), flux=np.ones(10),
                    flux_err=np.full(10, 0.1))
    sff = SFFCorrector(lc)
    with pytest.raises(Exception):
        sff.correct()


def test_propagate_errors_seeded_determinism():
    """SURVEY §7f: seeded posterior sampling is reproducible and leaves
    the global np.random state untouched."""
    from lightkurve_tpu import LightCurve
    from lightkurve_tpu.correctors import (DesignMatrix,
                                           RegressionCorrector)
    rng = np.random.default_rng(3)
    t = np.arange(300) * 0.02
    sys1 = np.sin(t)
    flux = 1.0 + 0.01 * sys1 + 1e-4 * rng.standard_normal(300)
    lc = LightCurve(time=t, flux=flux, flux_err=np.full(300, 1e-4))
    dm = DesignMatrix({"s": sys1, "const": np.ones_like(t)}, name="sys")
    state = np.random.get_state()[1].copy()
    a = RegressionCorrector(lc).correct(dm, propagate_errors=True, seed=7)
    b = RegressionCorrector(lc).correct(dm, propagate_errors=True, seed=7)
    c = RegressionCorrector(lc).correct(dm, propagate_errors=True, seed=8)
    assert np.array_equal(a.flux_err.value, b.flux_err.value)
    assert not np.array_equal(a.flux_err.value, c.flux_err.value)
    assert np.array_equal(np.random.get_state()[1], state)


def test_nan_input_validation():
    """Reference test_nan_input: NaN flux or partial-NaN flux_err raise;
    ALL-NaN flux_err is tolerated (errors commonly missing)."""
    from lightkurve_tpu import LightCurve
    from lightkurve_tpu.correctors import RegressionCorrector
    for flux, fe in ([5, 10], [np.nan, 1]), ([np.nan, 10], [1, 1]):
        with pytest.raises(ValueError):
            RegressionCorrector(LightCurve(time=[1.0, 2.0], flux=flux,
                                           flux_err=fe))
    RegressionCorrector(LightCurve(time=[1.0, 2.0], flux=[5, 10],
                                   flux_err=[np.nan, np.nan]))


def test_zero_fluxerr_validation():
    """Reference test_zero_fluxerr (regression #668): non-positive
    uncertainties raise a graceful ValueError."""
    from lightkurve_tpu import LightCurve
    from lightkurve_tpu.correctors import RegressionCorrector
    for fe in ([1, 0], [1, -10]):
        with pytest.raises(ValueError):
            RegressionCorrector(LightCurve(time=[1.0, 2.0], flux=[5, 10],
                                           flux_err=fe))
