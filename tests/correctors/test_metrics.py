"""Goodness-metric tests (reference correctors/metrics.py calibration)."""
import numpy as np
import pytest

from lightkurve_tpu import LightCurve
from lightkurve_tpu.correctors.metrics import (MinTargetsError,
                                               overfit_metric_lombscargle,
                                               underfit_metric_neighbors)


def make_lc(rng, n=1000, sigma=1e-3):
    t = np.arange(n) * 0.02
    flux = 1.0 + sigma * rng.standard_normal(n)
    return LightCurve(time=t, flux=flux, flux_err=np.full(n, sigma))


def test_overfit_perfect_when_no_power_added(rng):
    lc = make_lc(rng)
    # corrected == original → no power increase → metric = 1.0
    m = overfit_metric_lombscargle(lc, lc.copy(), n_samples=2, seed=1)
    assert m == pytest.approx(1.0)


def test_overfit_degrades_with_injected_noise(rng):
    lc = make_lc(rng)
    # corrected = original + noise at the uncertainty level → the metric is
    # calibrated to ~0.5 (reference metrics.py:31-33)
    noisy = lc.copy()
    noisy.flux = lc.flux.value + 1e-3 * rng.standard_normal(len(lc))
    m_mid = overfit_metric_lombscargle(lc, noisy, n_samples=3, seed=2)
    assert 0.3 < m_mid < 0.7
    # much larger injected noise → metric → 0
    very_noisy = lc.copy()
    very_noisy.flux = lc.flux.value + 2e-2 * rng.standard_normal(len(lc))
    m_low = overfit_metric_lombscargle(lc, very_noisy, n_samples=3, seed=3)
    assert m_low < 0.1
    assert m_low < m_mid


def test_underfit_uncorrelated_neighbors_is_good(rng):
    lc = make_lc(rng)
    neighbors = [1e-3 * rng.standard_normal(len(lc)) for _ in range(5)]
    m = underfit_metric_neighbors(lc, neighbor_flux=neighbors)
    # WGN neighbors ⇒ chance correlations ⇒ metric ≳ 0.9 (calibration:
    # 0.95 at the WGN correlation level, reference metrics.py:243-250)
    assert m > 0.85


def test_underfit_correlated_residuals_is_bad(rng):
    n = 1000
    t = np.arange(n) * 0.02
    shared = 5e-3 * np.sin(2 * np.pi * t / 3.0)
    lc = LightCurve(time=t, flux=1.0 + shared
                    + 1e-4 * rng.standard_normal(n),
                    flux_err=np.full(n, 1e-4))
    neighbors = [shared + 1e-4 * rng.standard_normal(n) for _ in range(5)]
    m = underfit_metric_neighbors(lc, neighbor_flux=neighbors)
    assert m < 0.3


def test_underfit_requires_neighbors(rng):
    lc = make_lc(rng)
    with pytest.raises(MinTargetsError):
        underfit_metric_neighbors(lc, neighbor_flux=[])


def test_underfit_shape_mismatch(rng):
    lc = make_lc(rng)
    with pytest.raises(ValueError, match="same shape"):
        underfit_metric_neighbors(
            lc, neighbor_flux=[np.zeros(10), np.zeros(20)])


def test_overfit_metric_reference_sanity():
    """The reference's exact sanity checks (mirrors reference
    test_overfit_metric_lombscargle, tests/correctors/test_metrics.py:14-35):
    unchanged curves score 1, flat->sine scores 0, and pre-existing noise
    softens the penalty."""
    time = np.arange(1, 100, 0.1)
    lc_flat = LightCurve(time=time, flux=np.ones(time.size),
                         flux_err=np.zeros(time.size))
    lc_sine = LightCurve(time=time, flux=np.sin(time) + 1,
                         flux_err=np.zeros(time.size))
    assert overfit_metric_lombscargle(lc_flat, lc_flat) == 1.0
    assert overfit_metric_lombscargle(lc_sine, lc_sine) == 1.0
    # sine -> flat removed power, introduced none: still perfect
    assert overfit_metric_lombscargle(lc_sine, lc_flat) == 1.0
    # flat -> sine introduced spurious power: worst score
    assert overfit_metric_lombscargle(lc_flat, lc_sine) == 0.0
    # but if the curves were noisy to begin with it's less damning
    lc_flat.flux_err = lc_flat.flux_err.value + 0.5
    lc_sine.flux_err = lc_sine.flux_err.value + 0.5
    assert overfit_metric_lombscargle(lc_flat, lc_sine) > 0.5


def test_compute_correlation_reference_truth():
    """Correlation matrix pinned to the reference's hand-computed truth
    (reference tests/correctors/test_metrics.py:58-82)."""
    from lightkurve_tpu.correctors.metrics import _compute_correlation

    flux_matrix = np.ones((4, 4))
    assert np.all(_compute_correlation(flux_matrix) == 1.0)

    flux_matrix = np.array([
        [1.0, -1.0, 1.0, -1.0],
        [-1.0, 1.0, 1.0, -1.0],
        [1.0, -1.0, 1.0, -1.0],
        [-1.0, 1.0, -1.0, 1.0],
    ])
    truth = np.array([
        [1.0, -1.0, 0.5, -0.5],
        [-1.0, 1.0, -0.5, 0.5],
        [0.5, -0.5, 1.0, -1.0],
        [-0.5, 0.5, -1.0, 1.0],
    ])
    np.testing.assert_allclose(_compute_correlation(flux_matrix), truth)
