"""Mirrors of reference tests/correctors/test_sffcorrector.py.

The golden comparison uses the Vanderburg & Johnson (2014) EPIC 60021426
diagnostics CSV shipped with the reference (public data from
https://www.cfa.harvard.edu/~avanderb/k2/ep60021426.html), read directly
from the reference checkout at test time.
"""
import os
import warnings

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from lightkurve_tpu import KeplerLightCurve, LightCurve, TessLightCurve
from lightkurve_tpu.correctors import SFFCorrector
from lightkurve_tpu.utils import LightkurveWarning

VANDERBURG_CSV = "/root/reference/tests/data/ep60021426alldiagnostics.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(VANDERBURG_CSV),
    reason="Vanderburg & Johnson diagnostics CSV not available")


def _load_vanderburg():
    data = np.genfromtxt(VANDERBURG_CSV, delimiter=",", skip_header=1)
    return data


def test_sff_knots():
    """SFF must tolerate gaps in time and irregular sampling."""
    n_points = 300
    data = _load_vanderburg()
    raw_flux = data[:, 1][:n_points]
    centroid_col = data[:, 3][:n_points]
    centroid_row = data[:, 4][:n_points]

    time = np.concatenate((
        np.linspace(0, 20, n_points // 3),
        np.linspace(30, 78, n_points // 3),
        np.linspace(80, 100, n_points // 3)))
    lc = KeplerLightCurve(time=time, flux=raw_flux,
                          flux_err=np.ones(n_points) * 0.0001,
                          centroid_col=centroid_col,
                          centroid_row=centroid_row)
    SFFCorrector(lc).correct()
    lc.to_corrector(method="sff").correct()


def test_sff_corrector():
    """Does the correction agree with Vanderburg and Johnson (2014)?"""
    data = _load_vanderburg()
    mask = data[:, -2] == 0  # thrusters on/off
    time = data[:, 0]
    raw_flux = data[:, 1]
    corrected_flux = data[:, 2]
    centroid_col = data[:, 3]
    centroid_row = data[:, 4]

    lc = LightCurve(time=time, flux=raw_flux,
                    flux_err=np.ones(len(raw_flux)) * 0.0001)
    sff = SFFCorrector(lc)
    corrected_lc = sff.correct(centroid_col=centroid_col,
                               centroid_row=centroid_row,
                               restore_trend=True, windows=1)
    assert np.isclose(corrected_flux, corrected_lc.flux.value,
                      atol=0.001).all()
    assert len(sff.window_points) == 0  # 0 break points for 1 window

    # masking
    corrected_lc = sff.correct(centroid_col=centroid_col,
                               centroid_row=centroid_row, windows=3,
                               restore_trend=True, cadence_mask=mask)
    assert np.isclose(corrected_flux, corrected_lc.flux.value,
                      atol=0.001).all()
    assert len(sff.window_points) == 2  # 2 break points for 3 windows

    # masking + iters
    corrected_lc = sff.correct(centroid_col=centroid_col,
                               centroid_row=centroid_row, windows=3,
                               restore_trend=True, cadence_mask=mask,
                               niters=3)
    assert np.isclose(corrected_flux, corrected_lc.flux.value,
                      atol=0.001).all()

    # masking + bins
    corrected_lc = sff.correct(centroid_col=centroid_col,
                               centroid_row=centroid_row, windows=3,
                               restore_trend=True, cadence_mask=mask,
                               bins=5)
    assert np.isclose(corrected_flux, corrected_lc.flux.value,
                      atol=0.001).all()
    assert np.all((sff.lc.flux_err.value
                   / sff.corrected_lc.flux_err.value) == 1)

    # masking + bins + propagate_errors grows the errors
    corrected_lc = sff.correct(centroid_col=centroid_col,
                               centroid_row=centroid_row, windows=3,
                               restore_trend=True, cadence_mask=mask,
                               bins=5, propagate_errors=True, seed=42)
    assert np.isclose(corrected_flux, corrected_lc.flux.value,
                      atol=0.001).all()
    assert np.all((sff.lc.flux_err.value
                   / sff.corrected_lc.flux_err.value) < 1)

    # KeplerLightCurve interface
    klc = KeplerLightCurve(time=time, flux=raw_flux,
                           flux_err=np.ones(len(raw_flux)) * 0.0001,
                           centroid_col=centroid_col,
                           centroid_row=centroid_row)
    sff = klc.to_corrector("sff")
    klc_corr = sff.correct(windows=3, restore_trend=True)
    assert np.isclose(corrected_flux, klc_corr.flux.value, atol=0.001).all()

    sff.diagnose()
    import matplotlib.pyplot as plt
    plt.close("all")


def test_sff_priors():
    """Spline component has flux mean ~1; arclength component mean ~0."""
    n_points = 300
    data = _load_vanderburg()
    raw_flux = data[:, 1][:n_points]
    centroid_col = data[:, 3][:n_points]
    centroid_row = data[:, 4][:n_points]

    time = np.concatenate((
        np.linspace(0, 20, n_points // 3),
        np.linspace(30, 78, n_points // 3),
        np.linspace(80, 100, n_points // 3)))
    lc = KeplerLightCurve(time=time, flux=raw_flux,
                          flux_err=np.ones(n_points) * 0.0001,
                          centroid_col=centroid_col,
                          centroid_row=centroid_row)
    sff = SFFCorrector(lc)
    sff.correct()
    assert np.isclose(
        np.mean(sff.diagnostic_lightcurves["spline"].flux.value), 1,
        atol=1e-3)
    assert np.isclose(
        np.mean(sff.diagnostic_lightcurves["sff"].flux.value), 0,
        atol=1e-3)


def test_sff_breakindex():
    """Reference regression #616: breakindex entries become windows."""
    rng = np.random.default_rng(0)
    lc = LightCurve(flux=np.ones(20))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", LightkurveWarning)
        corr = SFFCorrector(lc)
        corr.correct(breakindex=[5, 10],
                     centroid_col=rng.standard_normal(20),
                     centroid_row=rng.standard_normal(20))
        assert 5 in corr.window_points
        assert 10 in corr.window_points
        corr.correct(breakindex=[5, 10],
                     centroid_col=rng.standard_normal(20),
                     centroid_row=rng.standard_normal(20), windows=1)
        assert_array_equal(corr.window_points, np.asarray([5, 10]))


def test_sff_tess_warning():
    """SFF is not designed for TESS: a warning is raised."""
    with pytest.warns(LightkurveWarning, match="not suitable"):
        SFFCorrector(TessLightCurve(flux=[1, 2, 3],
                                    meta={"MISSION": "TESS"}))


def test_designmatrix_prior_type():
    """Reference regression #982: priors are plain arrays, not Quantity."""
    rng = np.random.default_rng(2)
    size = 10
    lc = LightCurve(flux=rng.normal(loc=1.0, scale=0.1, size=size))
    corr = lc.to_corrector("sff")
    corr.correct(centroid_col=rng.normal(1.0, 0.1, size),
                 centroid_row=rng.normal(1.0, 0.1, size), windows=1)
    assert "Quantity" not in str(type(corr.design_matrix_collection.prior_mu))
    assert "Quantity" not in str(
        type(corr.design_matrix_collection.prior_sigma))
