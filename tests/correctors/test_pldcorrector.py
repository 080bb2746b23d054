"""Mirrors of reference tests/correctors/test_pldcorrector.py on
synthetic TPFs (the reference tests are all remote-data gated; the
behavioral assertions are identical)."""
import matplotlib.pyplot as plt
import numpy as np
import pytest

from lightkurve_tpu import KeplerLightCurve, TessLightCurve
from lightkurve_tpu.correctors import PLDCorrector

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from synthetic import make_synthetic_tpf, sawtooth_motion


def _motion_tpf(mission="K2", n=300, seed=3):
    """A TPF with sawtooth centroid motion producing correlated noise
    that PLD should remove (the K2/motion-dominated regime)."""
    return make_synthetic_tpf(n_cadences=n, shape=(7, 7), mission=mission,
                              motion=sawtooth_motion(amp_col=0.4),
                              noise=0.5, star_flux=8000.0, seed=seed)


def _background_tpf(mission="TESS", n=300, seed=4):
    """A TPF with a strong time-varying background (the TESS/
    background-dominated regime that the non-K2 PLD defaults target)."""
    tpf = make_synthetic_tpf(n_cadences=n, shape=(7, 7), mission=mission,
                             noise=0.5, star_flux=8000.0, seed=seed)
    t = np.asarray(tpf.time.value)
    bg = 40.0 * np.sin(2 * np.pi * (t - t[0]) / 1.3) ** 2
    tpf.flux = np.asarray(tpf.flux.value) + bg[:, None, None]
    return tpf


def test_kepler_pld_corrector():
    # the reference uses K2-199 (a K2 target): motion-dominated regime
    tpf = _motion_tpf(mission="K2")
    pld = PLDCorrector(tpf)
    clc = pld.correct()
    # correct filetype (K2 products load as KeplerLightCurve)
    assert isinstance(clc, KeplerLightCurve)
    # diagnostic plots run
    pld.diagnose()
    plt.close("all")
    pld.diagnose_masks()
    plt.close("all")
    # sparse path works
    pld.correct(sparse=True)
    # the correction helps
    raw_lc = tpf.to_lightcurve(aperture_mask="threshold")
    assert clc.estimate_cdpp() < raw_lc.estimate_cdpp()


def test_tess_pld_corrector():
    tpf = _background_tpf(mission="TESS")
    pld = PLDCorrector(tpf)
    clc = pld.correct()
    assert isinstance(clc, TessLightCurve)
    pld.diagnose()
    plt.close("all")
    pld.diagnose_masks()
    plt.close("all")
    pld.correct(sparse=True)
    raw_lc = tpf.to_lightcurve(aperture_mask="threshold")
    assert clc.estimate_cdpp() < raw_lc.estimate_cdpp()


def test_pld_aperture_mask():
    """Reference #523: correct() accepts a separate PLD pixel aperture."""
    tpf = _motion_tpf(mission="K2")
    lc_thresh = tpf.to_corrector("pld").correct(
        pld_aperture_mask="threshold", restore_trend=False)
    lc_all = tpf.to_corrector("pld").correct(
        pld_aperture_mask="all", restore_trend=False)
    # using all pixels gives PLD more regressors; both must run and
    # produce finite output
    assert np.isfinite(lc_thresh.flux.value).all()
    assert np.isfinite(lc_all.flux.value).all()


def test_pld_pca_components():
    """correct(pca_components=N) is honored."""
    tpf = _motion_tpf(mission="K2")
    pld = PLDCorrector(tpf, aperture_mask="threshold")
    corrected = pld.correct()
    assert corrected.estimate_cdpp() < tpf.to_lightcurve(
        aperture_mask="threshold").estimate_cdpp()
    pld.correct(pca_components=8)


def test_tpf_with_allflux_err_nan():
    """Reference #873 family: all-NaN flux_err raises ValueError."""
    tpf = make_synthetic_tpf(n_cadences=50, shape=(7, 7), mission="K2")
    tpf.flux_err = np.full_like(np.asarray(tpf.flux_err.value), np.nan)
    with pytest.raises(ValueError):
        PLDCorrector(tpf).correct()


def test_tpf_with_someflux_err_nan():
    """Cadences with NaN flux_err are masked out and PLD proceeds."""
    tpf = make_synthetic_tpf(n_cadences=100, shape=(7, 7), mission="K2")
    ferr = np.asarray(tpf.flux_err.value).copy()
    ferr[::7] = np.nan
    tpf.flux_err = ferr
    pld = PLDCorrector(tpf)
    # the NaN cadences were dropped, the rest were corrected
    assert len(pld.lc) == 100 - len(range(0, 100, 7))
    pld.correct()
