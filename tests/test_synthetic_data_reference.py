"""Mirrors of reference tests/test_synthetic_data.py — the reference's
headline end-to-end signal-recovery suite, driven by its REAL synthetic
K2 TPF files (known injected sine/transit signals + realistic K2 motion
systematics; see reference tests/data/synthetic/README.md)."""
import os

import numpy as np
import pytest
from scipy import stats

from lightkurve_tpu import KeplerTargetPixelFile
from lightkurve_tpu.correctors import PLDCorrector, SFFCorrector
from lightkurve_tpu.io.fits import open_fits

SYN = "/root/reference/tests/data/synthetic"
FN_SINE = os.path.join(SYN, "synthetic-k2-sinusoid.targ.fits.gz")
FN_TRANSIT = os.path.join(SYN, "synthetic-k2-planet.targ.fits.gz")
FN_FLAT = os.path.join(SYN, "synthetic-k2-flat.targ.fits.gz")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SYN), reason="reference synthetic data not available")


def _truth(fn, *keys):
    hdul = open_fits(fn)
    return [float(hdul[3].header[k]) for k in keys]


def test_sine_sff():
    """Recover a synthetic sine curve using SFF and LombScargle."""
    true_period, true_amplitude = _truth(FN_SINE, "PERIOD", "SINE_AMP")
    tpf = KeplerTargetPixelFile(FN_SINE)
    lc = tpf.to_lightcurve()
    corrector = SFFCorrector(lc)
    cor_lc = corrector.correct(
        np.asarray(tpf.pos_corr2), np.asarray(tpf.pos_corr1), niters=4,
        windows=1, bins=7, restore_trend=True, timescale=0.5)

    pg = cor_lc.to_periodogram(method="lombscargle", minimum_period=1,
                               maximum_period=10, oversample_factor=10)
    ret_period = float(pg.period_at_max_power.value)
    assert true_period * 0.8 < ret_period < true_period * 1.2

    # amplitude within 10% via weighted least squares
    n_cad = len(tpf.time.value)
    dm = np.vstack([
        np.ones(n_cad),
        np.sin(2 * np.pi * cor_lc.time.value / ret_period),
        np.cos(2 * np.pi * cor_lc.time.value / ret_period)]).T
    ferr = cor_lc.flux_err.value
    ATA = dm.T @ (dm / ferr[:, None] ** 2)
    const, sin_w, cos_w = np.linalg.solve(
        ATA, dm.T @ (cor_lc.flux.value / ferr ** 2))
    frac_amp = np.hypot(sin_w, cos_w) / const
    assert true_amplitude / 1.1 < frac_amp < true_amplitude * 1.1


def test_transit_sff():
    """Recover a synthetic exoplanet signal using SFF and BLS."""
    true_period, true_rprs = _truth(FN_TRANSIT, "PERIOD", "RPRS")
    hdul = open_fits(FN_TRANSIT)
    max_depth = 1 - np.min(np.asarray(hdul[3].data["NOISELESS_INPUT"]))

    tpf = KeplerTargetPixelFile(FN_TRANSIT)
    lc = tpf.to_lightcurve().normalize()
    corrector = SFFCorrector(lc)
    cor_lc = corrector.correct(
        np.asarray(tpf.pos_corr2), np.asarray(tpf.pos_corr1), niters=4,
        windows=1, bins=7, restore_trend=False, timescale=0.5)

    pg = cor_lc.to_periodogram(method="bls", minimum_period=1,
                               maximum_period=9, frequency_factor=0.05,
                               duration=np.arange(0.1, 0.6, 0.1))
    ret_period = float(pg.period_at_max_power.value)
    assert true_period * 0.95 < ret_period < true_period * 1.05
    depth = float(np.asarray(pg.depth_at_max_power))
    assert true_rprs ** 2 <= depth < max_depth


def test_transit_pld():
    """Recover a synthetic exoplanet signal using PLD and BLS."""
    true_period, true_rprs = _truth(FN_TRANSIT, "PERIOD", "RPRS")
    hdul = open_fits(FN_TRANSIT)
    max_depth = 1 - np.min(np.asarray(hdul[3].data["NOISELESS_INPUT"]))

    tpf = KeplerTargetPixelFile(FN_TRANSIT)
    corrector = PLDCorrector(tpf)
    cor_lc = corrector.correct()
    pg = cor_lc.to_periodogram(method="bls", minimum_period=1,
                               maximum_period=9, frequency_factor=0.05,
                               duration=np.arange(0.1, 0.6, 0.1))
    # second pass with suspected transits masked
    cor_lc = corrector.correct(
        cadence_mask=~np.asarray(pg.get_transit_mask())).normalize()
    pg = cor_lc.to_periodogram(method="bls", minimum_period=1,
                               maximum_period=9, frequency_factor=0.05,
                               duration=np.arange(0.1, 0.6, 0.1))
    ret_period = float(pg.period_at_max_power.value)
    assert true_period * 0.95 < ret_period < true_period * 1.05
    depth = float(np.asarray(pg.depth_at_max_power))
    assert true_rprs ** 2 <= depth < max_depth


def test_sine_pld():
    """Recover a synthetic sine wave using PLD and LombScargle."""
    true_period, true_amplitude = _truth(FN_SINE, "PERIOD", "SINE_AMP")
    tpf = KeplerTargetPixelFile(FN_SINE)
    corrector = tpf.to_corrector("pld")
    cor_lc = corrector.correct()

    pg = cor_lc.to_periodogram(method="lombscargle", minimum_period=1,
                               maximum_period=10, oversample_factor=10)
    ret_period = float(pg.period_at_max_power.value)
    assert true_period * 0.8 < ret_period < true_period * 1.2

    n_cad = len(tpf.time.value)
    dm = np.vstack([
        np.ones(n_cad),
        np.sin(2 * np.pi * cor_lc.time.value / ret_period),
        np.cos(2 * np.pi * cor_lc.time.value / ret_period)]).T
    ferr = cor_lc.flux_err.value
    ATA = dm.T @ (dm / ferr[:, None] ** 2)
    const, sin_w, cos_w = np.linalg.solve(
        ATA, dm.T @ (cor_lc.flux.value / ferr ** 2))
    frac_amp = np.hypot(sin_w, cos_w) / const
    assert true_amplitude / 1.1 < frac_amp < true_amplitude * 1.1


def test_detrending_residuals():
    """Detrending residuals are Gaussian-ish and CDPP improves >10x."""
    tpf = KeplerTargetPixelFile(FN_FLAT)
    lc = tpf.to_lightcurve()
    corrector = SFFCorrector(lc)
    cor_lc = corrector.correct(np.asarray(tpf.pos_corr2),
                               np.asarray(tpf.pos_corr1), niters=10,
                               windows=5, bins=7, restore_trend=True)

    cdpp_improvement = float(lc.estimate_cdpp().value
                             / cor_lc.estimate_cdpp().value)
    assert cdpp_improvement > 10.0

    anderson_threshold = 1.57
    resid = (cor_lc.flux.value - np.mean(cor_lc.flux.value)) \
        / cor_lc.flux_err.value
    A_value, _, _ = stats.anderson(resid)
    assert A_value ** 2 < anderson_threshold
    assert np.std(resid) < 2.0

    corrector = tpf.to_corrector("pld")
    cor_lc = corrector.correct(restore_trend=False)
    cdpp_improvement = float(lc.estimate_cdpp().value
                             / cor_lc.estimate_cdpp().value)
    assert cdpp_improvement > 10.0
    resid = (cor_lc.flux.value - np.mean(cor_lc.flux.value)) \
        / cor_lc.flux_err.value
    A_value, _, _ = stats.anderson(resid)
    assert A_value ** 2 < anderson_threshold
    assert np.std(resid) < 2.0


def test_centroids():
    """Centroids track POS_CORR to within a hundredth of a pixel."""
    for fn in (FN_SINE, FN_TRANSIT, FN_FLAT):
        tpf = KeplerTargetPixelFile(fn)
        xraw, yraw = tpf.estimate_centroids()
        xnorm = np.asarray(xraw.value) - np.median(np.asarray(xraw.value))
        ynorm = np.asarray(yraw.value) - np.median(np.asarray(yraw.value))
        xposc = np.asarray(tpf.pos_corr2) - np.median(
            np.asarray(tpf.pos_corr2))
        yposc = np.asarray(tpf.pos_corr1) - np.median(
            np.asarray(tpf.pos_corr1))
        rmax = np.max(np.hypot(xnorm - xposc, ynorm - yposc))
        assert rmax < 0.01
