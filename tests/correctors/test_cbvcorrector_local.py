"""Mirrors of reference tests/correctors/test_cbvcorrector.py that use
the REAL mission CBV calibration FITS files shipped with the reference
checkout (test_cbv_local + the offline half of test_CBVCorrector)."""
import os
import warnings

import matplotlib
import matplotlib.pyplot as plt
import numpy as np
import pytest
from numpy.testing import assert_allclose

from lightkurve_tpu import TessLightCurve
from lightkurve_tpu.correctors import (CBVCorrector, DesignMatrix,
                                       KeplerCotrendingBasisVectors,
                                       TessCotrendingBasisVectors,
                                       load_kepler_cbvs, load_tess_cbvs)
from lightkurve_tpu.utils import LightkurveWarning

TESTDATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TESTDATA),
    reason="reference test data not available")


def test_cbv_local():
    """Loading real local CBV calibration files."""
    cbvs = load_tess_cbvs(cbv_dir=TESTDATA, sector=10, camera=2, ccd=4,
                          cbv_type="SingleScale")
    assert isinstance(cbvs, TessCotrendingBasisVectors)
    ax = cbvs.plot([1, 2, 4, 6, 8])
    assert isinstance(ax, matplotlib.axes.Axes)
    assert cbvs.mission == "TESS"
    assert cbvs.cbv_type == "SingleScale"
    assert cbvs.band is None
    assert cbvs.sector == 10
    assert cbvs.camera == 2
    assert cbvs.ccd == 4

    cbvs = load_tess_cbvs(cbv_dir=TESTDATA, sector=10, camera=2, ccd=4,
                          cbv_type="MultiScale", band=2)
    assert isinstance(cbvs, TessCotrendingBasisVectors)
    ax = cbvs.plot("all")
    assert isinstance(ax, matplotlib.axes.Axes)
    assert cbvs.band == 2

    cbvs = load_tess_cbvs(cbv_dir=TESTDATA, sector=10, camera=2, ccd=4,
                          cbv_type="Spike")
    assert isinstance(cbvs, TessCotrendingBasisVectors)
    ax = cbvs.plot("all")
    assert isinstance(ax, matplotlib.axes.Axes)

    # MultiScale without band errors
    with pytest.raises(AssertionError):
        load_tess_cbvs(cbv_dir=TESTDATA, sector=10, camera=2, ccd=4,
                       cbv_type="MultiScale")
    # band with SingleScale errors
    with pytest.raises(AssertionError):
        load_tess_cbvs(cbv_dir=TESTDATA, sector=10, camera=2, ccd=4,
                       cbv_type="SingleScale", band=2)
    # improper CBV type errors
    with pytest.raises(Exception):
        load_tess_cbvs(cbv_dir=TESTDATA, sector=10, camera=2, ccd=4,
                       cbv_type="SuperSingleScale")

    cbvs = load_kepler_cbvs(cbv_dir=TESTDATA, mission="Kepler", quarter=8,
                            module=16, output=4)
    assert isinstance(cbvs, KeplerCotrendingBasisVectors)
    ax = cbvs.plot("all")
    assert isinstance(ax, matplotlib.axes.Axes)
    assert cbvs.mission == "Kepler"
    assert cbvs.cbv_type == "SingleScale"
    assert cbvs.quarter == 8
    assert cbvs.campaign is None
    assert cbvs.module == 16
    assert cbvs.output == 4

    cbvs = load_kepler_cbvs(cbv_dir=TESTDATA, mission="K2", campaign=15,
                            channel=24)
    assert isinstance(cbvs, KeplerCotrendingBasisVectors)
    ax = cbvs.plot("all")
    assert isinstance(ax, matplotlib.axes.Axes)
    assert cbvs.mission == "K2"
    assert cbvs.quarter is None
    assert cbvs.campaign == 15
    assert cbvs.module == 8
    assert cbvs.output == 4
    plt.close("all")


def test_CBVCorrector_offline():
    """The offline half of reference test_CBVCorrector."""
    sample_lc = TessLightCurve(
        time=[1, 2, 3, 4, 5], flux=[1, 2, np.nan, 4, 5],
        flux_err=[0.1, 0.1, 0.1, 0.1, 0.1], cadenceno=[1, 2, 3, 4, 5],
        flux_unit="electron/second")

    corrector = CBVCorrector(sample_lc, do_not_load_cbvs=True)
    # NaN removed, median preserved
    assert len(corrector.lc.flux) == 4
    assert_allclose(np.nanmedian(corrector.lc.flux.value),
                    np.nanmedian(sample_lc.flux.value))

    dm = DesignMatrix({"a": np.ones(4), "b": [1.0, 2, 4, 5]})

    # RegressionCorrector passthrough: zeroes the flux around the median
    lc = corrector.correct_regressioncorrector(dm)
    assert isinstance(lc, TessLightCurve)
    assert_allclose(lc.flux.value, np.nanmedian(lc.flux.value))

    # Gaussian-prior fit with weak regularization
    lc = corrector.correct_gaussian_prior(cbv_type=None, cbv_indices=None,
                                          alpha=1e-9, ext_dm=dm)
    assert isinstance(lc, TessLightCurve)
    assert str(lc.flux.unit) in ("electron / s", "electron/s")
    assert_allclose(lc.flux.value, np.nanmedian(lc.flux.value))
    ax = corrector.diagnose()
    assert len(ax) == 2 and isinstance(ax[0], matplotlib.axes.Axes)
    plt.close("all")

    # strong regularization under-fits: flux unchanged
    lc = corrector.correct_gaussian_prior(cbv_type=None, cbv_indices=None,
                                          alpha=1e9, ext_dm=dm)
    assert_allclose(lc.flux.value,
                    sample_lc.remove_nans().flux.value, rtol=1e-3)

    # wrong-cadence design matrix errors
    dm_err = DesignMatrix({"a": np.ones(5), "b": [1.0, 2, 4, 5, 6]})
    with pytest.raises(ValueError):
        corrector.correct_gaussian_prior(cbv_type=None, cbv_indices=None,
                                         alpha=1e-2, ext_dm=dm_err)

    # ElasticNet fit
    lc = corrector.correct_elasticnet(cbv_type=None, cbv_indices=None,
                                      alpha=1e-20, l1_ratio=0.5, ext_dm=dm)
    assert isinstance(lc, TessLightCurve)
    assert_allclose(lc.flux.value, np.nanmedian(lc.flux.value), rtol=1e-3)
    lc = corrector.correct_elasticnet(cbv_type=None, cbv_indices=None,
                                      alpha=1e9, l1_ratio=0.5, ext_dm=dm)
    assert_allclose(lc.flux.value,
                    sample_lc.remove_nans().flux.value, rtol=1e-3)

    # optimizer with a wrong-cadence dm errors
    with pytest.raises(ValueError):
        corrector.correct(cbv_type=None, cbv_indices=None,
                          alpha_bounds=[1e-4, 1e4], ext_dm=dm_err,
                          target_over_score=0.5, target_under_score=0.8)


def test_real_tess_cbvs_designmatrix_and_align():
    """The REAL sector-10 CBVs produce usable design matrices and align
    against a light curve sharing their cadence numbers.  (NOTE: the
    reference ships a 100-cadence excerpt whose vectors are constant
    over the window, so trend-recovery itself is exercised on synthetic
    CBVs in test_cbv.py.)"""
    cbvs = load_tess_cbvs(cbv_dir=TESTDATA, sector=10, camera=2, ccd=4,
                          cbv_type="SingleScale")
    n = len(cbvs.time.value)
    assert n > 0
    assert len(cbvs.cbv_indices) >= 8
    dm = cbvs.to_designmatrix(cbv_indices=[1, 2, 3])
    assert dm.shape == (n, 3)

    # align against a light curve missing some cadences: CBV rows shrink
    rng = np.random.default_rng(7)
    keep = np.sort(rng.choice(n, size=n - 10, replace=False))
    lc = TessLightCurve(time=cbvs.time.value[keep],
                        flux=1000 + rng.standard_normal(n - 10),
                        flux_err=np.ones(n - 10),
                        cadenceno=np.asarray(cbvs.cadenceno)[keep],
                        flux_unit="electron/second",
                        meta={"MISSION": "TESS", "SECTOR": 10})
    aligned = cbvs.copy()
    aligned = aligned.align(lc)
    assert len(aligned) == n - 10
    np.testing.assert_array_equal(np.asarray(aligned.cadenceno),
                                  np.asarray(lc["cadenceno"]))
