"""Mirrors of reference tests/test_lightcurve.py behaviors (batch 3).

Covers: the rmse/nanstd bin aggregators (incl. masked arrays and
reduceat bin edges), bin() core semantics and regressions (#377, #500),
to_pandas/to_table, to_fits structure, slicing across LightCurve
subclasses, boolean masking, remove_nans/remove_outliers variants, and
the plot family.
"""
import warnings

import matplotlib.pyplot as plt
import numpy as np
import pytest
from numpy.testing import (assert_allclose, assert_almost_equal,
                           assert_array_equal)

from lightkurve_tpu import (KeplerLightCurve, LightCurve, TessLightCurve)
from lightkurve_tpu.lightcurve import nanstd, rmse

n = np.nan


def test_rmse():
    """RMS implementation used in bin() handles NaN and masked values."""
    data = [n, 3, 4, 9, n]
    mask = [0, 0, 0, 1, 1]
    expected = np.sqrt((3 ** 2 + 4 ** 2) / 2)

    vals = np.ma.MaskedArray(data=data, mask=mask)
    actual = rmse(vals)
    assert_almost_equal(actual, expected)
    assert np.isfinite(actual)
    assert np.isnan(rmse(vals[3:]))  # all masked

    # reduceat: 2 normal bins + 1 all-masked bin
    data2 = data + data + [4, n]
    mask2 = mask + mask + [1, 1]
    indices2 = [0, 5, 10]
    expected2 = [expected, expected, n]

    vals2 = np.ma.MaskedArray(data=data2, mask=mask2)
    actual2 = rmse.reduceat(vals2, indices2)
    assert_allclose(actual2[:2], expected2[:2])
    assert np.all(np.isfinite(actual2[:2]))
    assert np.isnan(actual2[2])

    vals2 = np.ma.MaskedArray(data=data2, mask=mask2).filled(np.nan)
    actual2 = rmse.reduceat(vals2, indices2)
    assert_allclose(actual2[:2], expected2[:2])
    assert np.isnan(actual2[2])


def test_nanstd():
    """nanstd implementation used in bin() handles NaN and masked values."""
    data = [n, 3, 4, 9, n]
    mask = [0, 0, 0, 1, 1]
    expected = np.std([3, 4])

    vals = np.ma.MaskedArray(data=data, mask=mask)
    actual = nanstd(vals)
    assert_almost_equal(actual, expected)
    assert np.isfinite(actual)
    assert np.isnan(nanstd(vals[3:]))

    data2 = data + data + [4, n]
    mask2 = mask + mask + [1, 1]
    indices2 = [0, 5, 10]
    expected2 = [expected, expected, n]

    vals2 = np.ma.MaskedArray(data=data2, mask=mask2)
    actual2 = nanstd.reduceat(vals2, indices2)
    assert_allclose(actual2[:2], expected2[:2])
    assert np.isnan(actual2[2])

    vals2 = np.ma.MaskedArray(data=data2, mask=mask2).filled(np.nan)
    actual2 = nanstd.reduceat(vals2, indices2)
    assert_allclose(actual2[:2], expected2[:2])
    assert np.isnan(actual2[2])


def test_bin():
    """Core bin() semantics + regressions #377 and #500."""
    lc = LightCurve(time=np.arange(10), flux=2 * np.ones(10),
                    flux_err=2 ** 0.5 * np.ones(10))
    binned_lc = lc.bin(binsize=2)
    assert_allclose(binned_lc.flux.value, 2 * np.ones(5))
    # with finite flux_err, binned errors are the within-bin RMSE
    err_expected = np.sqrt(((2 ** 0.5) ** 2 + (2 ** 0.5) ** 2) / 2)
    assert_allclose(binned_lc.flux_err.value, err_expected * np.ones(5))
    assert len(binned_lc.time.value) == 5
    with pytest.raises(TypeError):
        lc.bin(method="doesnotexist")
    # without flux_err, binned errors are the within-bin stddev
    lc = LightCurve(time=np.arange(10), flux=2 * np.ones(10))
    binned_lc = lc.bin(binsize=2)
    assert_allclose(binned_lc.flux_err.value, np.zeros(5))
    # regression #377
    lc = KeplerLightCurve(time=np.arange(10), flux=2 * np.ones(10))
    lc.bin(5).remove_outliers()
    rng = np.random.default_rng(0)
    lc = KeplerLightCurve(time=np.arange(1000) * 0.02,
                          flux=1 + rng.normal(0, 1e-6, 1000),
                          cadenceno=np.arange(1000))
    assert np.isclose(float(lc.bin(2).estimate_cdpp().value), 1, rtol=1)
    # regression #500
    lc = LightCurve(time=np.arange(2000),
                    flux=rng.normal(loc=42, scale=0.01, size=2000))
    assert np.round(lc.bin(2000).flux_err.value[0], 2) == 0.01


def test_to_pandas():
    time, flux, flux_err = range(3), np.ones(3), np.zeros(3)
    lc = LightCurve(time=time, flux=flux, flux_err=flux_err)
    df = lc.to_pandas()
    assert_allclose(df.index, lc.time.value)
    assert_allclose(df.flux, flux)
    assert_allclose(df.flux_err, flux_err)
    df.describe()


def test_to_pandas_kepler():
    time, flux, quality = range(3), np.ones(3), np.zeros(3)
    lc = KeplerLightCurve(time=time, flux=flux, quality=quality)
    df = lc.to_pandas()
    assert_allclose(df.quality, quality)


def test_to_table():
    time, flux, flux_err = range(3), np.ones(3), np.zeros(3)
    lc = LightCurve(time=time, flux=flux, flux_err=flux_err)
    tbl = lc.to_table()
    assert_allclose(np.asarray(tbl["time"]), time)
    assert_allclose(np.asarray(tbl["flux"]), flux)
    assert_allclose(np.asarray(tbl["flux_err"]), flux_err)


def test_to_fits_structure():
    """to_fits produces the reference's HDU layout."""
    lc = KeplerLightCurve(time=[0, 1, 2, 3, 4], flux=np.ones(5),
                          flux_err=0.1 * np.ones(5))
    hdu = lc.to_fits()
    assert type(hdu).__name__ == "HDUList"
    assert len(hdu) >= 2
    assert hdu[1].header["EXTNAME"] == "LIGHTCURVE"
    assert hdu[1].header["TTYPE1"] == "TIME"
    assert hdu[1].header["TTYPE2"] == "FLUX"
    # extra keywords land in the primary header
    hdu = LightCurve(time=[0, 1, 2], flux=np.ones(3)).to_fits(
        MISSION="Kepler")
    assert hdu[0].header["MISSION"] == "Kepler"


def test_slicing():
    time = np.linspace(0, 10, 10)
    flux = np.linspace(100, 200, 10)
    flux_err = np.linspace(5, 50, 10)
    lc = LightCurve(time=time, flux=flux, flux_err=flux_err)
    assert_array_equal(lc[0:5].time.value, time[0:5])
    assert_array_equal(lc[2::2].flux.value, flux[2::2])
    assert_array_equal(lc[5:9:-1].flux_err.value, flux_err[5:9:-1])

    centroid_col = np.linspace(40, 50, 10)
    centroid_row = np.linspace(50, 60, 10)
    quality = np.linspace(70, 80, 10)
    cadenceno = np.linspace(90, 100, 10)
    for cls in (KeplerLightCurve, TessLightCurve):
        lc = cls(time=time, flux=flux, flux_err=flux_err,
                 centroid_col=centroid_col, centroid_row=centroid_row,
                 cadenceno=cadenceno, quality=quality)
        assert_array_equal(np.asarray(lc[::3].centroid_col),
                           centroid_col[::3])
        assert_array_equal(np.asarray(lc[4:].centroid_row),
                           centroid_row[4:])
        assert_array_equal(np.asarray(lc[10:2].quality), quality[10:2])
        assert_array_equal(np.asarray(lc[3:6].cadenceno), cadenceno[3:6])


def test_boolean_masking():
    lc = KeplerLightCurve(time=[1, 2, 3], flux=[1, 1, 10],
                          quality=[0, 0, 200], cadenceno=[5, 6, 7])
    sel = lc[np.asarray(lc.flux.value) < 5]
    assert_array_equal(sel.time.value, [1, 2])
    assert_array_equal(sel.flux.value, [1, 1])
    assert_array_equal(np.asarray(sel.quality), [0, 0])
    assert_array_equal(np.asarray(sel.cadenceno), [5, 6])


def test_remove_nans():
    time, flux = [1, 2, 3, 4], [100, np.nan, 102, np.nan]
    lc = LightCurve(time=time, flux=flux)
    lc_clean = lc.remove_nans()
    assert_array_equal(lc_clean.time.value, [1, 3])
    assert_array_equal(lc_clean.flux.value, [100, 102])
    lc_clean = lc.remove_nans("flux_err")
    assert_array_equal(lc_clean.flux.value, [])


def test_remove_outliers():
    lc = LightCurve(time=[1, 2, 3, 4], flux=[1, 1, 1000, 1],
                    flux_err=[0.1, 100, 0.1, 0.1])
    lc_clean = lc.remove_outliers(sigma=1)
    assert_array_equal(lc_clean.time.value, [1, 2, 4])
    assert_array_equal(lc_clean.flux.value, [1, 1, 1])
    # column selection for the clip
    lc_clean = lc.remove_outliers(sigma=1, column="flux_err")
    assert_array_equal(lc_clean.time.value, [1, 3, 4])
    assert_array_equal(lc_clean.flux.value, [1, 1000, 1])
    # return_mask
    lc_clean, outlier_mask = lc.remove_outliers(sigma=1, return_mask=True)
    assert len(outlier_mask) == len(lc.flux.value)
    assert outlier_mask.sum() == 1
    # asymmetric clip
    lc = LightCurve(time=[1, 2, 3, 4, 5], flux=[1, 1000, 1, -1000, 1])
    lc_clean = lc.remove_outliers(sigma_lower=float("inf"), sigma_upper=1)
    assert_array_equal(lc_clean.time.value, [1, 3, 4, 5])
    assert_array_equal(lc_clean.flux.value, [1, 1, -1000, 1])
    # masked flux containing NaN
    lc = LightCurve(time=[1, 2, 3, 4, 5],
                    flux=np.ma.MaskedArray([1, 1, 1000, 1, np.nan]))
    lc_clean = lc.remove_outliers(sigma=1)
    assert_array_equal(lc_clean.time.value, [1, 2, 4])


def test_lightcurve_plots():
    """The plot family runs for every style variant."""
    lc = KeplerLightCurve(time=np.arange(20),
                          flux=1 + 0.01 * np.random.default_rng(0)
                          .standard_normal(20),
                          flux_err=0.01 * np.ones(20))
    lc.plot()
    lc.plot(normalize=True, title="Not the default")
    lc.scatter()
    lc.scatter(c="C3")
    lc.scatter(c=lc.time.value, show_colorbar=True, colorbar_label="Time")
    lc.errorbar()
    ax = lc.plot(column="flux_err")
    assert ax is not None
    plt.close("all")
