"""Mirrors of reference tests/test_lightcurve.py behaviors (batch 1).

Covers: unit arithmetic, scalar-math regression #925, fold semantics
(incl. odd/even masks #1104, quantities #520, cycle #1397), deep copy,
rmse/nanstd bin aggregation semantics, bin meta/bins kwarg/quality,
invalid normalize warnings, to_pandas/to_table, FITS TUNIT headers,
bkjd time, reprs, flatten special cases, fill_gaps, targetid.
"""
import warnings

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_almost_equal, \
    assert_array_equal

from lightkurve_tpu import (KeplerLightCurve, LightCurve, TessLightCurve)
from lightkurve_tpu.units import Quantity, pixel, dimensionless
from lightkurve_tpu.utils import LightkurveWarning


def test_math_operators_on_units():
    lc = LightCurve(time=np.arange(1, 5), flux=np.arange(1, 5),
                    flux_err=np.arange(1, 5))
    lc_mul = lc * pixel
    lc_div = lc / pixel
    assert str(lc_mul.flux.unit) == "pix"
    assert str(lc_mul.flux_err.unit) == "pix"
    assert lc_div.flux.unit == pixel ** -1
    assert lc_div.flux_err.unit == pixel ** -1


def test_math_regression_925():
    """Left-hand-side scalar math (reference regression #925)."""
    lc = LightCurve(time=[1, 2, 3], flux=[1, 1, 1], flux_err=[1, 1, 1])
    for three in [3, 3.0, np.float64(3), Quantity(3.0, dimensionless)]:
        assert np.all((three * lc).flux.value == 3)
        assert np.all((lc * three).flux.value == 3)
        assert np.all((three + lc).flux.value == 4)
        assert np.all((lc + three).flux.value == 4)


def test_lightcurve_fold():
    """Reference test_lightcurve_fold core semantics."""
    lc = KeplerLightCurve(time=np.linspace(0, 10, 100),
                          flux=np.zeros(100) + 1,
                          targetid=999, label="mystar", meta={"CCD": 2})
    fold = lc.fold(period=1)
    assert_almost_equal(np.asarray(fold.phase)[0], -0.5, 2)
    assert_almost_equal(np.min(np.asarray(fold.phase)), -0.5, 2)
    assert_almost_equal(np.max(np.asarray(fold.phase)), 0.5, 2)
    # lc.fold() without epoch_time: cycles count from 0 (#1397)
    assert np.min(fold.cycle) == 0
    assert np.max(fold.cycle) == 10
    assert fold.targetid == lc.targetid
    assert fold.label == lc.label
    assert set(lc.meta).issubset(set(fold.meta))
    assert lc.meta["CCD"] == fold.meta["CCD"]
    assert_array_equal(np.sort(fold.time_original.value), lc.time.value)
    assert len(fold.time_original) == len(lc.time)

    fold = lc.fold(period=1, epoch_time=-0.1)
    assert_almost_equal(np.asarray(fold.phase)[0], -0.5, 2)
    assert_almost_equal(fold.time.value[0], -0.5, 2)

    ax = fold.plot()
    assert "Phase" in ax.get_xlabel()
    ax = fold.scatter()
    assert "Phase" in ax.get_xlabel()
    ax = fold.errorbar()
    assert "Phase" in ax.get_xlabel()
    import matplotlib.pyplot as plt
    plt.close("all")

    # t0 given in JD while time is BKJD → warning
    with pytest.warns(LightkurveWarning, match="appears to be given in JD"):
        lc.fold(10, 2456600)

    # binning a folded light curve works, normalized or not (#1422)
    fold = lc.fold(period=1.5, normalize_phase=False)
    assert_almost_equal(np.max(np.asarray(fold.phase))
                        - np.min(np.asarray(fold.phase)), 1.5, 1)
    assert len(fold.bin(bins=10)) == 10
    fold = lc.fold(period=1.5, normalize_phase=True)
    assert_almost_equal(np.max(np.asarray(fold.phase))
                        - np.min(np.asarray(fold.phase)), 1, 1)
    binned = fold.bin(bins=10)
    assert len(binned) == 10
    assert len(fold) == 100  # fold unchanged

    fold_copy = fold.copy()
    assert_array_equal(np.asarray(fold.time.value),
                       np.asarray(fold_copy.time.value))
    assert_array_equal(fold.flux.value, fold_copy.flux.value)
    assert fold is not fold_copy
    assert fold.flux is not fold_copy.flux


@pytest.mark.parametrize("normalize_phase", [False, True])
def test_lightcurve_fold_odd_even_masks(normalize_phase):
    """Odd/even masks depend on epoch_time only, not epoch_phase (#1104)."""
    epoch_time, period = 3, 4
    lc = LightCurve(time=np.linspace(0, 10, 100), targetid=999,
                    label="mystar", meta={"CCD": 2})
    lc.flux = np.sin((period * 0.75 + lc.time.value - epoch_time)
                     * 2 * np.pi / period)
    fold = lc.fold(period=period, epoch_time=epoch_time, epoch_phase=0.5,
                   normalize_phase=normalize_phase)
    odd = fold.odd_mask
    even = fold.even_mask
    assert len(odd) == len(fold.time)
    assert np.all(odd == ~even)

    wrapped = lc.fold(period=period, epoch_time=epoch_time, epoch_phase=0.5,
                      normalize_phase=normalize_phase, wrap_phase=0.25)
    assert_almost_equal(np.asarray(wrapped.phase)[-1], 0.25, decimal=1)

    to = fold.time_original.value
    even_expected = np.array([(t < 1 or (5 <= t < 9)) for t in to])
    assert_array_equal(even, even_expected)
    cycle_expected = np.array(
        [0 if t < 1 else 1 if t < 5 else 2 if t < 9 else 3 for t in to])
    assert_array_equal(fold.cycle, cycle_expected)


def test_lightcurve_fold_issue520():
    """fold() accepts unit-carrying quantities (#520)."""
    lc = LightCurve(time=np.linspace(0, 10, 100), flux=np.zeros(100) + 1)
    lc.fold(period=Quantity(1, "d"), epoch_time=Quantity(5, "d"))


def test_lightcurve_copy():
    lc = LightCurve(time=np.array([1, 2, 3, 4]),
                    flux=np.array([1., 2, 3, 4]),
                    flux_err=np.array([0.1, 0.2, 0.3, 0.4]))
    nlc = lc.copy()
    assert_array_equal(lc.flux.value, nlc.flux.value)
    assert_array_equal(lc.flux_err.value, nlc.flux_err.value)
    nlc.flux[1] = 6
    nlc.flux_err[1] = 7
    # the copy is deep: the original is untouched
    assert lc.flux.value[1] == 2
    assert lc.flux_err.value[1] == 0.2

    lc = KeplerLightCurve(time=[1, 2, 3], flux=[1, 0.5, 1],
                          centroid_col=[4., 5, 6], centroid_row=[7., 8, 9],
                          cadenceno=[10, 11, 12], quality=[10, 20, 30])
    nlc = lc.copy()
    for col in ("centroid_col", "centroid_row", "cadenceno", "quality"):
        assert_array_equal(np.asarray(lc[col]), np.asarray(nlc[col]))
    nlc.centroid_col[1] = 8
    nlc.quality[1] = 11
    assert np.asarray(lc.centroid_col)[1] == 5
    assert np.asarray(lc.quality)[1] == 20


def test_rmse_and_nanstd_aggregation():
    """Reference test_rmse/test_nanstd semantics through bin_aggregate
    (masked values are NaN/mask=False in our model)."""
    import jax.numpy as jnp
    from lightkurve_tpu.ops.binning import bin_aggregate
    n = np.nan
    data = np.array([n, 3, 4, 9, n] * 2 + [4, n])
    mask = ~np.isnan(data)
    mask[3] = mask[8] = False          # "masked" values
    mask[10] = False
    seg = np.array([0] * 5 + [1] * 5 + [2] * 2)
    mean, rmse, std, cnt = bin_aggregate(
        jnp.asarray(np.where(mask, data, 0.0)), jnp.asarray(mask),
        jnp.asarray(seg), 3)
    expected_rmse = np.sqrt((9 + 16) / 2)
    assert_allclose(np.asarray(rmse)[:2], [expected_rmse, expected_rmse],
                    rtol=1e-12)
    assert np.isnan(np.asarray(rmse)[2]), "all-masked bin yields NaN"
    expected_std = np.std([3, 4])
    assert_allclose(np.asarray(std)[:2], [expected_std, expected_std],
                    rtol=1e-12)
    assert np.isnan(np.asarray(std)[2])
    assert_allclose(np.asarray(mean)[:2], [3.5, 3.5], rtol=1e-12)


def test_bin_meta():
    """bin() carries the original meta (#1040)."""
    lc = LightCurve(time=np.arange(10), flux=2 * np.ones(10),
                    flux_err=2 ** 0.5 * np.ones(10))
    lc.meta["CREATOR"] = "lk unit test"
    lc.meta["SECTOR"] = 99
    binned = lc.bin(time_bin_size=5)
    assert binned.meta == lc.meta


def test_bins_kwarg():
    """User-defined bin placement (reference test_bins_kwarg)."""
    np.random.seed(0)
    n_times, end_time = 3800, 80.0
    tp = np.sort(np.random.uniform(0, end_time, n_times))
    lc = LightCurve(time=tp, flux=1 + np.random.normal(0, 0.1, n_times),
                    flux_err=0.1 * np.ones(n_times))
    binned = lc.bin(time_bin_size=Quantity(10, "d"))
    assert len(binned) == np.ceil(end_time / 10)
    binned = lc.bin(time_bin_size=Quantity(11, "d"))
    assert len(binned) == np.ceil(end_time / 11)
    binned = lc.bin(time_bin_size=Quantity(10, "d"), n_bins=38)
    assert len(binned) == 38
    # N fenceposts → N-1 bins
    binned = lc.bin(bins=[0, 10, 20, 30, 40, 50, 60, 70, 80])
    assert len(binned) == 8
    binned = lc.bin(bins=np.arange(0, 81, 1))
    assert len(binned) == 80
    binned = lc.bin(bins=np.arange(0, 61, 1))
    assert len(binned) == 60
    with pytest.raises(TypeError, match="``bins`` must have integer type."):
        lc.bin(bins="junk_input!")
    # flux_err combines as within-bin RMSE (the reference's actual
    # behavior: rmse() at reference lightcurve.py:167-172; the root-N
    # expectation in reference test_bins_kwarg is @pytest.mark.skip'd
    # upstream pending astropy #12527)
    binned = lc.bin(binsize=100)
    assert np.isclose(binned.flux_err.value.mean(), 0.1, rtol=0.05)
    binned = lc.bin(bins=38)
    assert np.isclose(binned.flux_err.value.mean(), 0.1, rtol=0.05)
    with pytest.raises(TypeError, match="``bins`` must have integer type."):
        lc.bin(bins=381.0)
    # more bins than samples is allowed
    binned = lc.bin(bins=10000)
    assert 10000 - 2 <= len(binned) <= 10000


def test_binned_quality():
    """Binning combines quality flags by bitwise OR."""
    lc = KeplerLightCurve(time=[1, 2, 3, 4], flux=[1, 1, 1, 1],
                          quality=[0, 1, 2, 3],
                          centroid_col=[0., 1, 0, 1],
                          centroid_row=[0., 2, 0, 2])
    binned = lc.bin(binsize=2)
    assert_allclose(np.asarray(binned.quality), [1, 3])


def test_invalid_normalize():
    """Normalize warns on zero-centered / negative light curves."""
    lc = LightCurve(time=np.arange(10), flux=np.zeros(10))
    with pytest.warns(LightkurveWarning, match="zero-centered"):
        lc.normalize()
    lc = LightCurve(time=np.arange(10), flux=np.zeros(10),
                    flux_err=0.05 * np.ones(10))
    with pytest.warns(LightkurveWarning, match="zero-centered"):
        lc.normalize()
    lc = LightCurve(time=np.arange(10), flux=-np.ones(10),
                    flux_err=0.05 * np.ones(10))
    with pytest.warns(LightkurveWarning, match="negative"):
        lc.normalize()


def test_to_pandas_kepler():
    """to_pandas() on mission subclasses includes extra columns."""
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


def test_to_fits_flux_units_in_header():
    """Dimensionless flux writes no TUNIT; united flux records it."""
    hdu = LightCurve(time=[0, 1, 2, 3, 4], flux=np.ones(5),
                     flux_err=0.1 * np.ones(5)).to_fits()
    assert "TUNIT2" not in hdu[1].header
    assert "TUNIT3" not in hdu[1].header
    hdu = LightCurve(time=[0, 1, 2, 3, 4], flux=np.ones(5),
                     flux_err=0.1 * np.ones(5),
                     flux_unit="electron/second").to_fits()
    assert hdu[1].header["TUNIT2"] == "electron / s"
    assert hdu[1].header["TUNIT3"] == "electron / s"


def test_astropy_time_bkjd():
    """KeplerLightCurve time is bkjd: jd = bkjd + 2454833."""
    lc = KeplerLightCurve(time=[100, 200])
    assert_allclose(lc.time.jd, np.array([100, 200]) + 2454833.0)


def test_lightcurve_repr():
    time, flux = range(3), np.ones(3)
    for cls in (LightCurve, KeplerLightCurve, TessLightCurve):
        str(cls(time=time, flux=flux))
        repr(cls(time=time, flux=flux))


def test_flatten_with_nans():
    lc = LightCurve(time=[1, 2, 3, 4, 5],
                    flux=[np.nan, 1.1, 1.2, np.nan, 1.4],
                    flux_err=[1.0, np.nan, 1.2, 1.3, np.nan])
    flat = lc.flatten(window_length=3)
    assert len(flat.time) == 5
    assert np.isfinite(flat.flux.value).sum() == 3
    assert np.isfinite(flat.flux_err.value).sum() == 3


def test_flatten_robustness():
    lc = LightCurve(time=[1, 2, 3, 4, 5, 6], flux=[10, 20, 30, 40, 50, 60])
    expected = np.ones(6)
    flat = lc.flatten(window_length=3, polyorder=1)
    assert_allclose(flat.flux.value, expected)
    # window_length > len(flux)
    flat = lc.flatten(window_length=7, polyorder=1)
    assert_allclose(flat.flux.value,
                    flat.flux.value / np.median(flat.flux.value))
    # polyorder >= window_length degrades gracefully
    flat = lc.flatten(window_length=3, polyorder=3)
    assert_allclose(flat.flux.value, expected)
    flat = lc.flatten(window_length=3, polyorder=5)
    assert_allclose(flat.flux.value, expected)
    flat = lc.flatten(window_length=3, break_tolerance=None)
    assert_allclose(flat.flux.value, expected)
    flat, trend = lc.flatten(return_trend=True)
    assert_allclose(flat.time.value, trend.time.value)
    assert_allclose(lc.flux.value, flat.flux.value * trend.flux.value)


def test_flatten_returns_normalized():
    """Flatten output is dimensionless & NORMALIZED; trend keeps units
    (#838)."""
    lc = LightCurve(time=[1, 2, 3, 4, 5, 6],
                    flux=[10.1, 20.2, 30.3, 40.4, 50.5, 60.6],
                    flux_err=[0.01, 0.02, 0.03, 0.04, 0.05, 0.06],
                    flux_unit="electron/second")
    flat, trend = lc.flatten(window_length=3, polyorder=1, return_trend=True)
    assert str(flat.flux.unit) == ""
    assert str(flat.flux_err.unit) == ""
    assert flat.meta["NORMALIZED"]
    assert str(trend.flux.unit) == "electron / s"
    assert str(trend.flux_err.unit) == "electron / s"
    flat.normalize(unit="percent")
    trend.normalize(unit="percent")


def test_iterative_flatten():
    """Iterative sigma clipping buries single outliers."""
    x = np.arange(2000)
    y = np.sin(x / 200) / 100 + 1
    y[250] -= 0.01
    lc = LightCurve(time=x, flux=y)
    c, f = lc.flatten(window_length=25, niters=2, sigma=3, return_trend=True)
    assert np.isclose(c.flux.value, 1, rtol=0.00001).sum() == 1999
    mask = np.zeros(2000, dtype=bool)
    mask[250] = True
    c, f = lc.flatten(window_length=25, niters=1, sigma=3, mask=mask,
                      return_trend=True)
    assert np.isclose(c.flux.value, 1, rtol=0.00001).sum() == 1999


def test_fill_gaps():
    lc = LightCurve(time=[1, 2, 3, 4, 6, 7, 8], flux=[1, 1, 1, 1, 1, 1, 1])
    nlc = lc.fill_gaps()
    assert len(lc.time) < len(nlc.time)
    assert np.any(nlc.time.value == 5)
    assert np.all(nlc.flux.value == 1)

    lc = LightCurve(time=[1, 2, 3, 4, 6, 7, 8],
                    flux=[1, 1, np.nan, 1, 1, 1, 1])
    nlc = lc.fill_gaps()
    assert len(lc.time) < len(nlc.time)
    assert np.any(nlc.time.value == 5)
    assert np.all(nlc.flux.value == 1)
    assert np.all(np.isfinite(nlc.flux.value))

    # endianness robustness (#188)
    for dt in (">f8", "<f8"):
        lc = LightCurve(time=np.array([1, 2, 3, 4, 6, 7, 8], dtype=dt),
                        flux=np.array([1, 1, 1, np.nan, np.nan, 1, 1],
                                      dtype=dt))
        lc.fill_gaps()


def test_targetid():
    lc = LightCurve(time=[], targetid=5)
    assert lc.targetid == 5
    lc.targetid = 99
    assert lc.targetid == 99
    lc = KeplerLightCurve(time=[], targetid=10)
    assert lc.targetid == 10
    lc.targetid = 99
    assert lc.targetid == 99
    lc = TessLightCurve(time=[], targetid=20)
    assert lc.targetid == 20
