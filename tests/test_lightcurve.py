"""LightCurve API tests (mirrors reference tests/test_lightcurve.py)."""
import warnings

import numpy as np
import pytest

import lightkurve_tpu as lk
from lightkurve_tpu import LightCurve, FoldedLightCurve, LightkurveWarning
from lightkurve_tpu.units import Quantity, ppm, dimensionless, \
    electron_per_second
from lightkurve_tpu.time import Time


def simple_lc(n=100):
    t = np.arange(n, dtype=float)
    f = np.ones(n)
    fe = 0.1 * np.ones(n)
    return LightCurve(time=t, flux=f, flux_err=fe)


def test_init_basics():
    lc = LightCurve(time=[1, 2, 3], flux=[1.0, 0.9, 1.1])
    assert len(lc) == 3
    assert lc.columns[:3] == ["time", "flux", "flux_err"]
    assert np.all(np.isnan(lc.flux_err.value))
    assert isinstance(lc.time, Time)
    # extra columns & attribute access
    lc = LightCurve(time=[1, 2], flux=[1, 2], cadenceno=[100, 101])
    assert np.all(np.asarray(lc.cadenceno) == [100, 101])
    # meta access (upper-case)
    lc.meta["SECTOR"] = 14
    assert lc.sector == 14


def test_init_from_dict_and_default_time():
    lc = LightCurve({"flux": [1.0, 2.0, 3.0]})
    assert np.allclose(lc.time.value, [0, 1, 2])
    with pytest.raises(ValueError):
        LightCurve(time=[1, 2, 3], flux=[1, 2])  # length mismatch


def test_row_and_column_access():
    lc = simple_lc()
    sub = lc[10:20]
    assert len(sub) == 10
    assert np.allclose(sub.time.value, np.arange(10, 20))
    sub = lc[lc.time.value > 89]
    assert len(sub) == 10
    col = lc["flux"]
    assert isinstance(col, Quantity)


def test_arithmetic_error_propagation():
    """Reference lightcurve.py:764-859: hypot error propagation."""
    a = simple_lc()
    b = simple_lc()
    tot = a + b
    assert np.allclose(tot.flux.value, 2.0)
    assert np.allclose(tot.flux_err.value, np.hypot(0.1, 0.1))
    diff = a - b
    assert np.allclose(diff.flux.value, 0.0)
    prod = a * b
    assert np.allclose(prod.flux.value, 1.0)
    assert np.allclose(prod.flux_err.value,
                       1.0 * np.hypot(0.1 / 1, 0.1 / 1))
    quot = a / b
    assert np.allclose(quot.flux.value, 1.0)
    # scalar ops
    assert np.allclose((a * 2).flux.value, 2.0)
    assert np.allclose((a * 2).flux_err.value, 0.2)
    assert np.allclose((1 / a).flux.value, 1.0)
    # mismatched lengths raise
    with pytest.raises(ValueError):
        a + a[0:10]


def test_normalize_matches_reference_example():
    """Doctest values from reference lightcurve.py:1228-1235."""
    lc = LightCurve(time=[1, 2, 3], flux=[25945.7, 25901.5, 25931.2],
                    flux_err=[6.8, 4.6, 6.2])
    n = lc.normalize()
    np.testing.assert_allclose(n.flux.value,
                               [1.00055917, 0.99885466, 1.0], rtol=1e-8)
    np.testing.assert_allclose(n.flux_err.value,
                               [0.00026223, 0.00017739, 0.00023909],
                               atol=1e-8)
    assert n.meta["NORMALIZED"] is True
    p = lc.normalize(unit="ppm")
    assert p.flux.unit == ppm


def test_normalize_warnings():
    lc = LightCurve(time=[1, 2, 3], flux=[0.0, -1.0, 1.0])
    with pytest.warns(LightkurveWarning):
        lc.normalize()
    lc = LightCurve(time=[1, 2, 3], flux=[-5.0, -5.1, -4.9])
    with pytest.warns(LightkurveWarning):
        lc.normalize()


def test_remove_nans():
    lc = LightCurve(time=[1, 2, 3], flux=[1.0, np.nan, 1.0])
    clean = lc.remove_nans()
    assert len(clean) == 2
    assert np.allclose(clean.time.value, [1, 3])


def test_remove_outliers_matches_reference_doctest():
    """Reference lightcurve.py:1490-1515 doctest."""
    lc = LightCurve(time=[1, 2, 3, 4, 5], flux=[1, 1000, 1, -1000, 1])
    clean = lc.remove_outliers(sigma=1)
    assert np.allclose(clean.time.value, [1, 3, 5])
    clean = lc.remove_outliers(sigma_lower=float("inf"), sigma_upper=1)
    assert np.allclose(clean.time.value, [1, 3, 4, 5])
    clean, mask = lc.remove_outliers(sigma=1, return_mask=True)
    assert mask.tolist() == [False, True, False, True, False]


def test_fold_basic(rng):
    n = 1000
    t = np.arange(n) * 0.01
    period = 0.754
    flux = 1 + 0.1 * np.sin(2 * np.pi * t / period)
    lc = LightCurve(time=t, flux=flux)
    f = lc.fold(period=period)
    assert isinstance(f, FoldedLightCurve)
    assert f.time.value.min() >= -period / 2 - 1e-9
    assert f.time.value.max() <= period / 2 + 1e-9
    # phases sorted
    assert np.all(np.diff(f.time.value) >= 0)
    # phase column and cycle
    assert "time_original" in f.columns
    assert f.cycle.max() >= 1
    assert (f.odd_mask | f.even_mask).all()
    # normalized phase
    fn = lc.fold(period=period, normalize_phase=True)
    assert fn.time.value.max() <= 0.5 + 1e-9


def test_fold_epoch_warning():
    t = np.arange(10, dtype=float)
    lc = lk.TessLightCurve(time=t, flux=np.ones(10))
    with pytest.warns(LightkurveWarning, match="appears to be given in JD"):
        lc.fold(period=1.0, epoch_time=2455000.0)


def test_bin():
    n = 100
    t = np.arange(n, dtype=float)
    f = np.ones(n)
    f[::2] = 2.0
    lc = LightCurve(time=t, flux=f, flux_err=np.full(n, 0.1))
    b = lc.bin(time_bin_size=10.0)
    assert len(b) == 10
    assert np.allclose(b.flux.value, 1.5)
    # rmse error aggregation
    assert np.allclose(b.flux_err.value, np.sqrt(np.mean(0.1 ** 2 * np.ones(10))))
    # no flux_err → std of flux
    lc2 = LightCurve(time=t, flux=f)
    b2 = lc2.bin(time_bin_size=10.0)
    assert np.allclose(b2.flux_err.value, 0.5)
    # bins kwarg
    b3 = lc.bin(bins=5)
    assert len(b3) == 5
    with pytest.raises(ValueError):
        lc.bin(bins=5, binsize=5)


def test_bin_callable_aggregate_func():
    """VERDICT r1 item 9: callable aggregate_func (e.g. np.nanmedian) is
    honored for flux and data columns; flux_err stays rmse."""
    t = np.arange(10.0)
    flux = np.array([1, 2, 100, 1, 2, 100, 1, 2, 100, 4.0])
    lc = LightCurve(time=t, flux=flux, flux_err=np.full(10, 0.5))
    b = lc.bin(time_bin_size=3.0, aggregate_func=np.nanmedian)
    # per-bin median of [1,2,100] = 2 (mean would be 34.33)
    np.testing.assert_allclose(np.asarray(b.flux.value)[:3], [2, 2, 2])
    # flux_err still rmse (= 0.5 for constant errors)
    np.testing.assert_allclose(np.asarray(b.flux_err.value)[:3], 0.5)
    # NaN-aware callables see the NaNs
    flux2 = flux.copy()
    flux2[0] = np.nan
    lc2 = LightCurve(time=t, flux=flux2, flux_err=np.full(10, 0.5))
    b2 = lc2.bin(time_bin_size=3.0, aggregate_func=np.nanmedian)
    np.testing.assert_allclose(np.asarray(b2.flux.value)[0], 51.0)


def test_bin_array_time_bin_start_and_end():
    """Array-valued time_bin_start (+ scalar or array time_bin_end), as
    in astropy aggregate_downsample (reference :1590-1601)."""
    t = np.arange(12.0)
    flux = np.arange(12.0)
    lc = LightCurve(time=t, flux=flux, flux_err=np.full(12, 1.0))
    # contiguous bins: starts + scalar final end
    b = lc.bin(time_bin_start=[0.0, 4.0, 8.0], time_bin_end=12.0)
    assert len(b) == 3
    np.testing.assert_allclose(np.asarray(b.flux.value),
                               [1.5, 5.5, 9.5])
    np.testing.assert_allclose(np.asarray(b.time.value), [2.0, 6.0, 10.0])
    # non-contiguous bins: explicit ends exclude points in the gaps
    b2 = lc.bin(time_bin_start=[0.0, 8.0], time_bin_end=[2.0, 10.0])
    np.testing.assert_allclose(np.asarray(b2.flux.value), [0.5, 8.5])
    # array starts + scalar time_bin_size
    b3 = lc.bin(time_bin_start=[0.0, 6.0], time_bin_size=2.0)
    np.testing.assert_allclose(np.asarray(b3.flux.value), [0.5, 6.5])
    # array starts without end/size is an error
    with pytest.raises(ValueError):
        lc.bin(time_bin_start=[0.0, 6.0])
    with pytest.raises(ValueError):
        lc.bin(time_bin_size=1.0, time_bin_end=5.0)


def test_fill_gaps():
    lc = LightCurve(time=[1, 2, 3, 4, 6, 7, 8],
                    flux=[1.0] * 7, flux_err=[0.1] * 7)
    filled = lc.fill_gaps()
    assert len(filled) == 8
    assert np.allclose(np.diff(filled.time.value), 1.0)
    # with cadenceno (the precise path)
    lc = LightCurve(time=[1, 2, 3, 5], flux=[1.0] * 4,
                    cadenceno=[10, 11, 12, 14])
    filled = lc.fill_gaps()
    assert len(filled) == 5


def test_fill_gaps_seeded_rng_determinism():
    """SURVEY §7f RNG policy: seeded fills are reproducible and the
    global np.random state is untouched."""
    t = np.arange(100.0)
    t[50:] += 3.0  # a 3-cadence gap
    flux = 1.0 + 0.005 * np.sin(t) + 1e-3 * np.cos(7 * t)
    lc = LightCurve(time=t, flux=flux, flux_err=np.full(100, 0.1))
    state = np.random.get_state()[1].copy()
    a = lc.fill_gaps(seed=123)
    b = lc.fill_gaps(seed=123)
    c = lc.fill_gaps(seed=124)
    assert np.array_equal(a.flux.value, b.flux.value)
    assert not np.array_equal(a.flux.value, c.flux.value)
    assert np.array_equal(np.random.get_state()[1], state), \
        "fill_gaps must not touch the global np.random state"


def test_estimate_cdpp(rng):
    n = 3000
    t = np.arange(n) * 0.02
    flux = 1 + 100e-6 * rng.standard_normal(n)
    lc = LightCurve(time=t, flux=flux)
    cdpp = lc.estimate_cdpp()
    # white noise of 100 ppm, 13-cadence running mean → ~100/sqrt(13) ppm
    assert 15 < float(cdpp.value) < 45
    with pytest.raises(ValueError):
        lc.estimate_cdpp(transit_duration=2.5)


def test_create_transit_mask():
    """Reference lightcurve.py:2967-3037 semantics."""
    lc = LightCurve(time=np.arange(0, 10, 0.1), flux=np.ones(100))
    mask = lc.create_transit_mask(period=2.0, transit_time=1.0,
                                  duration=0.3)
    assert mask.sum() > 0
    in_t = lc.time.value[mask]
    ph = np.abs(np.mod(in_t - 1.0 + 1.0, 2.0) - 1.0)
    assert (ph < 0.15 + 1e-9).all()
    # multi-planet
    mask2 = lc.create_transit_mask(period=[2.0, 3.0],
                                   transit_time=[1.0, 0.5],
                                   duration=[0.3, 0.2])
    assert mask2.sum() >= mask.sum()
    with pytest.raises(ValueError):
        lc.create_transit_mask(period=[2.0], transit_time=[1.0, 2.0],
                               duration=[0.3])


def test_select_flux():
    lc = LightCurve(time=[1, 2, 3], flux=[1.0, 2.0, 3.0],
                    sap_flux=Quantity([4.0, 5.0, 6.0], electron_per_second))
    out = lc.select_flux("sap_flux")
    assert np.allclose(out.flux.value, [4, 5, 6])
    assert out.meta["FLUX_ORIGIN"] == "sap_flux"
    with pytest.raises(ValueError):
        lc.select_flux("nonexistent")


def test_truncate_head_tail():
    lc = simple_lc(50)
    assert len(lc.truncate(before=10, after=20)) == 11
    assert len(lc.head(7)) == 7
    assert len(lc.tail(7)) == 7


def test_flatten_improves_cdpp(rng):
    """Reference test_synthetic_data-style check: flatten removes trends."""
    n = 2000
    t = np.arange(n) * 0.02
    trend = 1 + 0.05 * np.sin(2 * np.pi * t / 11.0)
    flux = trend * (1 + 200e-6 * rng.standard_normal(n))
    lc = LightCurve(time=t, flux=flux)
    flat, trend_lc = lc.flatten(return_trend=True)
    assert np.std(flat.flux.value) < 0.1 * np.std(flux)
    assert np.corrcoef(trend_lc.flux.value, trend)[0, 1] > 0.99
    assert flat.meta["NORMALIZED"] is True


def test_to_pandas_csv(tmp_path):
    lc = simple_lc(10)
    df = lc.to_pandas()
    assert "flux" in df.columns
    csv = lc.to_csv()
    assert "flux" in csv
    path = tmp_path / "lc.csv"
    lc.to_csv(str(path))
    assert path.exists()


def test_plot_smoke():
    lc = simple_lc(50)
    ax = lc.plot()
    assert ax is not None
    ax = lc.scatter()
    ax = lc.errorbar()
    f = lc.fold(period=10.0)
    ax = f.plot_river(period=10.0) if hasattr(f, "plot_river") else None
    import matplotlib.pyplot as plt
    plt.close("all")


def test_mission_subclasses():
    klc = lk.KeplerLightCurve(time=[100.0, 101.0], flux=[1, 2])
    assert klc.time.format == "bkjd"
    tlc = lk.TessLightCurve(time=[100.0, 101.0], flux=[1, 2])
    assert tlc.time.format == "btjd"
    assert np.isclose(tlc.time.jd[0], 2457100.0)


def test_append():
    a = simple_lc(10)
    b = simple_lc(5)
    out = a.append(b)
    assert len(out) == 15
    out2 = a.append([b, b])
    assert len(out2) == 20
    with pytest.raises(ValueError):
        a.append(b, inplace=True)


def test_folded_plot_river_defaults(rng):
    n = 500
    t = np.arange(n) * 0.02
    lc = LightCurve(time=t, flux=1 + 0.01 * np.sin(2 * np.pi * t / 1.3))
    f = lc.fold(period=1.3)
    ax = f.plot_river()
    import matplotlib.pyplot as plt
    plt.close("all")
