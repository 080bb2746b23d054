"""Mirrors of reference tests/test_lightcurve.py behaviors (batch 2).

Covers: initialization variants (data lists + names, structured
ndarrays, tables/dicts, mixed kwargs, TimeDelta), time reassignment,
column/meta attribute access semantics, meta assignment (#1046),
flux_unit/time_format keywords, normalize units, fold v2 API types,
row repr (#830), fill_gaps regressions (#868), value accessors,
bin regressions (#705, #1162), plot offset (#961), string columns
with units (#980), select-columns (#1194), and show_properties.
"""
import pickle
import warnings

import matplotlib.pyplot as plt
import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from lightkurve_tpu import (KeplerLightCurve, LightCurve, TessLightCurve)
from lightkurve_tpu.time import Time, TimeDelta
from lightkurve_tpu.units import (Quantity, Unit, dimensionless,
                                  electron_per_second)
from lightkurve_tpu.utils import (LightkurveDeprecationWarning,
                                  LightkurveWarning)

INPUT_RAW_TIME = [25800000.0, 25800000.1, 25800000.2]


def test_initialization_with_data():
    lc = LightCurve(time=INPUT_RAW_TIME, data=[[10, 2, 3], [4, 5, 6]],
                    names=["flux", "flux_err"])
    assert_array_equal(lc.time.value, INPUT_RAW_TIME)
    assert_array_equal(lc["flux"].value, [10, 2, 3])
    assert_array_equal(lc["flux_err"].value, [4, 5, 6])


def test_initialization_with_dict_table():
    lc = LightCurve(time=INPUT_RAW_TIME,
                    data={"flux": [1, 2, 11], "flux_err": [3, 4, 1],
                          "c": [1, 1, 1]})
    assert lc.colnames == ["time", "flux", "flux_err", "c"]


def test_initialization_with_time_in_data():
    data = {"flux": [1, 2, 11], "flux_err": [3, 4, 1], "c": [1, 1, 1],
            "time": INPUT_RAW_TIME}
    lc1 = LightCurve(data=data)
    assert set(lc1.colnames) == {"time", "flux", "flux_err", "c"}
    assert_array_equal(lc1.time.value, INPUT_RAW_TIME)

    # flux / flux_err are not required inputs; they are auto-generated
    lc2 = LightCurve(data=[[10, 2, 3], INPUT_RAW_TIME],
                     names=["a", "time"])
    assert set(lc2.colnames) == {"time", "a", "flux", "flux_err"}
    assert_array_equal(lc2.time.value, INPUT_RAW_TIME)


def test_initialization_with_raw_time_in_data():
    lc = LightCurve(data=[[10, 2, 3], [4, 5, 6], INPUT_RAW_TIME],
                    names=["flux", "flux_err", "time"])
    assert set(lc.colnames) == {"time", "flux", "flux_err"}
    assert_array_equal(lc.time.value, INPUT_RAW_TIME)


def test_initialization_with_ndarray():
    data = np.array([(1.0, 0.2, 0), (3.0, 0.4, 4), (5.0, 0.6, 2)],
                    dtype=[("flux", "f8"), ("flux_err", "f8"), ("c", "i4")])
    lc = LightCurve(time=INPUT_RAW_TIME, data=data)
    assert lc.colnames == ["time", "flux", "flux_err", "c"]


def test_initialization_with_time_in_ndarray():
    data = np.array([(1.0, 0.2, 0, INPUT_RAW_TIME[0]),
                     (3.0, 0.4, 4, INPUT_RAW_TIME[1]),
                     (5.0, 0.6, 2, INPUT_RAW_TIME[2])],
                    dtype=[("flux", "f8"), ("flux_err", "f8"), ("c", "i4"),
                           ("time", "f8")])
    lc = LightCurve(data=data)
    assert set(lc.colnames) == {"time", "flux", "flux_err", "c"}


def test_mixed_instantiation():
    """A LightCurve can be built from a mix of keywords and data columns."""
    LightCurve(flux=[4, 5, 6], flux_err=[7, 8, 9], data={"time": [1, 2, 3]})
    LightCurve(time=[1, 2, 3], flux_err=[7, 8, 9], data={"flux": [4, 5, 6]})
    LightCurve(data={"time": [1, 2, 3]}, flux=[4, 5, 6])
    LightCurve(time=[1, 2, 3], flux=[1, 2, 3], data={"flux_err": [3, 4, 5]})


def test_timedelta():
    td = TimeDelta([-0.5, 0, +0.5])
    LightCurve(time=td)
    LightCurve(data={"time": td})


def test_assignment_time():
    lc = KeplerLightCurve(time=Time([1, 2, 3], scale="tdb", format="bkjd"),
                          flux=[4, 5, 6], flux_err=[7, 8, 9])
    time_adjusted = lc.time - 0.5
    lc.time = time_adjusted
    assert_array_equal(lc.time.value, time_adjusted.value)

    # raw values adopt the existing format/scale
    lc.time = [11.0, 12.0, 13.0]
    assert_array_equal(lc.time.value, [11.0, 12.0, 13.0])
    assert lc.time.format == "bkjd"

    # scalars broadcast to the current length
    lc.time = 21
    assert_array_equal(lc.time.value, [21, 21, 21])
    assert lc.time.format == "bkjd"


def test_attr_access_columns():
    lc = LightCurve(time=Time([1, 2, 3], scale="tdb", format="jd"),
                    flux=Quantity([4, 5, 6], electron_per_second))
    assert_array_equal(lc.flux.value, np.asarray(lc["flux"]))
    lc.flux = Quantity([7, 8, 9], electron_per_second)
    assert_array_equal(lc.flux.value, [7, 8, 9])

    lc["cadenceno"] = [101, 102, 103]
    assert_array_equal(np.asarray(lc["cadenceno"]), [101, 102, 103])
    assert lc.cadenceno is lc["cadenceno"]

    lc["flux_adjusted"] = Quantity([7.1, 8.1, 9.1], electron_per_second)
    assert lc.flux_adjusted is lc["flux_adjusted"]

    # a column named after an existing method does not shadow the method
    lc["bin"] = Quantity([5, 6, 7], electron_per_second)
    assert callable(lc.bin)

    # assigning a brand-new attribute warns and does NOT create a column
    with pytest.warns(UserWarning, match="new attribute name"):
        lc.flux2 = [6, 7, 8]
    with pytest.raises(KeyError):
        lc["flux2"]
    assert_array_equal(lc.flux2, [6, 7, 8])
    assert type(lc.flux2) is list

    # updating an existing attribute does not warn again
    with pytest.warns(UserWarning, match="new attribute name"):
        lc.foo = "bar"
    with warnings.catch_warnings(record=True) as record:
        warnings.simplefilter("always")
        lc.foo = "bar2"
    assert len(record) == 0


@pytest.mark.parametrize("new_col_val", [
    Quantity([2, 3, 4], electron_per_second),
    np.array([2, 3, 4]),
    [2, 3, 4],
])
def test_attr_access_columns_consistent_update(new_col_val):
    lc1 = LightCurve(time=Time([1, 2, 3], scale="tdb", format="jd"),
                     flux=Quantity([4, 5, 6], electron_per_second))
    lc1["flux"] = new_col_val
    lc2 = LightCurve(time=Time([1, 2, 3], scale="tdb", format="jd"),
                     flux=Quantity([4, 5, 6], electron_per_second))
    lc2.flux = new_col_val
    assert isinstance(lc1["flux"], type(lc2["flux"]))


def test_attr_access_meta():
    lc = LightCurve(time=Time([1, 2, 3], scale="tdb", format="jd"),
                    flux=Quantity([4, 5, 6], electron_per_second))
    lc.meta["SECTOR"] = 14
    assert lc.sector == 14

    lc.sector = 15
    assert lc.sector == 15
    assert lc.meta["SECTOR"] == 15

    # meta key matching an existing method does not shadow the method
    lc.meta["BIN"] = "Some value"
    assert callable(lc.bin)

    # new attribute creation targets the object, not meta
    with pytest.warns(UserWarning, match="new attribute name"):
        lc.foo = "bar_value"
    assert lc.meta.get("foo", None) is None
    assert lc.foo == "bar_value"

    # case-sensitive meta keys: exact case wins
    lc.meta["KEYCASE"] = "VALUE UPPER"
    lc.meta["keycase"] = "value lower"
    assert lc.meta["KEYCASE"] == "VALUE UPPER"
    assert lc.meta["keycase"] == "value lower"
    assert lc.keycase == "value lower"


@pytest.mark.parametrize("lc", [
    LightCurve(time=[1, 2, 3], flux=[4, 5, 6], meta={"SECTOR": 5}),
    LightCurve(time=[1, 2, 3], flux=[4, 5, 6]),
])
def test_meta_assignment(lc):
    """Reference #1046: meta assignment overwrites without warnings."""
    meta_new = {"TSTART": 123456789.0}
    with warnings.catch_warnings(record=True) as record:
        warnings.simplefilter("always")
        lc.meta = meta_new
    assert len(record) == 0
    assert lc.meta == meta_new


def test_attr_access_others():
    lc = LightCurve(time=Time([1, 2, 3], scale="tdb", format="jd"),
                    flux=Quantity([4, 5, 6], electron_per_second))
    # name in both columns and meta: column wins on read and write
    lc["foo"] = [5, 6, 7]
    lc.meta["FOO"] = "value"
    assert_array_equal(np.asarray(lc.foo), [5, 6, 7])
    lc.foo = Quantity([6, 7, 8], electron_per_second)
    assert_array_equal(lc.foo.value, [6, 7, 8])

    # name as attribute + column + meta: the attribute wins
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        lc.bar = "bar_attr_val"
    lc["bar"] = [7, 8, 9]
    lc.meta["BAR"] = "bar_meta_val"
    assert lc.bar == "bar_attr_val"
    lc.bar = "bar_attr_val_updated"
    assert lc.bar == "bar_attr_val_updated"


def test_flux_unit():
    unit_obj = Unit.parse("electron/second")
    time, flux = range(3), np.ones(3)
    lc = LightCurve(time=time, flux=flux, flux_unit=unit_obj)
    assert lc.flux.unit == unit_obj
    lc = LightCurve(time=time, flux=flux, flux_unit="electron/second")
    assert lc.flux.unit == unit_obj
    lc = LightCurve(time=time, flux=Quantity(flux, unit_obj))
    assert lc.flux.unit == unit_obj
    with pytest.warns(LightkurveDeprecationWarning):
        assert lc.flux_quantity.unit == unit_obj
        assert_array_equal(lc.flux_quantity.value, flux)
    with pytest.raises(ValueError) as err:
        LightCurve(time=time, flux=flux, flux_unit="blablabla")
    assert "not a valid unit" in err.value.args[0]


def test_astropy_time_initialization():
    time = [1, 2, 3]
    lc = LightCurve(time=Time(2.454e6 + np.array(time), format="jd"))
    assert lc.time.format == "jd"
    with pytest.warns(LightkurveDeprecationWarning):
        assert lc.astropy_time.format == "jd"
    lc = LightCurve(time=time, time_format="bkjd", time_scale="tdb")
    assert lc.time.format == "bkjd"
    assert lc.time.scale == "tdb"
    with pytest.warns(LightkurveDeprecationWarning):
        assert lc.astropy_time.format == "bkjd"


def test_normalize_unit():
    lc = LightCurve(flux=[1, 2, 3])
    for unit in ["percent", "ppt", "ppm"]:
        assert lc.normalize(unit=unit).flux.unit.name == unit


def test_fold_v2():
    """Reference fold() v2 API: phase types and river plots."""
    lc = LightCurve(time=np.linspace(0, 10, 100), flux=np.zeros(100) + 1)
    fld = lc.fold(period=1)
    fld2 = lc.fold(period=Quantity(1, "d"))
    assert_array_equal(np.asarray(fld.phase), np.asarray(fld2.phase))
    assert isinstance(fld.phase, TimeDelta)
    fld.plot_river()
    plt.close("all")

    fld = lc.fold(period=1, normalize_phase=True)
    assert isinstance(fld.phase, Quantity)
    fld.plot_river()
    plt.close("all")


def test_row_repr():
    """Reference regression #830: repr works for a single row."""
    lc = LightCurve({"time": [1, 2, 3], "flux": [1.0, 1.0, 1.0]})
    lc[0].__repr__()
    lc[0]._repr_html_()


def test_fill_gaps_with_cadenceno():
    """Reference regression #868."""
    lc = LightCurve({"time": [1, 2, 4, 5], "flux": [1, 1, 1, 1],
                     "cadenceno": [11, 12, 14, 15]})
    lc.fill_gaps()


def test_fill_gaps_after_normalization():
    """Reference regression #868 (normalized variant)."""
    lc = LightCurve({"time": [1, 2, 4, 5], "flux": [1, 1, 1, 1],
                     "flux_err": [0.1, 0.1, 0.1, 0.1]})
    lc = lc.normalize("ppm")
    lc2 = lc.fill_gaps()
    assert lc2.time.value[2] == 3.0
    assert np.isclose(lc2.flux.value[2], 1e6, rtol=1e-3)
    assert str(lc2.flux.unit) == "ppm"
    assert np.isclose(lc2.flux_err.value[2], 1e5, rtol=0.2)
    assert str(lc2.flux_err.unit) == "ppm"


@pytest.mark.parametrize("new_col_val", [
    Quantity([2, 3, 4], electron_per_second),
    np.array([2, 3, 4]),
    [2, 3, 4],
])
def test_columns_have_value_accessor(new_col_val):
    expected = new_col_val.value if hasattr(new_col_val, "value") \
        else new_col_val
    lc = LightCurve(time=[1, 2, 3])
    lc["col1"] = new_col_val
    assert_array_equal(np.asarray(lc["col1"].value
                                  if hasattr(lc["col1"], "value")
                                  else lc["col1"]), expected)


def test_issue_916():
    """Reference regression #916: flatten after folding."""
    rng = np.random.default_rng(0)
    LightCurve(flux=rng.standard_normal(100)).fold(period=2.5).flatten()


def test_bin_issue705():
    lc = TessLightCurve(time=np.arange(50), flux=np.ones(50),
                        quality=np.zeros(50, dtype=int))
    lc.bin(binsize=15)


def test_nbins():
    """Reference regression #1162."""
    lc = LightCurve(flux=[0, 0, 0])
    lc.bin(bins=2)


def test_plot_with_offset():
    """Reference regression #961: plot(offset=N) must not mutate flux."""
    lc = LightCurve(flux=[1.0])
    ax = lc.plot(offset=1)
    plt.close(ax.figure)
    assert lc.flux.value[0] == 1.0


def test_string_column_with_unit():
    """Reference regression #980."""
    LightCurve(data={"time": [1, 2, 3], "x": np.array(["a", "b", "c"])})


def test_river_plot_with_masked_flux():
    """Reference regression #1175."""
    rng = np.random.default_rng(1)
    flux = np.ma.MaskedArray(rng.normal(1, 0.1, 100),
                             mask=np.zeros(100, dtype=bool))
    lc = LightCurve(time=np.linspace(1, 100, 100), flux=flux,
                    flux_err=np.ma.MaskedArray(0.1 * np.ones(100)))
    lc.plot_river(period=10.0)
    plt.close("all")


def test_select_columns_as_lightcurve():
    """Reference #1194: selecting a subset of columns."""
    lc = LightCurve(time=np.arange(0, 12))
    lc["flux"] = np.ones(12) - 0.01
    lc["flux_err"] = np.ones(12) * 0.0001
    lc["col1"] = np.zeros(12, dtype="i4")
    lc["col2"] = np.zeros(12, dtype="i4")

    sub = lc["time", "flux", "col2"]
    assert set(sub.colnames) == {"time", "flux", "flux_err", "col2"}
    # unrequested flux_err comes back NaN-filled, not copied
    assert np.isnan(sub.flux_err.value).all()
    assert isinstance(sub, type(lc))

    lc_b = lc.bin(time_bin_size=3.0)
    sub_b = lc_b["time", "flux", "flux_err", "col1"]
    assert set(sub_b.colnames) == {"time", "flux", "flux_err", "col1"}
    assert isinstance(sub_b, type(lc_b))

    lc_f = lc.fold(period=3)
    sub_f = lc_f["time", "flux", "flux_err"]
    assert set(sub_f.colnames) >= {"time", "flux", "flux_err"}
    assert isinstance(sub_f, type(lc_f))


def test_show_properties(capfd):
    lc = KeplerLightCurve(time=[1, 2, 3], flux=[1.0, 1.0, 1.0],
                          meta={"MISSION": "Kepler", "QUARTER": 8,
                                "CHANNEL": 41, "OBJECT": "Tabby"})
    lc.show_properties()
    out, _ = capfd.readouterr()
    assert "quarter" in out
    assert "Kepler" in out


def test_pickle_basic():
    lc = KeplerLightCurve(time=[1, 2, 3], flux=[1.0, 2.0, 3.0],
                          flux_err=[0.1, 0.1, 0.1], quality=[0, 0, 0],
                          meta={"QUARTER": 8})
    lc2 = pickle.loads(pickle.dumps(lc))
    assert (lc2 == lc).all()
    assert lc2.meta == lc.meta
