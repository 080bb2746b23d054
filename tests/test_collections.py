"""Mirrors of reference tests/test_collections.py.

Covers init/append/stitch/getitem (int, bool mask, fancy int array,
slices)/setitem, TPF collections, sector/quarter/campaign accessors,
and the unmergeable-column warning (#954/#1015).  TPF members are
synthetic cubes instead of the reference's bundled FITS files.
"""
import warnings

import matplotlib.pyplot as plt
import numpy as np
import pytest
from numpy.testing import assert_array_equal

from lightkurve_tpu import (KeplerLightCurve, LightCurve,
                            LightCurveCollection, TargetPixelFileCollection,
                            TessLightCurve)
from lightkurve_tpu.units import Quantity
from lightkurve_tpu.utils import LightkurveWarning

from synthetic import make_synthetic_tpf


def _lc(t0, targetid=None):
    return LightCurve(time=np.arange(t0, t0 + 5),
                      flux=np.arange(t0, t0 + 5, dtype=float),
                      flux_err=np.arange(t0, t0 + 5, dtype=float),
                      targetid=targetid)


def test_collection_init():
    lc = _lc(1)
    lc2 = _lc(10)
    lcc = LightCurveCollection([lc, lc2])
    assert len(lcc) == 2
    assert lcc.data == [lc, lc2]
    str(lcc)
    lcc.plot()
    plt.close("all")


def test_collection_append():
    lcc = LightCurveCollection([_lc(1, targetid=500)])
    lcc.append(_lc(10, targetid=100))
    assert len(lcc) == 2


def test_collection_stitch():
    lc = LightCurve(time=np.arange(1, 5), flux=np.ones(4))
    lc2 = LightCurve(time=np.arange(5, 16), flux=np.ones(11))
    lcc = LightCurveCollection([lc, lc2])
    stitched = lcc.stitch()
    assert len(stitched.flux) == 15
    stitched2 = lcc.stitch(corrector_func=lambda x: x * 2)
    assert_array_equal(stitched.flux.value * 2, stitched2.flux.value)


def test_collection_stitch_with_masked_values():
    """Reference issue #1178: stitching with masked flux must not crash."""
    lc = LightCurve(time=np.arange(1, 5), flux=np.ones(4))
    lc2 = LightCurve(
        time=np.arange(5, 9),
        flux=np.ma.MaskedArray([11.0, 11.0, np.nan, 11.0],
                               mask=[False, False, True, False]))
    stitched = LightCurveCollection([lc, lc2]).stitch()
    assert len(stitched.flux) == 8
    lc3 = LightCurve(time=np.arange(9, 13), flux=np.ones(4))
    stitched = LightCurveCollection([lc2, lc3]).stitch()
    assert len(stitched.flux) == 8


def test_collection_getitem():
    lc = _lc(1, targetid=50000)
    lc2 = _lc(10, targetid=120334)
    lcc = LightCurveCollection([lc])
    lcc.append(lc2)
    assert (lcc[0] == lc).all()
    assert (lcc[1] == lc2).all()
    with pytest.raises(IndexError):
        lcc[50]


def test_collection_getitem_by_boolean_array():
    lc0, lc1, lc2 = _lc(1, 50000), _lc(10, 120334), _lc(15, 23456)
    lcc = LightCurveCollection([lc0, lc1, lc2])

    lcc_f = lcc[[True, False, True]]
    assert lcc_f.data == [lc0, lc2]
    assert type(lcc_f) is LightCurveCollection

    assert lcc[[False, True, False]].data == [lc1]
    assert lcc[[False, False, False]].data == []
    assert lcc[(True, False, True)].data == [lc0, lc2]
    assert lcc[np.array([True, False, True])].data == [lc0, lc2]

    with pytest.raises(IndexError):
        lcc[[True, False]]
    with pytest.raises(IndexError):
        lcc[[True, False, True, True]]


def test_collection_getitem_by_other_array():
    lc0, lc1, lc2 = _lc(1, 50000), _lc(10, 120334), _lc(15, 23456)
    lcc = LightCurveCollection([lc0, lc1, lc2])

    assert lcc[[2, 0]].data == [lc2, lc0]
    assert lcc[np.array([2, 0])].data == [lc2, lc0]
    assert lcc[np.array([np.int64(2), np.uint8(0)])].data == [lc2, lc0]
    # bool/int mixed array-like follows ndarray: True/False -> 1/0
    assert lcc[[True, False, 2]].data == [lc1, lc0, lc2]
    with pytest.raises(IndexError):
        lcc[[2, 99]]
    with pytest.raises(IndexError):
        lcc[["abc", "def"]]
    with pytest.raises(IndexError):
        lcc[[True, "def"]]


def test_collection_getitem_by_slices():
    lc0, lc1, lc2 = _lc(1, 50000), _lc(10, 120334), _lc(15, 23456)
    lcc = LightCurveCollection([lc0, lc1, lc2])
    assert lcc[:2].data == [lc0, lc1]
    assert lcc[1:999].data == [lc1, lc2]


def test_collection_setitem():
    lcc = LightCurveCollection([_lc(1, 50000)])
    lc2 = _lc(10, 120334)
    lcc.append(lc2)
    lc3 = LightCurve(time=[1], targetid=55)
    lcc[1] = lc3
    assert lcc[1].time.value == lc3.time.value
    lcc.append(lc2)
    assert (lcc[2].time.value == lc2.time.value).all()
    with pytest.raises(IndexError):
        lcc[51] = 10


def test_tpfcollection():
    tpf = make_synthetic_tpf(n_cadences=10, shape=(5, 5), mission="Kepler")
    tpf2 = make_synthetic_tpf(n_cadences=12, shape=(5, 5), mission="Kepler")
    tpfc = TargetPixelFileCollection([tpf, tpf2])
    assert len(tpfc) == 2
    assert tpfc.data == [tpf, tpf2]
    tpfc.append(tpf2)
    assert len(tpfc) == 3
    assert tpfc[0] is tpf
    assert tpfc[1] is tpf2
    assert tpfc[2] is tpf2
    with pytest.raises(IndexError):
        tpfc[51]
    tpfc_f = tpfc[[False, True, True]]
    assert tpfc_f.data == [tpf2, tpf2]
    assert type(tpfc_f) is TargetPixelFileCollection
    tpf3 = make_synthetic_tpf(n_cadences=10, shape=(5, 5), mission="Kepler")
    tpfc[1] = tpf3
    assert tpfc[1] is tpf3
    tpfc.append(tpf2)
    assert tpfc[2] is tpf2
    str(tpfc)  # regression test for reference #564


def test_tpfcollection_plot():
    tpf = make_synthetic_tpf(n_cadences=10, shape=(5, 5))
    tpf2 = make_synthetic_tpf(n_cadences=10, shape=(5, 5))
    coll = TargetPixelFileCollection([tpf, tpf2, tpf2])
    coll.plot()
    coll = TargetPixelFileCollection([tpf])
    coll.plot()
    plt.close("all")


def test_accessor_tess_sector():
    lc0 = TessLightCurve(time=np.arange(1, 5), flux=np.arange(1, 5),
                         flux_err=np.arange(1, 5), targetid=50000)
    lc0.meta["SECTOR"] = 14
    lc1 = TessLightCurve(time=np.arange(10, 15), flux=np.arange(10, 15),
                         flux_err=np.arange(10, 15), targetid=120334)
    lc1.meta["SECTOR"] = 26
    lcc = LightCurveCollection([lc0, lc1])
    assert (lcc.sector == [14, 26]).all()
    assert ((lcc.sector == 26) == [False, True]).all()
    assert ((lcc.sector < 20) == [True, False]).all()

    # members without a sector yield nan, and comparisons still work
    lc2 = _lc(15, 23456)
    lcc.append(lc2)
    assert (lcc.sector[:-1] == [14, 26]).all()
    assert np.isnan(lcc.sector[-1])
    assert ((lcc.sector == 26) == [False, True, False]).all()
    assert ((lcc.sector < 20) == [True, False, False]).all()

    # TPFs: sector property returns None when the header lacks SECTOR
    tpf = make_synthetic_tpf(n_cadences=10, shape=(5, 5), mission="TESS")
    tpf.meta["SECTOR"] = 23
    tpf2 = make_synthetic_tpf(n_cadences=10, shape=(5, 5), mission="TESS")
    tpf2.meta.pop("SECTOR", None)
    tpf3 = make_synthetic_tpf(n_cadences=10, shape=(5, 5), mission="TESS")
    tpf3.meta["SECTOR"] = 1
    tpfc = TargetPixelFileCollection([tpf, tpf2, tpf3])
    assert (tpfc.sector == np.array([23, None, 1], dtype=object)).all()


def test_accessor_kepler_quarter():
    lc0 = KeplerLightCurve(time=np.arange(1, 5), flux=np.arange(1, 5),
                           flux_err=np.arange(1, 5), targetid=50000)
    lc0.meta["QUARTER"] = 2
    lc1 = KeplerLightCurve(time=np.arange(10, 15), flux=np.arange(10, 15),
                           flux_err=np.arange(10, 15), targetid=120334)
    lc1.meta["QUARTER"] = 1
    lcc = LightCurveCollection([lc0, lc1])
    assert (lcc.quarter == [2, 1]).all()

    tpf0 = make_synthetic_tpf(n_cadences=10, shape=(5, 5), mission="Kepler")
    tpf0.meta["QUARTER"] = 2
    tpf1 = make_synthetic_tpf(n_cadences=10, shape=(5, 5), mission="Kepler")
    tpf1.meta["QUARTER"] = 1
    tpfc = TargetPixelFileCollection([tpf0, tpf1])
    assert (tpfc.quarter == [2, 1]).all()


def test_accessor_k2_campaign():
    lc0 = KeplerLightCurve(time=np.arange(1, 5), flux=np.arange(1, 5),
                           flux_err=np.arange(1, 5), targetid=50000)
    lc0.meta["CAMPAIGN"] = 2
    lc1 = KeplerLightCurve(time=np.arange(10, 15), flux=np.arange(10, 15),
                           flux_err=np.arange(10, 15), targetid=120334)
    lc1.meta["CAMPAIGN"] = 1
    lcc = LightCurveCollection([lc0, lc1])
    assert (lcc.campaign == [2, 1]).all()

    tpf0 = make_synthetic_tpf(n_cadences=10, shape=(5, 5), mission="Kepler")
    tpf0.meta["CAMPAIGN"] = 2
    tpf1 = make_synthetic_tpf(n_cadences=10, shape=(5, 5), mission="Kepler")
    tpf1.meta["CAMPAIGN"] = 1
    tpfc = TargetPixelFileCollection([tpf0, tpf1])
    assert (tpfc.campaign == [2, 1]).all()


def test_unmergeable_columns():
    """Reference regression #954/#1015: incompatible same-name columns are
    dropped with a warning rather than crashing the stitch."""
    from lightkurve_tpu.units import Unit
    lc1 = LightCurve(data={"time": [1, 2, 3], "x": np.array([1, 2, 3])})
    lc2 = LightCurve(data={"time": [1, 2, 3],
                           "x": Quantity([1.0, 2.0, 3.0],
                                         Unit.parse("electron/s"))})
    with pytest.warns(LightkurveWarning,
                      match="column types are incompatible"):
        LightCurveCollection([lc1, lc2]).stitch()
    with pytest.warns(LightkurveWarning,
                      match="column types are incompatible"):
        lc1.append(lc2)


def test_stitch_repr():
    """Reference regression #884: repr of a stitched collection with int
    auxiliary columns must not crash."""
    lc = LightCurve(time=np.arange(5), flux=np.ones(5),
                    cadenceno=np.arange(70445, 70450))
    repr(LightCurveCollection((lc, lc)).stitch())


def test_combine_kepler_tess():
    """Mirror of reference test_lightcurve.py:test_combine_kepler_tess:
    a TESS light curve can be appended to / stitched with a Kepler one
    despite the different time formats and mission columns."""
    from lightkurve_tpu import KeplerLightCurve, TessLightCurve
    lc_kplr = KeplerLightCurve(
        time=np.arange(100.0, 110.0, 0.5), flux=np.ones(20),
        quality=np.zeros(20, int))
    lc_kplr.meta["MISSION"] = "Kepler"
    lc_tess = TessLightCurve(
        time=np.arange(1500.0, 1510.0, 0.5), flux=np.ones(20),
        quality=np.zeros(20, int))
    lc_tess.meta["MISSION"] = "TESS"
    lc = lc_kplr.append(lc_tess)
    assert len(lc) == len(lc_kplr) + len(lc_tess)
    coll = LightCurveCollection((lc_kplr, lc_tess))
    lc = coll.stitch()
    assert len(lc) == len(lc_kplr) + len(lc_tess)
