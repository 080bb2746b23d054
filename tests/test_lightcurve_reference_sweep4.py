"""Mirrors of reference tests/test_lightcurve.py behaviors (batch 4).

Covers: deep-copy mutation independence across all columns,
custom interact()-produced light-curve files read through the
mission classes (real reference files), and TessLightCurve reading
pinned against the raw FITS table.
"""
import os

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from lightkurve_tpu import (KeplerLightCurve, LightCurve, TessLightCurve)
from lightkurve_tpu.io.fits import open_fits

TESTDATA = "/root/reference/tests/data"
FN_TESS_CUSTOM = os.path.join(TESTDATA,
                              "test_TESS_interact_generated_custom-lc.fits")
FN_K2_CUSTOM = os.path.join(TESTDATA,
                            "test_K2_interact_generated_custom-lc.fits")
FN_PIMEN = os.path.join(TESTDATA, "test-lc-tess-pimen-100-cadences.fits")


def test_lightcurve_copy():
    """copy() must deep-copy every column."""
    time = np.array([1, 2, 3, 4], dtype=float)
    flux = np.array([1, 2, 3, 4], dtype=float)
    error = np.array([0.1, 0.2, 0.3, 0.4])
    lc = LightCurve(time=time, flux=flux, flux_err=error)

    nlc = lc.copy()
    assert_array_equal(lc.time.value, nlc.time.value)
    assert_array_equal(lc.flux.value, nlc.flux.value)
    assert_array_equal(lc.flux_err.value, nlc.flux_err.value)

    # mutating the copy must not touch the original
    nlc.time.value[1] = 5
    np.asarray(nlc.flux)[1] = 6
    np.asarray(nlc.flux_err)[1] = 7
    assert lc.time.value[1] == 2
    assert lc.flux.value[1] == 2
    assert lc.flux_err.value[1] == 0.2

    # mission subclasses deep-copy their extra columns too
    lc = KeplerLightCurve(time=[1, 2, 3], flux=[1, 0.5, 1],
                          centroid_col=[4.0, 5, 6],
                          centroid_row=[7.0, 8, 9],
                          cadenceno=[10, 11, 12], quality=[10, 20, 30])
    nlc = lc.copy()
    for col in ("centroid_col", "centroid_row", "cadenceno", "quality"):
        assert_array_equal(np.asarray(lc[col]), np.asarray(nlc[col]))
    np.asarray(nlc["centroid_col"])[1] = 99
    np.asarray(nlc["cadenceno"])[1] = 99
    np.asarray(nlc["quality"])[1] = 99
    assert np.asarray(lc["centroid_col"])[1] == 5
    assert np.asarray(lc["cadenceno"])[1] == 11
    assert np.asarray(lc["quality"])[1] == 20


@pytest.mark.skipif(not os.path.exists(FN_TESS_CUSTOM),
                    reason="reference test data not available")
@pytest.mark.parametrize("path, mission", [
    (FN_TESS_CUSTOM, "TESS"), (FN_K2_CUSTOM, "K2"),
])
def test_custom_lightcurve_file(path, mission):
    """Custom interact()-produced files read through the mission classes."""
    if mission == "K2":
        lc = KeplerLightCurve.read(path)
    else:
        lc = TessLightCurve.read(path)
    assert np.asarray(lc.cadenceno)[0] >= 0
    assert lc.dec == lc.dec
    assert lc.time.value[-1] > lc.time.value[0]
    assert len(lc.flux.value) > 0
    assert lc.mission.lower() == mission.lower()

    hdu = open_fits(path)
    assert lc.label == hdu[0].header["OBJECT"]
    assert_array_equal(lc.time.value, np.asarray(hdu[1].data["TIME"]))
    assert_array_equal(lc.flux.value, np.asarray(hdu[1].data["FLUX"]))
    # TESS uses QUALITY, Kepler/K2 use SAP_QUALITY
    if mission == "TESS":
        assert "QUALITY" in hdu[1].data.names
        assert_array_equal(np.asarray(lc.quality),
                           np.asarray(hdu[1].data["QUALITY"]))
    else:
        assert "SAP_QUALITY" in hdu[1].data.names
        assert_array_equal(np.asarray(lc.quality),
                           np.asarray(hdu[1].data["SAP_QUALITY"]))


@pytest.mark.skipif(not os.path.exists(FN_PIMEN),
                    reason="reference test data not available")
def test_tess_lightcurve_file_parity():
    """TessLightCurve reading pinned against the raw FITS table
    (offline variant of reference test_TessLightCurveFile)."""
    lc = TessLightCurve.read(FN_PIMEN, quality_bitmask="default",
                             flux_column="sap_flux")
    hdu = open_fits(FN_PIMEN)
    assert lc.mission == "TESS"
    assert lc.label == hdu[0].header["OBJECT"]
    assert lc.time.format == "btjd"
    assert lc.time.scale == "tdb"
    assert str(lc.flux.unit) in ("electron / s", "electron/s")
    assert lc.sector == hdu[0].header["SECTOR"]
    assert lc.camera == hdu[0].header["CAMERA"]
    assert lc.ccd == hdu[0].header["CCD"]
    assert lc.ra == hdu[0].header["RA_OBJ"]
    assert lc.dec == hdu[0].header["DEC_OBJ"]
    assert lc.meta["FLUX_ORIGIN"] == "sap_flux"
    # no NaN times survive (reference regression #236)
    assert np.isnan(lc.time.value).sum() == 0


def test_river():
    """Mirror of reference test_river: all plot_river variants."""
    import matplotlib.pyplot as plt
    from lightkurve_tpu.utils import LightkurveWarning
    rng = np.random.default_rng(0)
    lc = LightCurve(time=np.arange(100), flux=rng.normal(1, 0.01, 100),
                    flux_err=np.abs(rng.normal(0, 0.01, 100)))
    lc.plot_river(10, 1)
    plt.close("all")
    folded_lc = lc.fold(10, 1)
    folded_lc.plot_river()
    folded_lc.plot_river(minimum_phase=-0.1, maximum_phase=0.2)
    folded_lc.plot_river(method="median", bin_points=5)
    folded_lc.plot_river(method="sigma", bin_points=5)
    plt.close("all")
    with pytest.warns(LightkurveWarning, match="`bin_points` is too high"):
        folded_lc.plot_river(method="median", bin_points=6)
    plt.close("all")


def test_cdpp():
    """Mirror of reference test_cdpp: flat → ~0; 100 ppm noise → ~100."""
    from numpy.testing import assert_almost_equal
    lc = LightCurve(time=np.arange(200), flux=np.ones(200))
    assert_almost_equal(float(lc.estimate_cdpp().value), 0)
    rng = np.random.default_rng(1)
    lc = LightCurve(time=np.arange(10000),
                    flux=rng.normal(loc=1, scale=100e-6, size=10000))
    assert_almost_equal(float(lc.estimate_cdpp(
        transit_duration=1).value), 100, decimal=-0.5)
    with pytest.raises(ValueError):
        lc.estimate_cdpp(transit_duration=6.5)


def test_constructor_kwarg_beats_data_meta():
    """An explicit targetid=/label= keyword wins over values carried in
    ``data.meta`` (review finding: the kwarg was silently clobbered)."""
    lc = LightCurve(time=[1, 2], flux=[1, 1], targetid=111, label="a")
    lc2 = LightCurve(data=lc, targetid=999, label="b")
    assert lc2.targetid == 999
    assert lc2.label == "b"
    # without the keyword, data.meta still flows through
    lc3 = LightCurve(data=lc)
    assert lc3.targetid == 111


def test_readonly_property_raises_attributeerror():
    """Assigning to a getter-only property raises AttributeError (not
    TypeError), preserving hasattr/try-AttributeError conventions."""
    lc = LightCurve(time=[1, 2, 3], flux=[1, 2, 3])
    fold = lc.fold(period=2)
    with pytest.raises(AttributeError, match="read-only"):
        fold.phase = [0, 0, 0]
    with pytest.raises(AttributeError, match="read-only"):
        lc.astropy_time = 5


def test_plot_river_tiny_period_no_crash():
    """plot_river with a period below the cadence warns instead of
    dividing by zero (review finding)."""
    import matplotlib.pyplot as plt
    from lightkurve_tpu.utils import LightkurveWarning
    lc = LightCurve(time=np.arange(50, dtype=float),
                    flux=np.ones(50))
    with pytest.warns(LightkurveWarning, match="too high"):
        lc.plot_river(period=0.5, bin_points=10)
    plt.close("all")


def test_read_format_mapping():
    """.read(format=...) maps every registry product; unknown formats
    raise ValueError instead of being silently auto-detected."""
    from lightkurve_tpu.lightcurve import _format_to_filetype
    assert _format_to_filetype("eleanor") == "ELEANOR"
    assert _format_to_filetype("qlp") == "QLP"
    assert _format_to_filetype(None) is None
    with pytest.raises(ValueError, match="unknown format"):
        LightCurve.read("/nonexistent.fits", format="not-a-format")


def test_stitch_mixed_numeric_dtypes():
    """int and float columns of the same name stitch losslessly (they
    concatenate to float), with no incompatibility warning."""
    import warnings as _w
    from lightkurve_tpu import LightCurveCollection
    lc1 = LightCurve(time=[1, 2], flux=[1.0, 1.0],
                     cadenceno=np.array([1, 2], dtype=np.int32))
    lc2 = LightCurve(time=[3, 4], flux=[1.0, 1.0],
                     cadenceno=np.array([3.0, 4.0]))
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        stitched = LightCurveCollection([lc1, lc2]).stitch(
            corrector_func=None)
    assert not any("incompatible" in str(r.message) for r in rec)
    assert "cadenceno" in stitched.columns
    np.testing.assert_array_equal(np.asarray(stitched["cadenceno"]),
                                  [1, 2, 3, 4])


def test_bin_edges_last_fencepost_inclusive():
    """A cadence exactly at the final bins= fencepost lands in the last
    bin (np.histogram closure; review finding)."""
    lc = LightCurve(time=[0.0, 5.0, 10.0, 15.0, 20.0],
                    flux=[1.0, 2.0, 3.0, 4.0, 10.0])
    binned = lc.bin(bins=[0.0, 10.0, 20.0])
    assert len(binned) == 2
    # last bin holds t=10,15,20 → mean (3+4+10)/3
    np.testing.assert_allclose(binned.flux.value[1], (3 + 4 + 10) / 3)


def test_ylim_with_nans():
    """Mirror of reference test_interact.py:test_ylim_with_nans (#679):
    y limits must not be NaN."""
    from lightkurve_tpu.interact import get_lightcurve_y_limits
    ymin, ymax = get_lightcurve_y_limits({"flux": [-1, np.nan, 1]})
    assert ymin == -1.176
    assert ymax == 1.176


def test_read_memory_usage(tmp_path):
    """Mirror of reference io/test_read.py:test_read_memory_usage
    (#1388): repeated read() must not leak — post-warmup traced memory
    stays flat across iterations."""
    import gc
    import tracemalloc
    from tests.io.test_fits import make_tess_lc_file
    from lightkurve_tpu.io import read
    path = str(tmp_path / "leakcheck_lc.fits")
    make_tess_lc_file(path, n=2000)

    def do_read():
        return len(read(path))

    tracemalloc.start()
    try:
        for _ in range(3):          # warmup: caches, interned headers
            do_read()
        gc.collect()
        post_warmup, _ = tracemalloc.get_traced_memory()
        for _ in range(5):
            do_read()
        gc.collect()
        final, _ = tracemalloc.get_traced_memory()
    finally:
        tracemalloc.stop()
    # allow slack for allocator noise; a real leak grows by the size of
    # the table (~hundreds of KB) per iteration
    assert final - post_warmup < 200_000, \
        f"memory grew {final - post_warmup} bytes over 5 reads"


def test_interact_custom_aperture_mask():
    """Mirror of reference test_interact.py:test_custom_aperture_mask:
    boolean-array, None, and 'threshold' apertures all render."""
    import matplotlib.pyplot as plt
    from tests.synthetic import make_synthetic_tpf
    tpf = make_synthetic_tpf(n_cadences=20)
    for mask in [np.asarray(tpf.flux[0]) == np.asarray(tpf.flux[0]),
                 None, "threshold"]:
        fig = tpf.interact(aperture_mask=mask)
        plt.close(fig)


def test_interact_custom_exported_filename(tmp_path):
    """Mirror of reference test_interact.py:test_custom_exported_filename:
    non-.fits suffixes are coerced, sliced TPFs work, and non-str names
    are accepted."""
    import matplotlib.pyplot as plt
    from tests.synthetic import make_synthetic_tpf
    tpf = make_synthetic_tpf(n_cadences=20)
    for name in ["demo.fits", "string_only", "demo2.FITS", "demo3.png"]:
        fig = tpf[0:2].interact(exported_filename=str(tmp_path / name))
        plt.close(fig)
    import os
    assert os.path.exists(tmp_path / "demo.fits")
    assert os.path.exists(tmp_path / "string_only.fits")
    assert os.path.exists(tmp_path / "demo3.png.fits")
    fig = tpf.interact(exported_filename=str(tmp_path / "210690913"))
    plt.close(fig)
    mask = np.asarray(tpf.time.value) == np.asarray(tpf.time.value)
    fig = tpf[mask].interact()
    plt.close(fig)


def test_interact_transform_and_ylim_funcs():
    """Mirror of reference test_interact.py:test_transform_and_ylim_funcs."""
    import matplotlib.pyplot as plt
    from tests.synthetic import make_synthetic_tpf
    tpf = make_synthetic_tpf(n_cadences=30)
    for kwargs in [
        {"transform_func": lambda lc: lc.normalize()},
        {"transform_func": lambda lc: lc.flatten().normalize()},
        {"transform_func": lambda lc: lc, "ylim_func": lambda lc: (0, 2)},
        {"ylim_func": lambda lc: (0, lc.flux.max())},
    ]:
        fig = tpf.interact(**kwargs)
        plt.close(fig)
