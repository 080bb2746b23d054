"""Mirrors of reference tests/test_targetpixelfile.py driven by the
REAL data files shipped with the reference checkout — including the
exact quality-bitmask cadence counts and the Tabby's-star WCS
coordinates cross-checked against Simbad in the reference suite."""
import os
import warnings

import matplotlib.pyplot as plt
import numpy as np
import pytest
from numpy.testing import assert_array_equal

from lightkurve_tpu import (KeplerTargetPixelFile, TessTargetPixelFile)
from lightkurve_tpu.utils import LightkurveWarning

TESTDATA = "/root/reference/tests/data"
FN_ZEROS = os.path.join(TESTDATA, "test-tpf-all-zeros.fits")
FN_ONE_CENTER = os.path.join(TESTDATA, "test-tpf-non-zero-center.fits")
FN_TESS = os.path.join(TESTDATA,
                       "tess25155310-s01-first-cadences.fits.gz")
FN_TABBY = os.path.join(TESTDATA, "test-tpf-kplr-tabby-100-cadences.fits")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TESTDATA),
    reason="reference test data not available")


def _tpfs_zeros():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", LightkurveWarning)
        return [KeplerTargetPixelFile(FN_ZEROS),
                TessTargetPixelFile(FN_ZEROS)]


def test_tpf_shapes():
    for tpf in _tpfs_zeros():
        assert tpf.quality_mask.shape == np.asarray(
            tpf.hdu[1].data["TIME"]).shape
        assert tpf.flux.value.shape == tpf.flux_err.value.shape


def test_tpf_math():
    """Can you add, subtract, multiply and divide TPFs?"""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", LightkurveWarning)
        tpfs = _tpfs_zeros()
    for tpf in tpfs:
        for other in [1, np.ones(tpf.flux.value.shape[1:]),
                      np.ones(tpf.shape)]:
            tpf + other
            tpf - other
            tpf * other
            tpf / other
    tpf = tpfs[0]
    for other in [np.asarray([1, 2]), np.arange(len(tpf.time.value) - 1),
                  np.ones([100, 1]), np.ones([1, 2, 3])]:
        with pytest.raises(ValueError):
            tpf + other
    finite = np.isfinite(tpf.flux.value)
    assert np.all(((tpf.flux.value + 2) == (tpf + 2).flux.value)[finite])
    assert np.all(((tpf.flux.value - 2) == (tpf - 2).flux.value)[finite])
    assert np.all(((tpf.flux.value * 2) == (tpf * 2).flux.value)[finite])
    assert np.all(((tpf.flux.value / 2) == (tpf / 2).flux.value)[finite])
    assert np.all(
        ((tpf.flux_err.value * 2) == (tpf * 2).flux_err.value)[finite])


def test_tpf_plot():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", LightkurveWarning)
        tpfs = [KeplerTargetPixelFile(FN_ONE_CENTER),
                TessTargetPixelFile(FN_ONE_CENTER)]
    for tpf in tpfs:
        tpf.plot()
        tpf.plot(aperture_mask=tpf.pipeline_mask)
        tpf.plot(aperture_mask="all")
        tpf.plot(frame=1)
    plt.close("all")


def test_tpf_zeros():
    """Does the LightCurve of a zero-flux TPF make sense?"""
    tpf = KeplerTargetPixelFile(FN_ZEROS, quality_bitmask="hard")
    lc = tpf.to_lightcurve(aperture_mask="all")
    assert len(lc.time.value) == len(lc.flux.value)
    assert np.all(lc.time.value == tpf.time.value)
    # all-zero pixels produce NaN flux (reference #874 convention)
    assert np.all(np.isnan(lc.flux.value))
    # the default QUALITY bitmask removes all NaN times
    assert not np.any(np.isnan(tpf.time.value))


@pytest.mark.parametrize("centroid_method", ["moments", "quadratic"])
def test_tpf_ones(centroid_method):
    """Reference regression #1103: pixel coords refer to pixel centers."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", LightkurveWarning)
        tpfs = [KeplerTargetPixelFile(FN_ONE_CENTER),
                TessTargetPixelFile(FN_ONE_CENTER)]
    for tpf in tpfs:
        lc = tpf.to_lightcurve(aperture_mask="all",
                               centroid_method=centroid_method)
        assert np.all(lc.flux.value == 1)
        assert np.allclose(lc.centroid_row.value, tpf.row + 1)
        assert np.allclose(lc.centroid_col.value, tpf.column + 1)


@pytest.mark.parametrize("quality_bitmask,answer", [
    (None, 1290), ("none", 1290), ("default", 1233), ("hard", 1101),
    ("hardest", 1101), (1, 1290), (100, 1278), (2096639, 1101),
])
def test_bitmasking(quality_bitmask, answer):
    """Exact cadence counts per bitmask on the real file."""
    tpf = KeplerTargetPixelFile(FN_ONE_CENTER,
                                quality_bitmask=quality_bitmask)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", LightkurveWarning)
        lc = tpf.to_lightcurve()
    assert len(lc.flux.value) == answer


def test_wcs():
    for tpf in [KeplerTargetPixelFile(FN_ONE_CENTER),
                TessTargetPixelFile(FN_TESS)]:
        w = tpf.wcs
        ra, dec = tpf.get_coordinates()
        assert np.asarray(ra).shape == tpf.shape
        assert np.asarray(dec).shape == tpf.shape
        assert "WCS" in type(w).__name__


@pytest.mark.parametrize("method", ["moments", "quadratic"])
def test_wcs_tabby(method):
    """Centroid coordinates of Tabby's star must match Simbad."""
    tpf = KeplerTargetPixelFile(FN_TABBY)
    tpf.wcs
    ra, dec = tpf.get_coordinates(0)
    col, row = tpf.estimate_centroids(method=method)
    col = col.value - tpf.column
    row = row.value - tpf.row
    y, x = int(np.round(col[0])), int(np.round(row[1]))
    assert np.isclose(np.asarray(ra)[x, y], 301.5643971, rtol=1e-4)
    assert np.isclose(np.asarray(dec)[x, y], 44.4568869, rtol=1e-4)


def test_properties():
    """Short-hand properties pass the raw header/table values through."""
    tpf = KeplerTargetPixelFile(FN_ZEROS)
    assert tpf.channel == tpf.hdu[0].header["CHANNEL"]
    assert tpf.module == tpf.hdu[0].header["MODULE"]
    assert tpf.output == tpf.hdu[0].header["OUTPUT"]
    assert tpf.ra == tpf.hdu[0].header["RA_OBJ"]
    assert tpf.dec == tpf.hdu[0].header["DEC_OBJ"]
    m = tpf.quality_mask
    assert_array_equal(tpf.flux.value,
                       np.asarray(tpf.hdu[1].data["FLUX"])[m])
    assert_array_equal(tpf.flux_err.value,
                       np.asarray(tpf.hdu[1].data["FLUX_ERR"])[m])
    assert_array_equal(tpf.flux_bkg.value,
                       np.asarray(tpf.hdu[1].data["FLUX_BKG"])[m])
    assert_array_equal(tpf.quality,
                       np.asarray(tpf.hdu[1].data["QUALITY"])[m])
    assert tpf.campaign == tpf.hdu[0].header["CAMPAIGN"]
    assert tpf.quarter is None


def test_repr():
    for tpf in [KeplerTargetPixelFile(FN_ZEROS),
                TessTargetPixelFile(FN_TESS)]:
        str(tpf)
        repr(tpf)


def test_to_lightcurve():
    for tpf in [KeplerTargetPixelFile(FN_ZEROS),
                TessTargetPixelFile(FN_TESS)]:
        tpf.to_lightcurve()
        tpf.to_lightcurve(aperture_mask="all")
        lc = tpf.to_lightcurve(aperture_mask="threshold")
        assert lc.time.scale == "tdb"
        assert lc.label == tpf.hdu[0].header["OBJECT"]
        if np.any(tpf.pipeline_mask):
            tpf.to_lightcurve(aperture_mask="pipeline")
        else:
            with pytest.raises(ValueError):
                tpf.to_lightcurve(aperture_mask="pipeline")


def test_bkg_lightcurve():
    for tpf in [KeplerTargetPixelFile(FN_ZEROS),
                TessTargetPixelFile(FN_TESS)]:
        lc = tpf.get_bkg_lightcurve()
        lc = tpf.get_bkg_lightcurve(aperture_mask="all")
        assert lc.time.scale == "tdb"
        assert lc.flux.value.shape == lc.flux_err.value.shape
        assert len(lc.time.value) == len(lc.flux.value)


def test_aperture_photometry():
    for tpf in [KeplerTargetPixelFile(FN_ZEROS),
                TessTargetPixelFile(FN_TESS)]:
        tpf.extract_aperture_photometry()
        for mask in [None, "all", "default", "threshold", "background"]:
            tpf.extract_aperture_photometry(aperture_mask=mask)
        if np.any(tpf.pipeline_mask):
            tpf.extract_aperture_photometry(aperture_mask="pipeline")
        else:
            with pytest.raises(ValueError):
                tpf.extract_aperture_photometry(aperture_mask="pipeline")


def test_tpf_to_fits(tmp_path):
    """Can we write a real TPF back to a FITS file?"""
    for tpf in [KeplerTargetPixelFile(FN_ZEROS),
                TessTargetPixelFile(FN_TESS)]:
        out = str(tmp_path / f"roundtrip-{type(tpf).__name__}.fits")
        tpf.to_fits(output_fn=out)
        assert os.path.exists(out)


def test_properties2(capfd):
    """show_properties prints a table."""
    tpf = KeplerTargetPixelFile(FN_ZEROS)
    tpf.show_properties()
    out, _ = capfd.readouterr()
    assert len(out) > 100


def test_tpf_factory_reference_semantics():
    """Mirror of reference test_tpf_factory: duplicate/unsorted warnings,
    FactoryError on bad shapes/cadences, TELESCOP-driven class choice."""
    from lightkurve_tpu.targetpixelfile import (FactoryError,
                                                TargetPixelFileFactory)
    factory = TargetPixelFileFactory(n_cadences=10, n_rows=6, n_cols=8)
    flux_0 = np.ones((6, 8))
    factory.add_cadence(frameno=0, flux=flux_0,
                        header={"TSTART": 0, "TSTOP": 10})
    flux_9 = 3 * np.ones((6, 8))
    factory.add_cadence(frameno=9, flux=flux_9,
                        header={"TSTART": 90, "TSTOP": 100})

    # frames 1-8 share time stamp zero: identical TIME values
    with pytest.warns(LightkurveWarning, match="identical TIME values"):
        factory.get_tpf()
    for i in np.arange(2, 9):
        factory.add_cadence(frameno=i, flux=flux_0,
                            header={"TSTART": i * 10, "TSTOP": i * 10 + 10})
    # frame 1 still has time 0: not chronological
    with pytest.warns(LightkurveWarning, match="chronological order"):
        factory.get_tpf()
    for i in np.arange(1, 9):
        factory.add_cadence(frameno=i, flux=flux_0,
                            header={"TSTART": i * 10, "TSTOP": i * 10 + 10})

    tpf = factory.get_tpf(hdu0_keywords={"TELESCOP": "TESS"})
    assert isinstance(tpf, TessTargetPixelFile)
    np.testing.assert_array_equal(tpf.flux.value[0], flux_0)
    np.testing.assert_array_equal(tpf.flux.value[9], flux_9)

    tpf = factory.get_tpf(hdu0_keywords={"TELESCOP": "Kepler"})
    assert isinstance(tpf, KeplerTargetPixelFile)
    assert tpf.time.value[0] == 5
    assert tpf.time.value[9] == 95

    with pytest.raises(FactoryError):
        factory.add_cadence(frameno=2, flux=3 * np.ones((6, 9)),
                            header={"TSTART": 90, "TSTOP": 100})
    with pytest.raises(FactoryError):
        factory.add_cadence(frameno=11, flux=3 * np.ones((6, 8)),
                            header={"TSTART": 90, "TSTOP": 100})

    tpf = factory.get_tpf(hdu0_keywords={
        "creator": "Christina TargetPixelFileWriter", "TELESCOP": "TESS"})
    assert tpf.get_keyword("CREATOR") == "Christina TargetPixelFileWriter"


FN_LC = os.path.join(TESTDATA, "test-lc-tess-pimen-100-cadences.fits")


def test_load_bad_file():
    """Opening a light-curve file as a TPF raises with the reference's
    message (reference test_targetpixelfile.py:test_load_bad_file)."""
    with pytest.raises(ValueError) as exc:
        KeplerTargetPixelFile(FN_LC)
    assert "is this a target pixel file?" in exc.value.args[0]
    with pytest.raises(ValueError) as exc:
        TessTargetPixelFile(FN_LC)
    assert "is this a target pixel file?" in exc.value.args[0]


@pytest.mark.parametrize("tpf_type", [KeplerTargetPixelFile,
                                      TessTargetPixelFile])
def test_tpf_slicing(tpf_type):
    """Reference test_tpf_slicing: int/slice/bool-array indexing."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", LightkurveWarning)
        tpf = tpf_type(FN_ONE_CENTER)
    assert tpf[0].time.value == tpf.time.value[0]
    assert tpf[-1].time.value == tpf.time.value[-1]
    assert tpf[5:10].shape == tpf.flux.value[5:10].shape
    assert tpf[0].targetid == tpf.targetid
    assert_array_equal(tpf[tpf.time.value < tpf.time.value[5]].time.value,
                       tpf.time.value[0:5])
    frame = tpf[5]
    assert frame.shape[0] == 1
    assert frame.shape[1:] == tpf.shape[1:]
    assert_array_equal(frame.time.value[0], tpf.time.value[5])
    assert_array_equal(frame.flux.value[0], tpf.flux.value[5])
    frames = tpf[5:10]
    assert frames.shape[0] == 5
    assert frames.shape[1:] == tpf.shape[1:]
    assert_array_equal(frames.time.value, tpf.time.value[5:10])
    assert_array_equal(frames.flux.value, tpf.flux.value[5:10])


def test_tpf_meta():
    """Reference test_tpf_meta: keys are upper-case and case-sensitive.
    (Delta: our meta is a plain dict rather than a read-only header view,
    so writes do not raise.)"""
    from lightkurve_tpu import read
    tpf = read(FN_ONE_CENTER)
    assert tpf.meta.get("MISSION") == "K2"
    assert tpf.meta["MISSION"] == "K2"
    assert tpf.meta.get("mission", None) is None
    assert tpf.meta.get("CHANNEL") == 45


def test_parse_aperture_masks():
    """Reference test_parse_aperture_masks: every aperture spelling
    yields a boolean ndarray (numpy>=1.25 regression)."""
    from lightkurve_tpu import read
    for fn in [FN_TABBY, FN_ONE_CENTER]:
        tpf = read(fn)
        for aperture in ["background", "threshold", "all", "empty", None]:
            mask = tpf._parse_aperture_mask(aperture)
            assert isinstance(mask, np.ndarray)
            assert np.issubdtype(mask.dtype, bool)
        for aperture in [np.zeros(tpf.shape[1:], bool),
                         np.ones(tpf.shape[1:], bool),
                         tpf.flux.value[0] > 0]:
            mask = tpf._parse_aperture_mask(aperture)
            assert np.issubdtype(mask.dtype, bool)
        for aperture in [np.ones(tpf.shape[1:]), np.zeros(tpf.shape[1:])]:
            mask = tpf._parse_aperture_mask(aperture)
            assert np.issubdtype(mask.dtype, bool)
    tpf = read(FN_ONE_CENTER)
    with pytest.raises(ValueError) as exc:
        tpf._parse_aperture_mask("pipeline")
    assert "'pipeline' is requested, but it is missing or empty" \
        in exc.value.args[0]
    tpf = read(FN_TABBY)
    mask = tpf._parse_aperture_mask("pipeline")
    assert np.issubdtype(mask.dtype, bool)


def test_threshold_aperture_mask():
    """Reference test_threshold_aperture_mask: the exact pixel counts of
    the MAD-threshold + nearest-contiguous-region algorithm."""
    tpf = KeplerTargetPixelFile(FN_ONE_CENTER)
    tpf.plot(aperture_mask="threshold")
    plt.close("all")
    lc = tpf.to_lightcurve(
        aperture_mask=tpf.create_threshold_mask(threshold=1))
    assert (lc.flux.value == 1).all()
    tpf = TessTargetPixelFile(FN_TESS)
    assert tpf.create_threshold_mask(threshold=2.0).sum() == 25
    assert tpf.create_threshold_mask(
        threshold=2.0, reference_pixel="center").sum() == 25
    assert tpf.create_threshold_mask(
        threshold=2.0, reference_pixel=None).sum() == 28
    assert tpf.create_threshold_mask(
        threshold=2.0, reference_pixel=(5, 0)).sum() == 2
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", LightkurveWarning)
        tpf = KeplerTargetPixelFile(FN_ZEROS)
    assert tpf.create_threshold_mask().sum() == 9


def test_tpf_tess():
    """Reference test_tpf_tess: TESS sector-1 metadata and photometry."""
    from lightkurve_tpu.lightcurve import TessLightCurve
    tpf = TessTargetPixelFile(FN_TESS, quality_bitmask=None)
    assert tpf.mission == "TESS"
    assert tpf.targetid == 25155310
    assert tpf.sector == 1
    assert tpf.camera == 4
    assert tpf.ccd == 1
    assert tpf.pipeline_mask.sum() == 9
    assert tpf.background_mask.sum() == 30
    lc = tpf.to_lightcurve()
    assert isinstance(lc, TessLightCurve)
    assert_array_equal(lc.time.value, tpf.time.value)
    assert tpf.time.scale == "tdb"
    assert tpf.flux.value.shape == tpf.flux_err.value.shape
    tpf.wcs
    col, row = tpf.estimate_centroids()
    assert (tpf.time.value == 0).sum() == 0


def test_get_models():
    """Reference test_get_models: a PRF model can be derived from a TPF
    (all-zeros fixture)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", LightkurveWarning)
        warnings.simplefilter("ignore", RuntimeWarning)
        tpf = KeplerTargetPixelFile(FN_ZEROS, quality_bitmask=None)
        prf = tpf.get_prf_model()
    assert prf is not None
