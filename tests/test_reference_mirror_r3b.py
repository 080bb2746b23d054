"""Round-3 mirrors, part 2: to_fits round-trips and folded-file I/O.

Each test re-implements the BEHAVIOR of a reference test (cited per
test) on synthetic in-memory data — no network, no astropy.
"""
import numpy as np
import pytest

from lightkurve_tpu import (FoldedLightCurve, KeplerLightCurve, LightCurve,
                            read)
from lightkurve_tpu.utils import LightkurveError


def test_to_fits_extra_keywords_roundtrip():
    """Scalar extra_data become primary-header keywords readable back as
    meta attributes (reference test_lightcurve.py:1116-1121, #1369)."""
    lc = LightCurve(time=[1., 2, 3], flux=[4., 5, 6])
    hdu = lc.to_fits(period=1.2, message="Test string")
    out = read(hdu, time_format="jd")
    assert out.period == 1.2
    assert out.message == "Test string"
    assert out.meta["FLUX_ORIGIN"] == "lightkurve.LightCurve.to_fits()"


def test_to_fits_generic_read_back():
    """Reading an in-memory HDUList works; the generic path honours
    time_format (reference test_lightcurve.py:1123-1135, #649).

    DEVIATION: the reference's to_fits output carries no time-reference
    keyword, so ``read(hdu)`` without ``time_format`` raises there.  Our
    writer emits JDREF/MJDREF/BJDREF, making the file self-describing —
    the read-back succeeds and preserves the time format."""
    basic_lc = LightCurve(time=[1., 2, 3], flux=[4., 5, 6])
    basic_hdu = basic_lc.to_fits()
    out = read(basic_hdu, time_format="jd")
    assert (out.time.value == [1, 2, 3]).all()
    assert out.time.format == "jd"
    # self-describing read-back (improvement over the reference raise)
    out2 = read(basic_hdu)
    assert (out2.time.value == [1, 2, 3]).all()
    assert out2.meta["FLUX_ORIGIN"] == "lightkurve.LightCurve.to_fits()"


def test_reader_failure_wrapped_as_lightkurve_error():
    """A reader that fails mid-parse surfaces as LightkurveError with the
    reference's message (reference io/read.py:141-148)."""
    lc = LightCurve(time=[1., 2, 3], flux=[4., 5, 6])
    hdu = lc.to_fits()
    # strip every time-reference keyword so the generic reader cannot
    # infer the format and raises inside the reader
    for kw in ("JDREF", "MJDREF", "BJDREFI", "BJDREFF", "TIMESYS"):
        try:
            del hdu[1].header[kw]
        except Exception:
            pass
    with pytest.raises(LightkurveError,
                       match="Error in reading Data product"):
        read(hdu)


def test_to_fits_folded_roundtrip():
    """Folding metadata survives a to_fits round trip
    (reference test_lightcurve.py:1110-1115)."""
    t = np.linspace(0., 10., 100)
    lc = LightCurve(time=t, flux=1 + 0.01 * np.sin(6 * t))
    folded = lc.fold(1.2)
    out = read(folded.to_fits())
    assert isinstance(out, FoldedLightCurve)
    assert out.normalize_phase == False  # noqa: E712
    assert float(out.period.value) == 1.2
    assert out.meta["EPOCH_PHASE"] == 0.0
    np.testing.assert_allclose(np.sort(out.time.value),
                               np.sort(folded.time.value), atol=1e-9)


def test_to_fits_folded_normalized_roundtrip():
    """A normalize_phase=True fold stores phase in days on disk and the
    reader restores the dimensionless phase (reference
    lightcurve.py:3445-3453, io/folded.py:40-43)."""
    t = np.linspace(0., 10., 64)
    folded = LightCurve(time=t, flux=np.ones(64)).fold(
        2.0, normalize_phase=True)
    out = read(folded.to_fits())
    assert out.normalize_phase == True  # noqa: E712
    assert float(out.period.value) == 2.0
    np.testing.assert_allclose(np.sort(out.time.value),
                               np.sort(folded.time.value), atol=1e-9)
    assert np.abs(out.time.value).max() <= 0.5 + 1e-9


def test_to_fits_folded_epoch_kept():
    """EPOCH in the primary header restores EPOCH_TIME
    (reference io/folded.py:36-39)."""
    t = np.linspace(0., 10., 50)
    folded = LightCurve(time=t, flux=np.ones(50)).fold(
        1.5, epoch_time=2.0)
    hdu = folded.to_fits()
    assert hdu[0].header["EPOCH"] == 2.0
    out = read(hdu)
    assert float(out.meta["EPOCH_TIME"].value) == 2.0


def test_select_flux_to_fits_roundtrip():
    """select_flux()'d column round-trips through to_fits
    (reference test_lightcurve.py:1040-1045)."""
    lc = KeplerLightCurve(time=[1., 2, 3], flux=[1., 1, 1],
                          flux_err=[.1, .1, .1])
    lc["sap_bkg"] = np.array([5., 6, 7])
    out = read(lc.select_flux("sap_bkg").to_fits(), time_format="jd")
    np.testing.assert_allclose(np.asarray(out.flux.value), [5, 6, 7])
    assert out.meta["FLUX_ORIGIN"] == "lightkurve.LightCurve.to_fits()"


def test_bin_quality_and_centroids():
    """Binning revises quality (bitwise OR) and centroids (mean)
    (reference test_lightcurve.py:840-871; the reference xfails the
    bitwise-OR part, #663 — we implement it)."""
    lc = KeplerLightCurve(time=[1, 2, 3, 4], flux=[1, 1, 1, 1],
                          quality=[0, 1, 2, 3],
                          centroid_col=[0., 1, 0, 1],
                          centroid_row=[0., 2, 0, 2])
    binned = lc.bin(binsize=2)
    np.testing.assert_allclose(np.asarray(binned.centroid_col), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(binned.centroid_row), [1, 1])
    np.testing.assert_array_equal(np.asarray(binned["quality"]), [1, 3])


def test_pickle_mission_data_and_folds():
    """Pickling real mission data, plain and folded (normalized or not),
    round-trips columns and meta (reference test_lightcurve.py:2114-2152,
    #1527)."""
    import pickle

    lc = read("/root/reference/tests/data/"
              "test-lc-tess-pimen-100-cadences.fits")
    for obj, label in [
        (lc, "plain"),
        (lc.fold(epoch_time=lc.time.value[3], period=2), "folded"),
        (lc.fold(epoch_time=lc.time.value[3], period=2,
                 normalize_phase=True), "folded-normalized"),
    ]:
        back = pickle.loads(pickle.dumps(obj))
        assert type(back) is type(obj), label
        assert len(back) == len(obj), label
        np.testing.assert_array_equal(
            np.asarray(back.flux.value), np.asarray(obj.flux.value),
            err_msg=label)
        np.testing.assert_array_equal(back.time.value, obj.time.value,
                                      err_msg=label)
        assert back.meta.get("MISSION") == obj.meta.get("MISSION"), label
    refolded = pickle.loads(pickle.dumps(
        lc.fold(epoch_time=lc.time.value[3], period=2,
                normalize_phase=True)))
    assert refolded.normalize_phase == True  # noqa: E712
    assert np.abs(refolded.time.value).max() <= 0.5 + 1e-9
