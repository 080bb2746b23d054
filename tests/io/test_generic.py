"""Mirrors of reference tests/io/test_generic.py against the real
SPARCS sample file shipped with the reference (a non-Kepler/TESS
mission product exercising JDREF/MJDREF time-reference inference)."""
import os

import numpy as np
import pytest

from lightkurve_tpu.io import read
from lightkurve_tpu.io.fits import open_fits
from lightkurve_tpu.io.generic import read_generic_lightcurve

FILENAME = "/root/reference/tests/data/test-sparcs-jdref.fits"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FILENAME),
    reason="reference test data not available")


def test_read_generic():
    """Can we read generic light curve files from other missions?"""
    lc = read(FILENAME)
    assert type(lc).__name__ == "LightCurve"

    hdul = open_fits(FILENAME)
    data = hdul[1].data
    header0 = hdul[0].header
    header1 = hdul[1].header

    # time axis = TIME + JDREF, format inferred as JD, scale from TIMESYS
    good = ~np.isnan(np.asarray(data["TIME"], dtype=float))
    np.testing.assert_allclose(
        lc.time.value, np.asarray(data["TIME"])[good] + header1["JDREF"])
    assert lc.time.format.lower() == "jd"
    assert lc.time.scale.lower() == header1["TIMESYS"].lower()

    # data and metadata
    np.testing.assert_array_equal(lc.flux.value,
                                  np.asarray(data["FLUX"])[good])
    np.testing.assert_array_equal(np.asarray(lc.ctr_err.value),
                                  np.asarray(data["CTR_ERR"])[good])
    assert lc.label == header0["OBJECT"]
    assert len(lc) == good.sum()
    # unfamiliar flux units survive as opaque labels
    assert str(lc.flux.unit) == header1["TUNIT5"]


def test_mjdref_permutation():
    """MJDREF wins over a vestigial JDREF; a lone MJDREFF is ignored."""
    hdul = open_fits(FILENAME)
    data = hdul[1].data
    hdr = hdul[1].header
    hdr["MJDREF"] = 300.0
    hdr["JDREF"] = 2400000.5
    hdr["MJDREFF"] = 0.5  # no MJDREFI → must be ignored
    lc = read_generic_lightcurve(hdul)
    good = ~np.isnan(np.asarray(data["TIME"], dtype=float))
    np.testing.assert_allclose(
        lc.time.value, np.asarray(data["TIME"])[good] + 300.0)
    assert lc.time.format.lower() == "mjd"


def test_jdrefi_permutation():
    """JDREFI+JDREFF win over a vestigial JDREF."""
    hdul = open_fits(FILENAME)
    data = hdul[1].data
    hdr = hdul[1].header
    hdr["JDREFI"] = 2400009
    hdr["JDREFF"] = 0.1
    hdr["JDREF"] = 2400000.5
    hdr["MJDREFF"] = 0.5
    lc = read_generic_lightcurve(hdul)
    good = ~np.isnan(np.asarray(data["TIME"], dtype=float))
    np.testing.assert_allclose(
        lc.time.value,
        np.asarray(data["TIME"])[good] + 2400009 + 0.1)
    assert lc.time.format.lower() == "jd"


def test_no_reference_raises():
    """Without any reference-time header and no explicit time_format,
    the generic reader raises a helpful error."""
    hdul = open_fits(FILENAME)
    hdr = hdul[1].header
    for key in ("JDREF", "JDREFI", "JDREFF", "MJDREF", "MJDREFI",
                "MJDREFF", "BJDREFI", "TIMESYS"):
        try:
            del hdr[key]
        except KeyError:
            pass
    with pytest.raises(ValueError, match="reference time"):
        read_generic_lightcurve(hdul)
    # but an explicit time_format always works
    lc = read_generic_lightcurve(open_fits(FILENAME), time_format="jd")
    assert lc.time.format == "jd"
