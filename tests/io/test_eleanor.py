"""Mirrors of reference tests/io/test_eleanor.py (vanilla-eleanor part)
against the real sample files shipped with the reference checkout."""
import os

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from lightkurve_tpu.io.detect import detect_filetype
from lightkurve_tpu.io.fits import open_fits
from lightkurve_tpu.io.readers import read_eleanor_lightcurve

TESTDATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TESTDATA),
    reason="reference test data not available")


@pytest.mark.parametrize("fname", [
    "test-lc-tess-pimen_s1_eleanor_lite-100-cadences.fits",
    "test-lc-tess-pimen_s1_eleanor_full-100-cadences.fits",
])
def test_vanilla_eleanor(fname):
    """Can we read in vanilla eleanor light curves?"""
    url = os.path.join(TESTDATA, fname)
    hdulist = open_fits(url)
    assert detect_filetype(hdulist) == "ELEANOR"
    lc = read_eleanor_lightcurve(url, quality_bitmask=0)
    assert lc.meta["AUTHOR"] == "ELEANOR"
    assert lc.meta["FLUX_ORIGIN"] == "corr_flux"
    good = ~np.isnan(np.asarray(hdulist[1].data["TIME"], dtype=float))
    assert_array_equal(lc.flux.value,
                       np.asarray(hdulist[1].data["CORR_FLUX"])[good])
    if "PSF_FLUX" in hdulist[1].data.names:
        assert_array_equal(np.asarray(lc.psf_flux.value),
                           np.asarray(hdulist[1].data["PSF_FLUX"])[good])
    # FFIINDEX cadence numbers are float in the file; the reader must
    # restore integer dtype
    assert np.issubdtype(np.asarray(lc["cadenceno"]).dtype, np.integer)
