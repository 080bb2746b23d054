"""Mirrors of reference tests/test_conf.py, test_convenience.py,
test_time.py, and test_units.py (the offline ones)."""
import os
import shutil
import tempfile
from pathlib import Path

import numpy as np
import pytest
from numpy.testing import assert_almost_equal

import lightkurve_tpu as lk
from lightkurve_tpu.time import Time
from lightkurve_tpu.units import Unit

REF_CFG = "/root/reference/tests/data/lightkurve_sr_cols_added.cfg"


def _use_custom_config_file(cfg_filepath):
    dest = Path(lk.config.get_config_dir(), "lightkurve.cfg")
    shutil.copy(cfg_filepath, dest)
    lk.conf.reload()
    return dest


def test_read_conf_from_file():
    """Config values are read from the per-user config file — uses the
    reference's actual sample cfg."""
    if not os.path.exists(REF_CFG):
        pytest.skip("reference sample cfg not available")
    lk.conf.reload()
    assert lk.conf.search_result_display_extra_columns == []
    dest = None
    try:
        dest = _use_custom_config_file(REF_CFG)
        assert lk.conf.search_result_display_extra_columns == \
            ["proposal_id"]
    finally:
        if dest is not None and dest.exists():
            dest.unlink()
        lk.conf.reload()


def test_get_cache_dir():
    actual = lk.config.get_cache_dir()
    assert os.path.isdir(actual)
    with tempfile.TemporaryDirectory() as base:
        try:
            expected = os.path.join(base, "some_subdir")
            lk.conf.cache_dir = expected
            actual = lk.config.get_cache_dir()
            assert expected == actual
            assert os.path.isdir(actual)
            # repeated calls keep working
            assert lk.config.get_cache_dir() == expected
        finally:
            lk.conf.cache_dir = None


def test_cdpp_convenience():
    """estimate_cdpp() convenience wrapper matches the method."""
    from lightkurve_tpu.convenience import estimate_cdpp
    flux = np.random.default_rng(0).normal(1, 100e-6, 10000)
    lc = lk.LightCurve(time=np.arange(10000), flux=flux)
    assert_almost_equal(float(np.asarray(estimate_cdpp(flux))),
                        float(np.asarray(lc.estimate_cdpp().value)))


def test_bkjd():
    """BKJD epoch: BKJD 0 = 2009-01-01 12:00:00 TDB (JD 2454833)."""
    t0 = Time(0, format="bkjd")
    assert t0.format == "bkjd"
    assert t0.scale == "tdb"
    assert np.isclose(float(np.asarray(t0.jd)), 2454833.0)


def test_btjd():
    """BTJD epoch: BTJD 0 = 2014-12-08 12:00:00 TDB (JD 2457000)."""
    t0 = Time(0, format="btjd")
    assert t0.format == "btjd"
    assert t0.scale == "tdb"
    assert np.isclose(float(np.asarray(t0.jd)), 2457000.0)
    # round-trip through JD (reference uses TSTART header values)
    tstart = 2144.513656838462
    t = Time(tstart, format="btjd")
    assert np.isclose(float(np.asarray(t.jd)), 2457000.0 + tstart)
    back = Time(np.asarray(t.jd), format="jd")
    assert np.isclose(float(np.asarray(back.to_value("btjd"))), tstart)


def test_custom_units():
    """ppt, ppm, and percent are recognized unit strings."""
    Unit.parse("ppt")
    Unit.parse("ppm")
    Unit.parse("percent")
