"""Product detection across HLSP flavors (reference io/detect.py:8-169)."""
import numpy as np
import pytest

from lightkurve_tpu.io import detect_filetype, read
from lightkurve_tpu.io.fits import (BinTableHDU, Header, HDUList,
                                    PrimaryHDU, write_fits)


def _base_table(n=30, time_format_card=("BJDREFI", 2457000), cols=None,
                ext_extra=None):
    data = {"TIME": 1500.0 + np.arange(n) * 0.02}
    data.update(cols or {})
    hdr = {"EXTNAME": "LIGHTCURVE", time_format_card[0]: time_format_card[1],
           "BJDREFF": 0.0}
    hdr.update(ext_extra or {})
    return BinTableHDU(data=data, header=Header(hdr))


def _write(tmp_path, name, primary_cards, table):
    path = str(tmp_path / name)
    write_fits(HDUList([PrimaryHDU(header=Header(primary_cards)), table]),
               path)
    return path


def test_detect_qlp(tmp_path, rng):
    n = 30
    table = _base_table(cols={
        "SAP_FLUX": np.ones(n, np.float32),
        "KSPSAP_FLUX_ERR": np.full(n, 0.1, np.float32),
        "QUALITY": np.zeros(n, np.int32)})
    path = _write(tmp_path, "qlp.fits",
                  {"ORIGIN": "MIT/QLP", "TICID": 7, "TELESCOP": "TESS"},
                  table)
    assert detect_filetype(__import__("lightkurve_tpu").io.open_fits(path)) \
        == "QLP"
    lc = read(path)
    assert lc.meta["AUTHOR"] == "QLP"


def test_detect_tasoc(tmp_path):
    n = 30
    table = _base_table(cols={"FLUX_CORR": np.ones(n, np.float32)})
    path = _write(tmp_path, "tasoc.fits",
                  {"ORIGIN": "TASOC/Aarhus", "TICID": 7,
                   "TELESCOP": "TESS"}, table)
    from lightkurve_tpu.io import open_fits
    assert detect_filetype(open_fits(path)) == "TASOC"
    lc = read(path)
    assert lc.meta["AUTHOR"] == "TASOC"


def test_detect_cdips(tmp_path):
    n = 30
    table = _base_table(cols={"IRM1": np.ones(n, np.float32),
                              "IRE1": np.full(n, 0.1, np.float32)})
    path = _write(tmp_path, "cdips.fits",
                  {"ORIGIN": "CDIPS pipeline", "TICID": 7,
                   "TELESCOP": "TESS"}, table)
    from lightkurve_tpu.io import open_fits
    assert detect_filetype(open_fits(path)) == "CDIPS"


def test_detect_kepseismic(tmp_path):
    n = 30
    table = _base_table(time_format_card=("MJDREF", 0.0),
                        cols={"FLUX": np.ones(n, np.float32)})
    path = _write(tmp_path, "kepseismic.fits",
                  {"ORIGIN": "CEA & SSI", "KEPLERID": 3,
                   "TELESCOP": "Kepler"}, table)
    from lightkurve_tpu.io import open_fits
    assert detect_filetype(open_fits(path)) == "KEPSEISMIC"
    lc = read(path)
    assert lc.time.format == "mjd"


def test_detect_tglc(tmp_path):
    n = 30
    table = _base_table(cols={"CAL_PSF_FLUX": np.ones(n, np.float32),
                              "TESS_FLAGS": np.zeros(n, np.int32)})
    path = _write(tmp_path, "tglc.fits",
                  {"ORIGIN": "UCSB/TGLC", "TICID": 7, "TELESCOP": "TESS"},
                  table)
    from lightkurve_tpu.io import open_fits
    assert detect_filetype(open_fits(path)) == "TGLC"


def test_detect_k2sff(tmp_path):
    n = 30
    table = BinTableHDU(data={
        "T": 2000.0 + np.arange(n) * 0.02,
        "FRAW": np.ones(n, np.float32),
        "FCOR": np.ones(n, np.float32),
        "ARCLENGTH": np.ones(n, np.float32)},
        header=Header({"EXTNAME": "BESTAPER", "BJDREFI": 2454833,
                       "BJDREFF": 0.0, "TTYPE4": "ARCLENGTH"}))
    path = _write(tmp_path, "k2sff.fits",
                  {"KEPLERID": 5, "TELESCOP": "Kepler"}, table)
    from lightkurve_tpu.io import open_fits
    assert detect_filetype(open_fits(path)) == "K2SFF"
    lc = read(path)
    assert lc.meta["AUTHOR"] == "K2SFF"


def test_detect_folded_and_generic(tmp_path):
    n = 30
    table = _base_table(cols={"FLUX": np.ones(n, np.float32)},
                        time_format_card=("JDREF", 0.0))
    path = _write(tmp_path, "folded.fits",
                  {"CREATOR": "lightkurve.FoldedLightCurve.to_fits()",
                   "TELESCOP": "TESS", "ORIGIN": "x"}, table)
    from lightkurve_tpu.io import open_fits
    assert detect_filetype(open_fits(path)) == "Folded"
    # no CREATOR at all → 'generic'
    path2 = _write(tmp_path, "generic.fits", {"TELESCOP": "TESS"},
                   _base_table(cols={"FLUX": np.ones(n, np.float32)}))
    assert detect_filetype(open_fits(path2)) == "generic"
