"""Search→download→read round trips for every HLSP product flavor.

Mirrors the reference's remote-data tests test_search_qlp
(``io/test_qlp.py:53``), test_search_cdips (``io/test_cdips.py:54``),
test_search_everest, test_search_k2sff, test_search_pathos,
test_search_tasoc, test_search_tglc, and test_search_gsfc_eleanor_lite —
offline: synthetic product files of each flavor served through a
:class:`RecordedMASTTransport`, exercising the full author/sector filter
chain plus the per-product reader dispatch.
"""
import numpy as np
import pytest

from lightkurve_tpu.io.fits import (BinTableHDU, Header, HDUList,
                                    PrimaryHDU, write_fits)
from lightkurve_tpu.mast import RecordedMASTTransport
from lightkurve_tpu.search import search_lightcurve

N = 30


def _table(cols, ext_extra=None, time_col="TIME", bjdrefi=2457000):
    data = {time_col: 1500.0 + np.arange(N) * 0.02}
    data.update(cols)
    hdr = {"EXTNAME": "LIGHTCURVE", "BJDREFI": bjdrefi, "BJDREFF": 0.0}
    hdr.update(ext_extra or {})
    return BinTableHDU(data=data, header=Header(hdr))


def _write(tmp_path, name, primary_cards, table):
    path = str(tmp_path / name)
    write_fits(HDUList([PrimaryHDU(header=Header(primary_cards)), table]),
               path)
    return path


def _make_product(tmp_path, flavor):
    """(filename, local path, obs overrides) for one HLSP flavor."""
    f32 = np.float32
    ones = np.ones(N, f32)
    if flavor == "QLP":
        fn = "hlsp_qlp_tess_ffi_s0011-0000000277554109_tess_v01_llc.fits"
        path = _write(tmp_path, fn, {"ORIGIN": "MIT/QLP", "TICID":
                                     277554109, "TELESCOP": "TESS",
                                     "SECTOR": 11},
                      _table({"SAP_FLUX": ones,
                              "KSPSAP_FLUX_ERR": ones * f32(0.1),
                              "QUALITY": np.zeros(N, np.int32)}))
        return fn, path, dict(tic=277554109, project="TESS", seq=11)
    if flavor == "CDIPS":
        fn = ("hlsp_cdips_tess_ffi_gaiatwo-0000093270923-0008_tess_v01_"
              "llc.fits")
        cols = {"TMID_BJD": 1500.0 + np.arange(N) * 0.02,
                "IRM1": ones * 10, "IRE1": ones * f32(0.5),
                "IRQ1": np.array(["G"] * N, dtype="S1"),
                "BGE": ones}
        path = _write(tmp_path, fn, {"ORIGIN": "CDIPS pipeline",
                                     "TICID": 93270923,
                                     "TELESCOP": "TESS", "SECTOR": 8,
                                     "TUNIT8": "adu"},
                      BinTableHDU(data=cols, header=Header(
                          {"EXTNAME": "LIGHTCURVE", "TUNIT5": "adu"})))
        return fn, path, dict(tic=93270923, project="TESS", seq=8)
    if flavor == "EVEREST":
        fn = ("hlsp_everest_k2_llc_246389858-c12_kepler_v2.0_lc.fits")
        path = _write(tmp_path, fn, {"TELESCOP": "Kepler",
                                     "KEPLERID": 246389858,
                                     "CAMPAIGN": 12, "MISSION": "K2",
                                     "COMMENT": "EVEREST pipeline"},
                      _table({"FLUX": ones,
                              "QUALITY": np.zeros(N, np.int32),
                              "CADN": np.arange(N, dtype=np.int32)},
                             bjdrefi=2454833))
        return fn, path, dict(tic=None, epic=246389858, project="K2",
                              seq=12)
    if flavor == "K2SFF":
        fn = ("hlsp_k2sff_k2_lightcurve_246389858-c01_kepler_v1_llc.fits")
        table = BinTableHDU(data={
            "T": 2000.0 + np.arange(N) * 0.02,
            "FRAW": ones, "FCOR": ones,
            "ARCLENGTH": ones},
            header=Header({"EXTNAME": "BESTAPER", "BJDREFI": 2454833,
                           "BJDREFF": 0.0, "TTYPE4": "ARCLENGTH"}))
        path = _write(tmp_path, fn, {"KEPLERID": 246389858,
                                     "TELESCOP": "Kepler",
                                     "CAMPAIGN": 1}, table)
        return fn, path, dict(tic=None, epic=246389858, project="K2",
                              seq=1)
    if flavor == "PATHOS":
        fn = ("hlsp_pathos_tess_lightcurve_tic-0093270923-s0008_tess_v1_"
              "llc.fits")
        path = _write(tmp_path, fn, {"TELESCOP": "TESS",
                                     "TICID": 93270923, "SECTOR": 8,
                                     "ORIGIN": "PATHOS pipeline",
                                     "CREATOR": "PATHOS"},
                      _table({"PSF_FLUX_RAW": ones, "PSF_FLUX_COR": ones,
                              "AP4_FLUX_RAW": ones, "AP4_FLUX_COR": ones,
                              "AP1_FLUX_RAW": ones, "AP1_FLUX_COR": ones,
                              "SKY_LOCAL": ones}))
        return fn, path, dict(tic=93270923, project="TESS", seq=8)
    if flavor == "TASOC":
        fn = ("hlsp_tasoc_tess_ffi_tic00150442264-s0001_tess_v05_"
              "ens-llc.fits")
        path = _write(tmp_path, fn, {"ORIGIN": "TASOC/Aarhus",
                                     "TICID": 150442264,
                                     "TELESCOP": "TESS", "SECTOR": 1},
                      _table({"FLUX_CORR": ones, "FLUX_RAW": ones}))
        return fn, path, dict(tic=150442264, project="TESS", seq=1)
    if flavor == "TGLC":
        fn = ("hlsp_tglc_tess_ffi_gaiaid-140898436-s0001_tess_v1_"
              "llc.fits")
        path = _write(tmp_path, fn, {"ORIGIN": "UCSB/TGLC",
                                     "TICID": 140898436,
                                     "TELESCOP": "TESS", "SECTOR": 1,
                                     "CAMERA": 4},
                      _table({"CAL_PSF_FLUX": ones,
                              "TESS_FLAGS": np.zeros(N, np.int32),
                              "CADENCE_NUM": np.arange(N, dtype=np.int32)}))
        return fn, path, dict(tic=140898436, project="TESS", seq=1)
    if flavor == "GSFC-ELEANOR-LITE":
        fn = ("hlsp_gsfc-eleanor-lite_tess_ffi_s0001-0000000336732616_"
              "tess_v1.0_lc.fits")
        path = _write(tmp_path, fn,
                      {"TELESCOP": "TESS", "LITE": True,
                       "PCORIGIN": "POSTCARD", "TVERSION": "1.0",
                       "GITHUB":
                       "https://github.com/afeinstein20/eleanor",
                       "TICID": 336732616, "SECTOR": 1},
                      _table({"CORR_FLUX": ones, "RAW_FLUX": ones,
                              "FLUX_ERR": ones * np.float32(0.1),
                              "QUALITY": np.zeros(N, np.int32),
                              "X_CENTROID": ones, "Y_CENTROID": ones,
                              "FFIINDEX": np.arange(N, dtype=float)}))
        return fn, path, dict(tic=336732616, project="TESS", seq=1)
    raise ValueError(flavor)


@pytest.fixture
def hlsp_transport(tmp_path):
    observations, products = [], []
    for flavor in ("QLP", "CDIPS", "EVEREST", "K2SFF", "PATHOS", "TASOC",
                   "TGLC", "GSFC-ELEANOR-LITE"):
        fn, path, ov = _make_product(tmp_path, flavor)
        tname = (str(ov["tic"]) if ov.get("tic")
                 else f"ktwo{ov['epic']:09d}")
        obs_id = f"{flavor}_{tname}"
        observations.append(
            {"obs_id": obs_id, "target_name": tname, "s_ra": 50.0,
             "s_dec": 20.0, "project": ov["project"],
             "provenance_name": flavor, "t_exptime": 1800,
             "sequence_number": ov["seq"],
             "dataproduct_type": "timeseries",
             "description": f"{flavor} product"})
        products.append({"obs_id": obs_id, "productFilename": fn,
                         "description": f"{flavor} light curve",
                         "dataURI": f"mast:HLSP/{fn}",
                         "local_path": path})
    return RecordedMASTTransport({"observations": observations,
                                  "products": products})


def _one(sr):
    assert len(sr) == 1
    return sr


def test_search_qlp(hlsp_transport, tmp_path):
    sr = _one(search_lightcurve("TIC 277554109", author="QLP", sector=11,
                                transport=hlsp_transport))
    assert sr.table[0]["author"] == "QLP"
    lc = sr.download(download_dir=str(tmp_path / "c"))
    assert type(lc).__name__ == "TessLightCurve"
    assert lc.meta["SECTOR"] == 11
    assert lc.meta["AUTHOR"] == "QLP"


def test_search_cdips(hlsp_transport, tmp_path):
    sr = _one(search_lightcurve("TIC 93270923", author="CDIPS",
                                transport=hlsp_transport))
    assert sr.table[0]["author"] == "CDIPS"
    lc = sr.download(download_dir=str(tmp_path / "c"))
    assert type(lc).__name__ == "TessLightCurve"
    assert lc.meta.get("SECTOR") == 8
    assert str(lc["bge"].unit) == "adu"


def test_search_everest(hlsp_transport, tmp_path):
    sr = _one(search_lightcurve("EPIC 246389858", author="EVEREST",
                                campaign=12, transport=hlsp_transport))
    assert sr.table[0]["author"] == "EVEREST"
    lc = sr.download(download_dir=str(tmp_path / "c"))
    assert type(lc).__name__ == "KeplerLightCurve"
    assert lc.meta["CAMPAIGN"] == 12


def test_search_k2sff(hlsp_transport, tmp_path):
    sr = _one(search_lightcurve("EPIC 246389858", author="K2SFF",
                                campaign=1, transport=hlsp_transport))
    assert sr.table[0]["author"] == "K2SFF"
    lc = sr.download(download_dir=str(tmp_path / "c"))
    assert type(lc).__name__ == "KeplerLightCurve"
    assert lc.meta["CAMPAIGN"] == 1
    assert lc.meta["TARGETID"] == 246389858


def test_search_pathos(hlsp_transport, tmp_path):
    sr = _one(search_lightcurve("TIC 93270923", author="PATHOS", sector=8,
                                transport=hlsp_transport))
    assert sr.table[0]["author"] == "PATHOS"
    lc = sr.download(download_dir=str(tmp_path / "c"))
    assert type(lc).__name__ == "TessLightCurve"
    assert lc.meta["SECTOR"] == 8


def test_search_tasoc(hlsp_transport, tmp_path):
    sr = _one(search_lightcurve("TIC 150442264", author="TASOC",
                                transport=hlsp_transport))
    assert sr.table[0]["author"] == "TASOC"
    lc = sr.download(download_dir=str(tmp_path / "c"))
    assert type(lc).__name__ == "TessLightCurve"
    assert lc.meta["AUTHOR"] == "TASOC"


def test_search_tglc(hlsp_transport, tmp_path):
    sr = _one(search_lightcurve("TIC 140898436", author="TGLC", sector=1,
                                mission="TESS", transport=hlsp_transport))
    assert sr.table[0]["author"] == "TGLC"
    lc = sr.download(download_dir=str(tmp_path / "c"))
    assert type(lc).__name__ == "TessLightCurve"
    assert lc.meta["TARGETID"] == 140898436
    assert lc.meta["SECTOR"] == 1
    assert lc.meta["CAMERA"] == 4


def test_search_gsfc_eleanor_lite(hlsp_transport, tmp_path):
    sr = _one(search_lightcurve("TIC 336732616",
                                author="GSFC-ELEANOR-LITE", sector=1,
                                transport=hlsp_transport))
    assert sr.table[0]["author"] == "GSFC-ELEANOR-LITE"
    lc = sr.download(download_dir=str(tmp_path / "c"))
    assert lc.meta["AUTHOR"] == "GSFC-ELEANOR-LITE"
    assert lc.meta["FLUX_ORIGIN"] == "corr_flux"
