"""FITS reader/writer and product-reader tests."""
import gzip
import os

import numpy as np
import pytest

from lightkurve_tpu.io.fits import (BinTableHDU, Header, HDUList, ImageHDU,
                                    PrimaryHDU, open_fits, write_fits)
from lightkurve_tpu.io import detect_filetype, read
from lightkurve_tpu.io.readers import read_tess_lightcurve, \
    read_kepler_lightcurve
from lightkurve_tpu.io.writers import lightcurve_to_fits
from lightkurve_tpu import LightCurve


def make_tess_lc_file(path, n=50):
    """Synthesize a SPOC-style light-curve FITS file."""
    rng = np.random.default_rng(0)
    t = 1500.0 + np.arange(n) * 2.0 / 60 / 24
    ph = Header({
        "TELESCOP": "TESS", "CREATOR": "LightCurveExporterPipelineModule",
        "ORIGIN": "NASA/Ames", "OBJECT": "TIC 12345678",
        "TICID": 12345678, "SECTOR": 10, "CAMERA": 2, "CCD": 4,
        "RA_OBJ": 120.5, "DEC_OBJ": -45.3, "MISSION": "TESS"})
    quality = np.zeros(n, dtype=np.int32)
    quality[5] = 8   # EarthPoint → masked by 'default'
    table = BinTableHDU(data={
        "TIME": t,
        "SAP_FLUX": 1000 + rng.normal(0, 1, n).astype(np.float32),
        "SAP_FLUX_ERR": np.full(n, 1.0, dtype=np.float32),
        "PDCSAP_FLUX": 2000 + rng.normal(0, 1, n).astype(np.float32),
        "PDCSAP_FLUX_ERR": np.full(n, 1.0, dtype=np.float32),
        "QUALITY": quality,
        "CADENCENO": np.arange(n, dtype=np.int32),
        "MOM_CENTR1": np.full(n, 55.5, dtype=np.float32),
        "MOM_CENTR2": np.full(n, 60.5, dtype=np.float32),
    }, header=Header({"EXTNAME": "LIGHTCURVE", "BJDREFI": 2457000,
                      "BJDREFF": 0.0, "TIMESYS": "TDB",
                      "TUNIT2": "e-/s", "TUNIT3": "e-/s",
                      "TUNIT4": "e-/s", "TUNIT5": "e-/s"}))
    hdus = HDUList([PrimaryHDU(header=ph), table])
    write_fits(hdus, path, overwrite=True)
    return path


def test_header_roundtrip(tmp_path):
    h = Header({"SIMPLE": True, "INTKEY": 42, "FLOATKEY": 3.14,
                "STRKEY": "hello world", "NEGKEY": -1.5e-8})
    raw = h.tobytes()
    assert len(raw) % 2880 == 0
    from lightkurve_tpu.io.fits import _read_header
    h2, _ = _read_header(raw, 0)
    assert h2["INTKEY"] == 42
    assert np.isclose(h2["FLOATKEY"], 3.14)
    assert h2["STRKEY"] == "hello world"
    assert np.isclose(h2["NEGKEY"], -1.5e-8)
    assert h2["SIMPLE"] is True
    # quote escaping
    h3 = Header({"QUOTE": "it's"})
    h4, _ = _read_header(h3.tobytes(), 0)
    assert h4["QUOTE"] == "it's"


def test_image_roundtrip(tmp_path):
    path = str(tmp_path / "img.fits")
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    hdus = HDUList([PrimaryHDU(data=img, header=Header({"TEST": 1}))])
    write_fits(hdus, path)
    back = open_fits(path)
    np.testing.assert_array_equal(np.asarray(back[0].data), img)
    assert back[0].header["TEST"] == 1
    # int image
    path2 = str(tmp_path / "img2.fits")
    img2 = np.arange(6, dtype=np.int32).reshape(2, 3)
    write_fits(HDUList([PrimaryHDU(data=img2)]), path2)
    np.testing.assert_array_equal(np.asarray(open_fits(path2)[0].data), img2)


def test_bintable_roundtrip(tmp_path):
    path = str(tmp_path / "tab.fits")
    n = 20
    cols = {
        "F64": np.linspace(0, 1, n),
        "F32": np.linspace(0, 1, n).astype(np.float32),
        "I32": np.arange(n, dtype=np.int32),
        "I16": np.arange(n, dtype=np.int16),
        "BOOL": np.arange(n) % 2 == 0,
        "VEC": np.arange(3 * n, dtype=np.float32).reshape(n, 3),
        "IMG": np.arange(6 * n, dtype=np.float32).reshape(n, 2, 3),
        "STR": np.array([f"id{i:03d}" for i in range(n)]),
    }
    hdus = HDUList([PrimaryHDU(),
                    BinTableHDU(data=cols, name="TESTTBL")])
    write_fits(hdus, path)
    back = open_fits(path)
    tbl = back["TESTTBL"]
    np.testing.assert_allclose(tbl.data["F64"], cols["F64"])
    np.testing.assert_allclose(tbl.data["F32"], cols["F32"])
    np.testing.assert_array_equal(tbl.data["I32"], cols["I32"])
    np.testing.assert_array_equal(tbl.data["I16"], cols["I16"])
    np.testing.assert_array_equal(tbl.data["BOOL"], cols["BOOL"])
    np.testing.assert_allclose(tbl.data["VEC"], cols["VEC"])
    assert tbl.data["IMG"].shape == (n, 2, 3)
    np.testing.assert_allclose(tbl.data["IMG"], cols["IMG"])
    assert list(tbl.data["STR"][:2]) == ["id000", "id001"]


def test_gzip_support(tmp_path):
    path = str(tmp_path / "lc.fits")
    make_tess_lc_file(path)
    gz = path + ".gz"
    with open(path, "rb") as f_in, gzip.open(gz, "wb") as f_out:
        f_out.write(f_in.read())
    hdul = open_fits(gz)
    assert "LIGHTCURVE" in [h.header.get("EXTNAME") for h in hdul]


def test_detect_and_read_tess(tmp_path):
    path = str(tmp_path / "tess-lc.fits")
    make_tess_lc_file(path)
    hdul = open_fits(path)
    assert detect_filetype(hdul) == "TessLightCurve"
    lc = read(path)
    assert type(lc).__name__ == "TessLightCurve"
    assert lc.time.format == "btjd"
    # default flux column is PDCSAP (reference io/tess.py)
    assert abs(np.median(lc.flux.value) - 2000) < 10
    assert str(lc.flux.unit) == "electron / s"
    # quality masking dropped the EarthPoint cadence
    assert len(lc) == 49
    assert lc.meta["TARGETID"] == 12345678
    assert lc.meta["AUTHOR"] == "SPOC"
    # flux column override
    lc2 = read(path, flux_column="sap_flux")
    assert abs(np.median(lc2.flux.value) - 1000) < 10
    # quality_bitmask='none' keeps everything
    lc3 = read(path, quality_bitmask="none")
    assert len(lc3) == 50
    # centroid aliases
    assert "centroid_col" in lc.columns


def test_lightcurve_to_fits_roundtrip(tmp_path):
    n = 30
    lc = LightCurve(time=1500.0 + np.arange(n) * 0.02,
                    flux=np.ones(n) + 0.01 * np.sin(np.arange(n)),
                    flux_err=np.full(n, 0.01),
                    quality=np.zeros(n, dtype=np.int32),
                    cadenceno=np.arange(n, dtype=np.int32))
    lc.meta.update({"MISSION": "TESS", "LABEL": "test-obj"})
    object.__setattr__(lc, "_cols", lc._cols)
    lc.time = __import__("lightkurve_tpu").Time(
        1500.0 + np.arange(n) * 0.02, format="btjd")
    path = str(tmp_path / "out.fits")
    lc.to_fits(path=path, overwrite=True)
    back = read(path)
    np.testing.assert_allclose(back.time.value, lc.time.value, atol=1e-9)
    np.testing.assert_allclose(back.flux.value, lc.flux.value, rtol=1e-6)
    np.testing.assert_allclose(back.flux_err.value, lc.flux_err.value,
                               rtol=1e-6)
    assert back.time.format == "btjd"


def test_read_corrupt_file(tmp_path):
    from lightkurve_tpu.utils import LightkurveError
    path = str(tmp_path / "corrupt.fits")
    with open(path, "wb") as f:
        f.write(b"this is not a fits file at all" * 100)
    with pytest.raises(LightkurveError, match="corrupt|could not"):
        read(path)


def test_kepler_reader(tmp_path):
    path = str(tmp_path / "kplr-lc.fits")
    rng = np.random.default_rng(1)
    n = 40
    ph = Header({"TELESCOP": "Kepler",
                 "CREATOR": "FluxExporter2PipelineModule",
                 "OBJECT": "KIC 7603200", "KEPLERID": 7603200,
                 "QUARTER": 8, "CHANNEL": 42, "MISSION": "Kepler"})
    table = BinTableHDU(data={
        "TIME": 500.0 + np.arange(n) * 0.02,
        "SAP_FLUX": (100 + rng.normal(0, 1, n)).astype(np.float32),
        "PDCSAP_FLUX": (100 + rng.normal(0, 1, n)).astype(np.float32),
        "SAP_QUALITY": np.zeros(n, dtype=np.int32),
        "CADENCENO": np.arange(n, dtype=np.int32),
    }, header=Header({"EXTNAME": "LIGHTCURVE", "BJDREFI": 2454833,
                      "BJDREFF": 0.0, "TUNIT2": "e-/s", "TUNIT3": "e-/s"}))
    write_fits(HDUList([PrimaryHDU(header=ph), table]), path)
    assert detect_filetype(open_fits(path)) == "KeplerLightCurve"
    lc = read(path)
    assert lc.time.format == "bkjd"
    assert lc.meta["TARGETID"] == 7603200
    assert lc.meta["AUTHOR"] == "Kepler"


def test_to_fits_mission_style_primary_header(tmp_path):
    """Exported primary headers carry the MAST-style keyword scaffold
    (reference fills data/lc-ext0-header.txt at lightcurve.py:2604-2643)."""
    import numpy as np
    from lightkurve_tpu import LightCurve
    lc = LightCurve(time=np.arange(5.0), flux=np.ones(5),
                    flux_err=np.full(5, 0.1))
    lc.meta["MISSION"] = "TESS"
    lc.meta["TELESCOP"] = "TESS"
    lc.meta["LABEL"] = "TIC 1234"
    hdus = lc.to_fits(aperture_mask=np.ones((3, 3), bool))
    h = hdus[0].header
    for kw in ("ORIGIN", "DATE", "CREATOR", "TELESCOP", "INSTRUME",
               "OBJECT", "RADESYS", "RA_OBJ", "DEC_OBJ", "EQUINOX",
               "PROCVER", "MISSION", "NEXTEND", "EXTNAME", "EXTVER"):
        assert kw in h, kw
    assert h["EQUINOX"] == 2000.0
    assert h["RADESYS"] == "ICRS"
    assert h["OBJECT"] == "TIC 1234"
    ap = hdus[-1].header
    assert ap["EXTNAME"] == "APERTURE"
    assert ap["INHERIT"] is True or ap["INHERIT"] == True  # noqa: E712
    # round-trips through our own parser
    path = str(tmp_path / "x.fits")
    lc.to_fits(path=path, aperture_mask=np.ones((3, 3), bool))
    from lightkurve_tpu.io.fits import open_fits
    back = open_fits(path)
    assert back[0].header["RADESYS"] == "ICRS"


def test_comment_cards_roundtrip(tmp_path):
    """COMMENT/HISTORY are commentary cards: repeatable, text-carrying,
    and surfaced as joined text by Header.get (astropy semantics —
    detect_filetype identifies EVEREST files by their COMMENT text,
    reference io/detect.py)."""
    h = Header({"TELESCOP": "Kepler", "COMMENT": "EVEREST pipeline"})
    h["COMMENT"] = "second line"
    assert h.get("COMMENT") == "EVEREST pipeline\nsecond line"
    table = BinTableHDU(data={"TIME": np.arange(3.0),
                              "FLUX": np.ones(3, np.float32)},
                        header=Header({"EXTNAME": "LIGHTCURVE"}))
    path = str(tmp_path / "comments.fits")
    write_fits(HDUList([PrimaryHDU(header=h), table]), path)
    from lightkurve_tpu.io.fits import open_fits
    h0 = open_fits(path)[0].header
    assert "EVEREST pipeline" in h0.get("COMMENT")
    assert "second line" in h0.get("COMMENT")
    from lightkurve_tpu.io.detect import detect_filetype
    assert detect_filetype(open_fits(path)) == "EVEREST"
