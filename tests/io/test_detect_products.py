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


@pytest.mark.parametrize(
    "sector, flux_err_colname_expected, qlp_low_precision_bitmask", [
        (11, "KSPSAP_FLUX_ERR", 2 ** 12),   # sectors 1-55
        (56, "DET_FLUX_ERR", 2 ** 30),      # sectors 56+
    ])
def test_qlp(tmp_path, sector, flux_err_colname_expected,
             qlp_low_precision_bitmask):
    """Mirror of reference io/test_qlp.py:test_qlp on synthetic files:
    sector-dependent flux_err column and the QLP low-precision bit that
    only the hard/hardest bitmasks remove."""
    from lightkurve_tpu.io.readers import read_qlp_lightcurve
    n = 30
    quality = np.zeros(n, np.int32)
    quality[5] = qlp_low_precision_bitmask
    sap = np.linspace(0.9, 1.1, n).astype(np.float32)
    cols = {
        "SAP_FLUX": sap,
        "KSPSAP_FLUX_ERR": np.full(n, 0.1, np.float32),
        "DET_FLUX_ERR": np.full(n, 0.2, np.float32),
        "QUALITY": quality,
    }
    table = _base_table(cols=cols)
    path = _write(tmp_path, "qlp.fits",
                  {"ORIGIN": "MIT/QLP", "TICID": 7, "TELESCOP": "TESS",
                   "SECTOR": sector}, table)
    from lightkurve_tpu.io import open_fits
    assert detect_filetype(open_fits(path)) == "QLP"
    lc = read_qlp_lightcurve(path, quality_bitmask=0)
    assert lc.meta["FLUX_ORIGIN"] == "sap_flux"
    np.testing.assert_array_equal(lc.flux.value, sap)
    expected_err = 0.1 if flux_err_colname_expected == "KSPSAP_FLUX_ERR" \
        else 0.2
    np.testing.assert_allclose(lc.flux_err.value, expected_err, rtol=1e-6)
    assert (np.asarray(lc["quality"]) == qlp_low_precision_bitmask).any()
    lc = read_qlp_lightcurve(path, quality_bitmask="default")
    assert (np.asarray(lc["quality"]) & qlp_low_precision_bitmask).any()
    lc = read_qlp_lightcurve(path, quality_bitmask="hard")
    assert not (np.asarray(lc["quality"]) & qlp_low_precision_bitmask).any()
    lc = read_qlp_lightcurve(path, quality_bitmask="hardest")
    assert not (np.asarray(lc["quality"]) & qlp_low_precision_bitmask).any()
    assert lc.meta["NORMALIZED"] is True


def test_tasoc_ppm_units(tmp_path):
    """Mirror of reference test_units.py:test_tasoc_ppm_units (#956): the
    TASOC ppm column unit parses cleanly."""
    n = 30
    table = _base_table(cols={
        "FLUX_CORR": np.ones(n, np.float32),
        "FLUX_RAW": np.ones(n, np.float32)},
        ext_extra={"TUNIT2": "ppm"})
    path = _write(tmp_path, "tasoc.fits",
                  {"ORIGIN": "TASOC/Aarhus", "TICID": 9,
                   "TELESCOP": "TESS"}, table)
    lc = read(path)
    assert str(lc["flux_corr"].unit) == "ppm"
    assert "Unrecognized" not in repr(lc["flux_corr"].unit)


def test_read_cdips(tmp_path, rng):
    """Mirror of reference io/test_cdips.py:test_read_cdips on a synthetic
    file: every IFL#/IRM#/TFA#/PCA# aperture column is selectable, time
    comes from TMID_BJD, the string quality flags of the SAME aperture
    filter the rows, and time/flux stay consistent with the file through
    QUALITY_MASK."""
    from lightkurve_tpu.io.readers import read_cdips_lightcurve
    n = 30
    cols = {"TMID_BJD": 1500.0 + np.arange(n) * 0.02}
    exts = [f"{kind}{ap}" for kind in ("IFL", "IRM", "TFA", "PCA")
            for ap in (1, 2, 3)]
    for i, ext in enumerate(exts):
        cols[ext] = np.full(n, 10.0 + i, np.float32)
    for ap in (1, 2, 3):
        cols[f"IFE{ap}"] = np.full(n, 0.25, np.float32)
        cols[f"IRE{ap}"] = np.full(n, 0.5, np.float32)
        q = np.array(["G"] * n, dtype="S1")
        q[ap] = b"B"          # a different bad cadence per aperture
        cols[f"IRQ{ap}"] = q
    table = _base_table(cols=cols)
    path = _write(tmp_path, "cdips.fits",
                  {"ORIGIN": "CDIPS pipeline", "TICID": 7,
                   "TELESCOP": "TESS"}, table)
    from lightkurve_tpu.io import open_fits
    f = open_fits(path)
    fluxes = []
    for ext in exts:
        lc = read_cdips_lightcurve(path, flux_column=ext)
        assert type(lc).__name__ == "TessLightCurve"
        assert lc.meta["FLUX_ORIGIN"] == ext.lower()
        assert len(lc) == n - 1     # that aperture's "B" cadence dropped
        np.testing.assert_array_equal(
            f[1].data["TMID_BJD"][lc.meta["QUALITY_MASK"]], lc.time.value)
        np.testing.assert_array_equal(
            f[1].data[ext][lc.meta["QUALITY_MASK"]], lc.flux.value)
        fluxes.append(lc.flux.value)
    for i in range(len(exts) - 1):
        assert not np.array_equal(fluxes[i], fluxes[i + 1])
    assert lc.meta["QUALITY_BITMASK"] == 36
    # instrumental errors only on request: flux columns get ife#,
    # magnitude columns ire# (reference io/cdips.py:47-53); without them
    # the standard flux_err column stays all-NaN
    assert np.isnan(read_cdips_lightcurve(path).flux_err.value).all()
    lc = read_cdips_lightcurve(path, flux_column="IFL2",
                               include_inst_errs=True)
    np.testing.assert_allclose(lc.flux_err.value, 0.25)
    lc = read_cdips_lightcurve(path, flux_column="IRM2",
                               include_inst_errs=True)
    np.testing.assert_allclose(lc.flux_err.value, 0.5)


def test_read_tasoc(tmp_path):
    """Mirror of reference io/test_tasoc.py:test_read_tasoc: the
    flux_column choice lands in flux and FLUX_ORIGIN; TASOC curves are
    NORMALIZED."""
    from lightkurve_tpu.io.readers import read_tasoc_lightcurve
    n = 30
    raw = np.linspace(90.0, 110.0, n).astype(np.float32)
    table = _base_table(cols={"FLUX_CORR": np.ones(n, np.float32),
                              "FLUX_RAW": raw})
    path = _write(tmp_path, "tasoc.fits",
                  {"ORIGIN": "TASOC/Aarhus", "TICID": 9,
                   "TELESCOP": "TESS"}, table)
    lc = read_tasoc_lightcurve(path, flux_column="FLUX_RAW")
    assert lc.meta["FLUX_ORIGIN"] == "flux_raw"
    np.testing.assert_array_equal(raw, lc.flux.value)
    assert lc.meta["NORMALIZED"] is True


def test_read_kepseismic(tmp_path):
    """Mirror of reference io/test_kepseismic.py:test_read_kepseismic:
    flux sums match the file; the product is NORMALIZED, on the MJD
    scale, and a KeplerLightCurve."""
    from lightkurve_tpu.io.readers import read_kepseismic_lightcurve
    n = 30
    flux = np.linspace(0.99, 1.01, n).astype(np.float32)
    table = _base_table(time_format_card=("MJDREF", 0.0),
                        cols={"FLUX": flux})
    path = _write(tmp_path, "kepseismic.fits",
                  {"ORIGIN": "CEA & SSI", "KEPLERID": 3,
                   "TELESCOP": "Kepler"}, table)
    lc = read_kepseismic_lightcurve(path)
    assert type(lc).__name__ == "KeplerLightCurve"
    assert lc.flux.value.dtype == np.float32   # file dtype preserved
    assert np.sum(flux) == np.sum(lc.flux.value)
    assert lc.time.format == "mjd"
    assert lc.meta["NORMALIZED"] is True


def test_read_k2sff_extensions(tmp_path):
    """Mirror of reference io/test_k2sff.py:test_read_k2sff: each
    extension (BESTAPER, CIRC_APER9, ...) is independently readable and
    carries its own FCOR flux."""
    from lightkurve_tpu.io.readers import read_k2sff_lightcurve
    n = 30
    hdus = [PrimaryHDU(header=Header({"KEPLERID": 5,
                                      "TELESCOP": "Kepler"}))]
    for i, extname in enumerate(["BESTAPER", "CIRC_APER9"]):
        hdus.append(BinTableHDU(data={
            "T": 2000.0 + np.arange(n) * 0.02,
            "FRAW": np.ones(n, np.float32),
            "FCOR": np.full(n, 1.0 + i, np.float32),
            "ARCLENGTH": np.ones(n, np.float32)},
            header=Header({"EXTNAME": extname, "BJDREFI": 2454833,
                           "BJDREFF": 0.0, "TTYPE4": "ARCLENGTH"})))
    path = str(tmp_path / "k2sff.fits")
    write_fits(HDUList(hdus), path)
    from lightkurve_tpu.io import open_fits
    f = open_fits(path)
    fluxes = []
    for ext in ["BESTAPER", "CIRC_APER9"]:
        lc = read_k2sff_lightcurve(path, ext=ext)
        assert type(lc).__name__ == "KeplerLightCurve"
        np.testing.assert_array_equal(f[ext].data["T"], lc.time.value)
        np.testing.assert_array_equal(f[ext].data["FCOR"], lc.flux.value)
        fluxes.append(lc.flux.value)
    assert not np.array_equal(fluxes[0], fluxes[1])


def test_read_tglc(tmp_path):
    """Mirror of reference io/test_tglc.py:test_tglc plus the reader's
    unit/meta repairs: cal_psf_flux default, integer cadenceno from
    CADENCE_NUM, electron/s re-added on raw columns, TIC meta strings."""
    from lightkurve_tpu.io.readers import read_tglc_lightcurve
    n = 30
    flags = np.zeros(n, np.int32)
    flags[3] = 1      # AttitudeTweak: dropped by "default", kept by 0
    cal = np.linspace(0.99, 1.01, n).astype(np.float32)
    table = _base_table(cols={
        "CAL_PSF_FLUX": cal,
        "CAL_APER_FLUX": cal * 1.01,
        "PSF_FLUX": (cal * 100).astype(np.float32),
        "APERTURE_FLUX": (cal * 101).astype(np.float32),
        "BACKGROUND": np.full(n, 5.0, np.float32),
        "TESS_FLAGS": flags,
        "CADENCE_NUM": np.arange(100, 100 + n, dtype=np.int32)})
    path = _write(tmp_path, "tglc.fits",
                  {"ORIGIN": "UCSB/TGLC", "TICID": 7, "TELESCOP": "TESS",
                   "OBJECT": "gaiaid-462"}, table)
    lc = read_tglc_lightcurve(path, quality_bitmask=0)
    assert lc.meta["AUTHOR"] == "TGLC"
    assert lc.meta["FLUX_ORIGIN"] == "cal_psf_flux"
    np.testing.assert_array_equal(lc.flux.value, cal)
    assert np.issubdtype(np.asarray(lc["cadenceno"]).dtype, np.integer)
    # unit repairs (reference io/tglc.py:60-79)
    assert str(lc["psf_flux"].unit) == "electron / s"
    assert str(lc["background"].unit) == "electron / s"
    assert str(lc["cal_aper_flux"].unit) == ""
    # TIC meta compatibility block (reference io/tglc.py:88-95)
    assert lc.meta["TARGETID"] == 7
    assert lc.meta["OBJECT"] == "TIC 7"
    assert lc.meta["LABEL"] == "TIC 7"
    assert lc.meta["NORMALIZED"] is True
    # default bitmask drops the flagged cadence
    lc_def = read_tglc_lightcurve(path)
    assert len(lc_def) == n - 1


def test_read_everest_cadn(tmp_path):
    """EVEREST's cadence numbers live in CADN (reference io/everest.py:45)."""
    from lightkurve_tpu.io.readers import read_everest_lightcurve
    n = 30
    table = _base_table(time_format_card=("BJDREFI", 2454833), cols={
        "FLUX": np.ones(n, np.float32),
        "QUALITY": np.zeros(n, np.int32),
        "CADN": np.arange(500, 500 + n)})
    path = _write(tmp_path, "everest.fits",
                  {"MISSION": "K2", "KEPLERID": 11, "TELESCOP": "Kepler"},
                  table)
    lc = read_everest_lightcurve(path)
    np.testing.assert_array_equal(np.asarray(lc["cadenceno"]),
                                  np.arange(500, 500 + n))


def test_detect_and_read_pathos(tmp_path, rng):
    """Mirrors reference io/test_pathos.py::test_detect_pathos and
    ::test_read_pathos on a synthetic file: PATHOS detection via its
    column signature, every PSF/AP# flux extension selectable with
    FLUX_ORIGIN recorded, time/flux consistent with the file through
    QUALITY_MASK, and distinct extensions giving distinct fluxes."""
    from numpy.testing import assert_array_equal
    from lightkurve_tpu.io.readers import read_pathos_lightcurve
    from lightkurve_tpu.io import open_fits
    n = 30
    exts = ["PSF_FLUX_RAW", "PSF_FLUX_COR"]
    exts += [f"AP{ap}_FLUX_RAW" for ap in (1, 2, 3, 4)]
    exts += [f"AP{ap}_FLUX_COR" for ap in (1, 2, 3, 4)]
    cols = {e: np.full(n, 10.0 + i, np.float32)
            for i, e in enumerate(exts)}
    cols["SKY_LOCAL"] = np.ones(n, np.float32)
    cols["DQUALITY"] = np.zeros(n, np.int32)
    table = _base_table(cols=cols)
    path = _write(tmp_path, "pathos.fits",
                  {"TELESCOP": "TESS", "TICID": 93270923, "SECTOR": 8},
                  table)
    hdul = open_fits(path)
    assert detect_filetype(hdul) == "PATHOS"
    fluxes = []
    for ext in exts:
        lc = read_pathos_lightcurve(path, flux_column=ext)
        assert type(lc).__name__ == "TessLightCurve"
        assert lc.meta["FLUX_ORIGIN"] == ext.lower()
        assert_array_equal(
            np.asarray(hdul[1].data["TIME"])[lc.meta["QUALITY_MASK"]],
            lc.time.value)
        assert_array_equal(
            np.asarray(hdul[1].data[ext])[lc.meta["QUALITY_MASK"]],
            lc.flux.value)
        fluxes.append(np.asarray(lc.flux.value))
    for i in range(len(fluxes) - 1):
        assert not np.array_equal(fluxes[i], fluxes[i + 1])


def test_gsfc_eleanor_lite(tmp_path):
    """Mirrors reference io/test_eleanor.py::test_gsfc_eleanor_lite on a
    synthetic file: GSFC-ELEANOR-LITE author detection, corr_flux
    selection, the two extra eleanor quality bits (2^17/2^18) surviving
    'default' but removed by 'hardest', and integer cadence numbers."""
    from lightkurve_tpu.io.readers import read_eleanor_lightcurve
    from lightkurve_tpu.io import open_fits
    n = 30
    quality = np.zeros(n, np.int32)
    quality[3] = 2 ** 17
    quality[4] = 2 ** 18
    cols = {"CORR_FLUX": np.linspace(0.9, 1.1, n).astype(np.float32),
            "RAW_FLUX": np.ones(n, np.float32),
            "FLUX_ERR": np.full(n, 0.1, np.float32),
            "QUALITY": quality,
            "X_CENTROID": np.ones(n, np.float32),
            "Y_CENTROID": np.ones(n, np.float32),
            "FFIINDEX": np.arange(n, dtype=float)}
    path = _write(tmp_path, "gsfc.fits",
                  {"TELESCOP": "TESS", "LITE": True,
                   "PCORIGIN": "POSTCARD", "TVERSION": "1.0",
                   "GITHUB": "https://github.com/afeinstein20/eleanor",
                   "TICID": 336732616, "SECTOR": 1},
                  _base_table(cols=cols))
    hdul = open_fits(path)
    assert detect_filetype(hdul) == "ELEANOR"
    lc = read_eleanor_lightcurve(path, quality_bitmask="default")
    assert lc.meta["AUTHOR"] == "GSFC-ELEANOR-LITE"
    assert lc.meta["FLUX_ORIGIN"] == "corr_flux"
    q = np.asarray(lc["quality"])
    assert ((q & 2 ** 17) != 0).any() and ((q & 2 ** 18) != 0).any()
    lc = read_eleanor_lightcurve(path, quality_bitmask="hardest")
    assert not (np.asarray(lc["quality"]) & (2 ** 17 | 2 ** 18)).any()
    assert np.issubdtype(np.asarray(lc["cadenceno"]).dtype, np.integer)
