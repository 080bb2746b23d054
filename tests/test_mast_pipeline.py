"""Recorded-fixture MAST search pipeline tests.

Run the reference's query→get_product_list→join→filter chain
(reference ``search.py:892-1406``) offline against canned responses,
mirroring the reference's remote-data search tests
(``/root/reference/tests/test_search.py:40-130,310-315``).
"""
import json
import os

import numpy as np
import pytest

from lightkurve_tpu.mast import (RecordedMASTTransport,
                                 KEPLER_SC_MONTH_STARTS)
from lightkurve_tpu.search import (SearchError, search_lightcurve,
                                   search_targetpixelfile, search_tesscut)
from tests.io.test_fits import make_tess_lc_file

KEP10_RA, KEP10_DEC = 285.67942179, 50.24130576
K4914423_RA, K4914423_DEC = 297.5835, 40.98339
TIC_RA, TIC_DEC = 100.0, -30.0
PIMEN_RA, PIMEN_DEC = 84.291188, -80.469119


def _kepler_obs(target, quarter, cadence, ra, dec):
    """One Kepler-prime observation + its LC/TPF products (MAST-shaped:
    sequence_number unpopulated, quarter only in the description)."""
    kind = "Long" if cadence == "long" else "Short"
    code = "CLC" if cadence == "long" else "CSC"
    exptime = 1800 if cadence == "long" else 60
    obs_id = f"{target}_{cadence}_q{quarter}"
    obs = {"obs_id": obs_id, "obsid": abs(hash(obs_id)) % 10 ** 8,
           "target_name": target, "s_ra": ra, "s_dec": dec,
           "project": "Kepler", "provenance_name": "Kepler",
           "t_exptime": exptime, "sequence_number": None,
           "dataproduct_type": "timeseries",
           "description": f"Lightcurve {kind} Cadence ({code}) - Q{quarter}"}
    dates = ([f"2{quarter:03d}000000000"] if cadence == "long" else
             [KEPLER_SC_MONTH_STARTS[(quarter, m)] for m in (1, 2, 3)
              if (quarter, m) in KEPLER_SC_MONTH_STARTS])
    suffix_lc = "llc.fits" if cadence == "long" else "slc.fits"
    suffix_tp = "lpd-targ.fits.gz" if cadence == "long" \
        else "spd-targ.fits.gz"
    products = []
    for date in dates:
        for suffix in (suffix_lc, suffix_tp):
            fn = f"{target}-{date}_{suffix}"
            products.append({"obs_id": obs_id, "productFilename": fn,
                             "description": f"{kind} Cadence product",
                             "dataURI": f"mast:Kepler/url/{fn}"})
    return [obs], products


def _tess_obs(tic, sector, ra, dec, author="SPOC", exptime=120,
              local_lc=None):
    obs_id = f"tess_s{sector:04d}_{tic}"
    obs = {"obs_id": obs_id, "obsid": abs(hash(obs_id)) % 10 ** 8,
           "target_name": str(tic), "s_ra": ra, "s_dec": dec,
           "project": "TESS", "provenance_name": author,
           "t_exptime": exptime, "sequence_number": sector,
           "dataproduct_type": "timeseries",
           "description": f"TESS Sector {sector}"}
    products = []
    for suffix in ("lc.fits", "tp.fits"):
        fn = f"tess2018-s{sector:04d}-{int(tic):016d}-0120-s_{suffix}"
        row = {"obs_id": obs_id, "productFilename": fn,
               "description": "SPOC product",
               "dataURI": f"mast:TESS/product/{fn}"}
        if suffix == "lc.fits" and local_lc:
            row["local_path"] = local_lc
        products.append(row)
    return [obs], products


def _build_fixture(tmp_path):
    observations, products = [], []
    # Kepler-10: 15 LC quarters (no Q12), SC in Q11
    for q in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15]:
        o, p = _kepler_obs("kplr011904151", q, "long",
                           KEP10_RA, KEP10_DEC)
        observations += o
        products += p
    o, p = _kepler_obs("kplr011904151", 11, "short", KEP10_RA, KEP10_DEC)
    observations += o
    products += p
    # KIC 4914423: Q6 long + short (3 months)
    for cad in ("long", "short"):
        o, p = _kepler_obs("kplr004914423", 6, cad,
                           K4914423_RA, K4914423_DEC)
        observations += o
        products += p
    # TIC 273985862 in sectors 1+2, plus a neighbor 50" away in sector 1
    lc_path = make_tess_lc_file(str(tmp_path / "spoc_lc.fits"))
    o, p = _tess_obs(273985862, 1, TIC_RA, TIC_DEC, local_lc=lc_path)
    observations += o
    products += p
    o, p = _tess_obs(273985862, 2, TIC_RA, TIC_DEC)
    observations += o
    products += p
    neigh_ra = TIC_RA + 50.0 / 3600.0 / np.cos(np.deg2rad(TIC_DEC))
    o, p = _tess_obs(273985863, 1, neigh_ra, TIC_DEC)
    observations += o
    products += p
    # pi Mensae = TIC 261136679, sector 1
    o, p = _tess_obs(261136679, 1, PIMEN_RA, PIMEN_DEC)
    observations += o
    products += p
    # K2 split campaigns 9/10/11: two halves each, same seqno
    # (reference test_search_split_campaigns + test_split_k2_campaigns)
    for epic, camp in [("202975993", 11), ("228162462", 9),
                       ("228725972", 10), ("203830112", 11)]:
        for half in (1, 2):
            obs_id = f"ktwo{epic}_c{camp}{half}"
            observations.append(
                {"obs_id": obs_id, "target_name": f"ktwo{epic}",
                 "s_ra": 246.0, "s_dec": -24.0, "project": "K2",
                 "provenance_name": "K2", "t_exptime": 1800,
                 "sequence_number": camp, "dataproduct_type": "timeseries",
                 "description": f"K2 Campaign {camp}"})
            for suffix in ("llc.fits", "lpd-targ.fits.gz"):
                fn = f"ktwo{epic}-c{camp}{half}_{suffix}"
                products.append({"obs_id": obs_id, "productFilename": fn,
                                 "description": "K2 product",
                                 "dataURI": f"mast:K2/url/{fn}"})
    # small TIC (8 digits) — exact-name matching, issue #1073
    o, p = _tess_obs(74534430, 1, 200.0, 10.0)
    observations += o
    products += p
    # source confusion (#148): KIC 6507433 quarter 8 with a neighbor
    # 4 arcsec away; exact-name search must return only the target
    o, p = _kepler_obs("kplr006507433", 8, "long", 291.0, 41.9)
    observations += o
    products += p
    o, p = _kepler_obs("kplr006507999", 8, "long",
                       291.0 + 4.0 / 3600.0 / np.cos(np.deg2rad(41.9)),
                       41.9)
    observations += o
    products += p
    # overlapping targets (#718): KIC 5112705 quarter 11 with a
    # neighbor 0.8 arcsec away
    o, p = _kepler_obs("kplr005112705", 11, "long", 292.3, 40.4)
    observations += o
    products += p
    o, p = _kepler_obs("kplr005112706", 11, "long",
                       292.3, 40.4 + 0.8 / 3600.0)
    observations += o
    products += p
    # KIC 8462852 observed by TESS (sector 15) — KIC ids fall back to a
    # cone search for TESS data (#718 tail)
    o, p = _tess_obs(185336364, 15, 301.5644, 44.4568)
    observations += o
    products += p
    # TrES-2b sector 26: SPOC 2-min + QLP / TESS-SPOC FFI light curves
    tres_ra, tres_dec = 286.808, 49.3164
    o, p = _tess_obs(399860444, 26, tres_ra, tres_dec, author="SPOC",
                     exptime=120)
    observations += o
    products += p
    for author, fn in [
            ("QLP", "hlsp_qlp_tess_ffi_s0026-0000000399860444_tess_v01_"
                    "llc.fits"),
            ("TESS-SPOC", "hlsp_tess-spoc_tess_phot_0000000399860444-"
                          "s0026_tess_v1_lc.fits")]:
        obs_id = f"tess_s0026_399860444_{author}"
        observations.append(
            {"obs_id": obs_id, "target_name": "399860444",
             "s_ra": tres_ra, "s_dec": tres_dec, "project": "TESS",
             "provenance_name": author, "t_exptime": 1800,
             "sequence_number": 26, "dataproduct_type": "timeseries",
             "description": f"{author} FFI light curve"})
        products.append({"obs_id": obs_id, "productFilename": fn,
                         "description": f"{author} product",
                         "dataURI": f"mast:HLSP/url/{fn}"})
    # TESS FFI observations (TESScut source rows) at pi Men's position
    for sector in (1, 2):
        observations.append(
            {"obs_id": f"tess_ffi_s{sector:04d}",
             "target_name": f"TESS FFI: Camera 1 CCD 1 Sector {sector}",
             "s_ra": PIMEN_RA, "s_dec": PIMEN_DEC, "project": "TESS",
             "provenance_name": "SPOC", "t_exptime": 1426,
             "sequence_number": sector, "dataproduct_type": "image",
             "t_min": 58324.0 + 28 * (sector - 1),
             "description": "TESS FFI"})
    # local FFI stack backing sector-1 cutouts
    from lightkurve_tpu.io.fits import (HDUList, Header, ImageHDU,
                                        PrimaryHDU, write_fits)
    rng = np.random.default_rng(5)
    ffi_paths = []
    for i in range(4):
        img = 100.0 + rng.standard_normal((40, 40))
        img[18:21, 18:21] += 500.0          # star at pixel (19, 19)
        hdr = Header({"TELESCOP": "TESS", "TIME": 1325.0 + i * 0.02,
                      "CADENCENO": i,
                      "CRPIX1": 20.0, "CRPIX2": 20.0,
                      "CRVAL1": PIMEN_RA, "CRVAL2": PIMEN_DEC,
                      "CDELT1": -0.005833, "CDELT2": 0.005833,
                      "CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN"})
        path = str(tmp_path / f"ffi_s0001_{i:02d}.fits")
        write_fits(HDUList([PrimaryHDU(),
                            ImageHDU(data=img.astype(np.float32),
                                     header=hdr)]), path)
        ffi_paths.append(path)
    return {
        "resolver": {
            "kepler-10": [KEP10_RA, KEP10_DEC],
            "tic 273985862": [TIC_RA, TIC_DEC],
            "pi mensae": [PIMEN_RA, PIMEN_DEC],
            "pi men": [PIMEN_RA, PIMEN_DEC],
            "kic 5112705": [292.3, 40.4],
            "kic 8462852": [301.5644, 44.4568],
            "tres-2b": [286.808, 49.3164],
            "tic41336498": [10.0, 10.0],    # far from every FFI footprint
        },
        "observations": observations,
        "products": products,
        "ffi_sectors": {"1": ffi_paths},
    }


@pytest.fixture
def transport(tmp_path):
    return RecordedMASTTransport(_build_fixture(tmp_path))


def test_exact_kic_search_quarters(transport):
    """Mirrors reference test_search_targetpixelfile
    (tests/test_search.py:45-74): KIC 11904151 in 15 long-cadence
    quarters; quarter=11 hits, quarter=12 empty."""
    sr = search_targetpixelfile("KIC 11904151", mission="Kepler",
                                cadence="long", transport=transport)
    assert len(sr) == 15
    sr11 = search_targetpixelfile("KIC 11904151", mission="Kepler",
                                  cadence="long", quarter=11,
                                  transport=transport)
    assert len(sr11.unique_targets["target_name"]) == 1
    sr12 = search_targetpixelfile("KIC 11904151", mission="Kepler",
                                  cadence="long", quarter=12,
                                  transport=transport)
    assert len(sr12) == 0


def test_quarter1_does_not_match_quarter11(transport):
    """The quarter mask is an exact suffix match on the description
    (reference search.py:1341): quarter=1 must not return Q10/Q11."""
    sr = search_targetpixelfile("KIC 11904151", quarter=1, cadence="long",
                                transport=transport)
    assert len(sr) == 1
    assert "Quarter 01" in sr.table[0]["mission"]


def test_month_filter(transport):
    """Mirrors reference test_month (tests/test_search.py:310-315)."""
    sr = search_targetpixelfile("KIC 11904151", quarter=11, month=1,
                                cadence="short", transport=transport)
    assert len(sr) == 1
    sr = search_targetpixelfile("KIC 11904151", quarter=11, month=[1, 3],
                                cadence="short", transport=transport)
    assert len(sr) == 2
    dates = [r["productFilename"].split("-")[1].split("_")[0]
             for r in sr.table]
    assert KEPLER_SC_MONTH_STARTS[(11, 1)] in dates
    assert KEPLER_SC_MONTH_STARTS[(11, 3)] in dates


def test_cadence_counts(transport):
    """Mirrors reference tests/test_search.py:118-120: KIC 4914423 Q6 has
    four files under cadence='any' (1 LC + 3 SC months), one long."""
    sr = search_lightcurve("KIC 4914423", quarter=6, cadence="any",
                           author="Kepler", transport=transport)
    assert len(sr) == 4
    sr = search_lightcurve("KIC 4914423", quarter=6, cadence="long",
                           author="Kepler", transport=transport)
    assert len(sr) == 1


def test_cone_search_by_coordinates(transport):
    """Mirrors reference tests/test_search.py:122: 'ra, dec' strings
    resolve positionally."""
    sr = search_lightcurve("297.5835, 40.98339", quarter=6,
                           author="Kepler", cadence="long",
                           transport=transport)
    assert len(sr) == 1
    assert sr.table[0]["target_name"] == "kplr004914423"
    np.testing.assert_allclose(sr.ra, [K4914423_RA])
    np.testing.assert_allclose(sr.dec, [K4914423_DEC])


def test_tic_sectors_and_radius(transport):
    """Mirrors reference tests/test_search.py:74-79: TIC 273985862 in
    multiple sectors; sector=1 with a 100-arcsec cone catches the
    neighbor too."""
    sr = search_targetpixelfile("TIC 273985862", mission="TESS",
                                transport=transport)
    assert len(sr) > 1
    sr = search_targetpixelfile("TIC 273985862", author="SPOC", sector=1,
                                radius=100, transport=transport)
    assert len(sr) == 2
    assert sr.table[0]["target_name"] == "273985862"   # distance-sorted
    assert float(sr.distance.value[1]) == pytest.approx(50.0, rel=0.01)


def test_name_resolution_cone(transport):
    """pi Mensae resolves by name and returns its SPOC sector-1 TPF."""
    sr = search_targetpixelfile("pi Mensae", sector=1, author="SPOC",
                                transport=transport)
    assert len(sr) == 1
    assert sr.table[0]["target_name"] == "261136679"


def test_unresolvable_name_raises(transport):
    with pytest.raises(SearchError, match="resolve"):
        search_lightcurve("DOES_NOT_EXIST (UNIT TEST)",
                          transport=transport)


def test_split_campaign_halves(transport):
    """Mirrors reference test_search_split_campaigns
    (tests/test_search.py:85-96): K2 C11 yields both halves with a/b
    mission suffixes."""
    sr = search_targetpixelfile("EPIC 202975993", campaign=11,
                                cadence="long", transport=transport)
    assert len(sr) == 2
    missions = sorted(r["mission"] for r in sr.table)
    assert missions == ["K2 Campaign 11a", "K2 Campaign 11b"]


def test_mission_string_synthesis(transport):
    """Kepler quarter parsed from the description (sequence_number is
    unpopulated for Kepler prime, reference search.py:1043-1049)."""
    sr = search_lightcurve("KIC 11904151", quarter=6, cadence="long",
                           transport=transport)
    assert sr.table[0]["mission"] == "Kepler Quarter 06"
    assert sr.table[0]["author"] == "Kepler"


def test_int_target_disambiguation_warnings(transport, caplog):
    """Mirrors reference tests/test_search.py:101-107."""
    import logging
    with caplog.at_level(logging.WARNING, logger="lightkurve_tpu.mast"):
        search_lightcurve(-999, transport=transport)
    assert "correspond" in caplog.text


def test_download_through_transport(transport, tmp_path):
    """A fixture-backed product downloads into the cache dir and reads
    as a TessLightCurve."""
    sr = search_lightcurve("TIC 273985862", sector=1, author="SPOC",
                           transport=transport)
    assert len(sr) == 1
    lc = sr.download(download_dir=str(tmp_path / "cache"))
    assert lc.meta["TARGETID"] == 12345678
    assert os.path.exists(tmp_path / "cache" /
                          sr.table[0]["productFilename"])


def test_tesscut_offline_cutout(transport):
    """search_tesscut serves cutouts from the registered local FFI stack
    (offline re-design of reference search.py:522-594)."""
    sr = search_tesscut("pi Mensae", sector=1, transport=transport)
    assert len(sr) == 1
    row = sr.table[0]
    assert row["author"] == "TESScut"
    assert row["mission"] == "TESS Sector 01"
    tpf = sr.download(cutout_size=7)
    assert tpf.shape == (4, 7, 7)
    # the star injected at the FFI reference pixel lands mid-cutout
    med = np.nanmedian(np.asarray(tpf.flux.value), axis=0)
    r, c = np.unravel_index(np.nanargmax(med), med.shape)
    assert abs(r - 3) <= 1 and abs(c - 3) <= 1


def test_tesscut_unregistered_sector_raises(transport):
    sr = search_tesscut("pi Mensae", sector=2, transport=transport)
    assert len(sr) == 1
    with pytest.raises(SearchError, match="FFI stack"):
        sr.download(cutout_size=5)


def test_env_fixture_file_roundtrip(tmp_path, monkeypatch):
    """$LIGHTKURVE_TPU_MAST_FIXTURES turns on the recorded transport for
    plain search calls (no transport= argument)."""
    fx = _build_fixture(tmp_path)
    path = tmp_path / "mast_fixtures.json"
    path.write_text(json.dumps(fx))
    monkeypatch.setenv("LIGHTKURVE_TPU_MAST_FIXTURES", str(path))
    sr = search_lightcurve("KIC 11904151", quarter=3, cadence="long")
    assert len(sr) == 1
    assert sr.table[0]["mission"] == "Kepler Quarter 03"


def test_exact_name_query_skips_cone(transport):
    """KIC ids query by exact MAST target_name (zero-padded kplr id,
    reference search.py:1177-1182) — no resolver involvement."""
    search_lightcurve("KIC 11904151", quarter=3, cadence="long",
                      transport=transport)
    kinds = [c[1].get("target_name") for c in transport.calls
             if c[0] == "query_criteria"]
    assert "kplr011904151" in kinds


def test_small_tic_exact_name_no_cone(transport):
    """Mirrors reference test_search_lightcurve_with_small_tic (#1073):
    a TIC with < 9 digits matches by exact target_name — no cone
    fallback fires."""
    sr = search_lightcurve("TIC 74534430", transport=transport)
    assert len(sr) > 0
    cones = [c for c in transport.calls
             if c[0] == "query_criteria" and "objectname" in c[1]]
    assert not cones, "fallback cone search should not be used"
    # control: a nonexistent TIC does fall back to the cone search
    with pytest.raises(SearchError):
        search_lightcurve("TIC 0", transport=transport)
    cones = [c for c in transport.calls
             if c[0] == "query_criteria" and "objectname" in c[1]]
    assert cones, "fallback cone search expected"


def test_source_confusion(transport):
    """Mirrors reference test_source_confusion (#148): exact-name search
    must not return the neighbor 4 arcsec away."""
    sr = search_targetpixelfile("KIC 6507433", quarter=8,
                                transport=transport)
    assert len(sr) == 1
    assert sr.table[0]["target_name"] == "kplr006507433"


def test_overlapping_targets_718(transport):
    """Mirrors reference test_overlapping_targets_718: no radius →
    only the requested target; radius=1 arcsec → neighbors too; and a
    KIC identifier still works for a TESS search."""
    sr = search_lightcurve("KIC 5112705", quarter=11, author="Kepler",
                           transport=transport)
    assert len(sr) == 1
    assert sr.target_name[0] == "kplr005112705"
    sr = search_lightcurve("KIC 5112705", quarter=11, author="Kepler",
                           radius=1.0, transport=transport)
    assert len(sr) > 1
    sr = search_targetpixelfile("KIC 8462852", mission="TESS", sector=15,
                                author="spoc", transport=transport)
    assert len(sr) == 1


def test_indexerror_631(transport):
    """Mirrors reference test_indexerror_631: radius + sector search
    returns cleanly."""
    sr = search_lightcurve("KIC 8462852", sector=15, radius=1,
                           author="spoc", transport=transport)
    assert len(sr) == 1


def test_ffi_hlsp_authors(transport):
    """Mirrors reference test_ffi_hlsp: author='any' surfaces SPOC, QLP
    and TESS-SPOC products for the same target/sector."""
    sr = search_lightcurve("TrES-2b", mission="tess", author="any",
                           sector=26, transport=transport)
    assert "QLP" in sr.author
    assert "TESS-SPOC" in sr.author
    assert "SPOC" in sr.author
    sr = search_targetpixelfile("TrES-2b", mission="tess", author="any",
                                sector=26, transport=transport)
    assert "SPOC" in sr.author


def test_qlp_and_spoc_ffi_search(transport):
    """Mirrors the search halves of reference test_qlp_ffi_lightcurve /
    test_spoc_ffi_lightcurve: author filter + 30-min FFI exptime."""
    sr = search_lightcurve("TrES-2b", sector=26, author="qlp",
                           transport=transport)
    assert len(sr) == 1
    assert sr.author[0] == "QLP"
    assert float(sr.exptime.value[0]) == 1800.0
    sr = search_lightcurve("TrES-2b", sector=26, author="tess-spoc",
                           transport=transport)
    assert len(sr) == 1
    assert sr.author[0] == "TESS-SPOC"
    assert float(sr.exptime.value[0]) == 1800.0


def test_split_k2_campaigns(transport):
    """Mirrors reference test_split_k2_campaigns: halves appear as
    separate 'a'/'b' rows for campaigns 9, 10, and 11."""
    for epic, camp in [("EPIC 228162462", 9), ("EPIC 228725972", 10),
                       ("EPIC 203830112", 11)]:
        sr = search_targetpixelfile(epic, cadence="long", campaign=camp,
                                    transport=transport)
        assert sr.table[0]["mission"] == f"K2 Campaign {camp:02d}a"
        assert sr.table[1]["mission"] == f"K2 Campaign {camp:02d}b"


def test_search_with_coordinate_strings(transport):
    """Mirrors reference test_search_with_skycoord: name, decimal-string
    and sexagesimal-string searches return the same products."""
    sr_name = search_targetpixelfile("KIC 11904151", mission="Kepler",
                                     cadence="long", transport=transport)
    assert len(sr_name) == 15
    sr_dec = search_targetpixelfile("285.67942179 +50.24130576",
                                    mission="Kepler", cadence="long",
                                    transport=transport)
    np.testing.assert_array_equal(sr_name.filename, sr_dec.filename)
    # sexagesimal resolves through the same path (2" radius covers the
    # rounding of the sexagesimal representation)
    sr_sex = search_targetpixelfile("19:02:43.06 +50:14:28.7",
                                    mission="Kepler", cadence="long",
                                    radius=2.0, transport=transport)
    np.testing.assert_array_equal(sr_name.filename, sr_sex.filename)


def test_sexagesimal_resolution(transport):
    ra, dec = transport.resolve_object("19:02:43.1 +50:14:28.7")
    assert ra == pytest.approx(285.679583, abs=1e-5)
    assert dec == pytest.approx(50.241306, abs=1e-5)
    ra, dec = transport.resolve_object("01:30:00 -10:30:00")
    assert ra == pytest.approx(22.5)
    assert dec == pytest.approx(-10.5)


def test_tesscut_empty_beyond_footprint(transport):
    """Mirrors reference test_issue_472: a target outside every FFI
    returns an empty SearchResult, not an exception."""
    sr = search_tesscut("TIC41336498", sector=2, transport=transport)
    assert len(sr) == 0


def test_tesscut_repr(transport):
    """Mirrors reference test_tesscut_795: repr of a TESScut result."""
    text = repr(search_tesscut("pi Mensae", transport=transport))
    assert "TESScut" in text


def test_tesscut_download_sizes(transport):
    """Mirrors reference test_search_tesscut_download: default 5x5,
    rectangular sizes, and download_all collections."""
    sr = search_tesscut("pi Mensae", sector=1, transport=transport)
    tpf = sr.download()
    assert tpf.shape[1:] == (5, 5)
    rect = sr.download(cutout_size=(3, 5))
    assert rect.shape[1:] == (3, 5)
    coll = sr.download_all(cutout_size=4)
    assert len(coll) == 1
    assert coll[0].shape[1:] == (4, 4)


def test_download_flux_column_kwarg(transport, tmp_path):
    """Mirrors reference test_download_flux_column: reader kwargs pass
    through download()."""
    sr = search_lightcurve("TIC 273985862", sector=1, author="SPOC",
                           transport=transport)
    lc = sr.download(download_dir=str(tmp_path / "c"),
                     flux_column="sap_flux")
    np.testing.assert_array_equal(np.asarray(lc.flux.value),
                                  np.asarray(lc.sap_flux.value))


def test_corrupt_cached_download(transport, tmp_path):
    """Mirrors reference test_corrupt_download_handling_case_empty
    (#511/#1184): a corrupt cached file yields a 'may be corrupt'
    error."""
    sr = search_lightcurve("TIC 273985862", sector=1, author="SPOC",
                           transport=transport)
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / sr.table[0]["productFilename"]).write_bytes(b"")
    with pytest.raises(SearchError, match="may be corrupt"):
        sr.download(download_dir=str(cache))


def test_download_error_surfaces_product(transport):
    """Mirrors the spirit of reference test_mast_http_error_handling
    (#1211): a failed product materialization names the product."""
    sr = search_lightcurve("KIC 11904151", quarter=3, cadence="long",
                           transport=transport)
    from lightkurve_tpu.utils import LightkurveError
    with pytest.raises(LightkurveError,
                       match="kplr011904151.*llc.fits"):
        sr.download()


def test_display_extra_columns_nonexistent(transport):
    """Mirrors reference
    test_customize_search_result_display_case_nonexistent_column."""
    sr = search_lightcurve("TIC 273985862", sector=1, author="SPOC",
                           transport=transport)
    sr.display_extra_columns = ["foo_col"]
    assert "foo_col" not in repr(sr)
    sr.display_extra_columns = ["sequence_number"]
    assert "sequence_number" in repr(sr)


def test_name_resolving_regression_764(transport):
    """Mirrors reference test_name_resolving_regression_764 (#764,
    skipped upstream): 'EPIC250105131' and 'EPIC 250105131' must resolve
    identically — the id regex treats the space as optional, so both hit
    the same exact target_name query."""
    for target in ("EPIC 202975993", "EPIC202975993", "epic202975993"):
        sr = search_targetpixelfile(target, campaign=11,
                                    transport=transport)
        assert len(sr) == 2, target
        assert sr.table[0]["target_name"] == "ktwo202975993"
