"""Solar-system-object queries against recorded SkyBot responses.

Mirrors the reference's ``test_SSOs`` (``tests/test_lightcurve.py:1553``,
permanently skipped upstream because the live SkyBot API is flaky) with
the network call replaced by recorded response text — the whole URL
construction / error-flag / parsing pipeline runs
(reference ``utils.py:705-794``).
"""
import json

import numpy as np
import pytest

from lightkurve_tpu import LightCurve
from lightkurve_tpu.utils import _query_solar_system_objects

# SkyBot conesearch text response: two preamble lines, a pipe-delimited
# header, then one row per object (the reference parses exactly this
# shape with read_csv(delimiter="|", skiprows=2))
SKYBOT_ONE_OBJECT = """# Flag: 1
# Count: 1
# Num | Name | RA(h) | DE(deg) | Class | Mv | Err(arcsec) | d(arcsec)
 138846 | 2000 VJ61 | 5.61 | -72.23 | MB>Outer | 16.6 | 0.1 | 21.0
"""

SKYBOT_EMPTY = """# Flag: 1
# Count: 0
"""

SKYBOT_ERROR = """# Flag: -1
# Error: wrong parameters
"""


def _asteroid_lc(n=3):
    lc = LightCurve(time=2458400.5 + np.arange(n) * 0.02,
                    flux=np.ones(n), flux_err=np.full(n, 1e-3))
    lc.meta["RA"] = 84.2
    lc.meta["DEC"] = -72.2
    lc.meta["MISSION"] = "TESS"
    lc.meta["TIMEFMT"] = "jd"
    return lc


def _fetch_factory(responses, seen):
    def fetch(url):
        seen.append(url)
        for key, text in responses.items():
            if key in url:
                return text
        return SKYBOT_EMPTY
    return fetch


def test_sso_pipeline_single_object():
    """One asteroid at one epoch: parsed Num/Name/Class/Mv/epoch row."""
    seen = []
    fetch = _fetch_factory({"EPOCH=": SKYBOT_ONE_OBJECT}, seen)
    df = _query_solar_system_objects(84.2, -72.2, [2458432.1],
                                     location="tess", fetch=fetch)
    assert len(df) == 1
    assert df.Name.iloc[0].strip() == "2000 VJ61"
    assert df.Class.iloc[0].strip() == "MB>Outer"
    assert float(df.Mv.iloc[0]) == pytest.approx(16.6)
    assert float(df.epoch.iloc[0]) == 2458432.1
    # TESS uses observer location C57; Kepler C55 (reference :744-747)
    assert "-loc=C57" in seen[0]
    fetch2 = _fetch_factory({"EPOCH=": SKYBOT_ONE_OBJECT}, seen)
    _query_solar_system_objects(84.2, -72.2, [2458432.1],
                                location="kepler", fetch=fetch2)
    assert "-loc=C55" in seen[-1]


def test_sso_error_flag_raises():
    fetch = _fetch_factory({"EPOCH=": SKYBOT_ERROR}, [])
    with pytest.raises(IOError, match="SkyBot"):
        _query_solar_system_objects(84.2, -72.2, [2458432.1],
                                    location="tess", fetch=fetch)


def test_sso_empty_returns_none():
    fetch = _fetch_factory({}, [])
    assert _query_solar_system_objects(84.2, -72.2, [2458432.1],
                                       location="tess", fetch=fetch) is None


def test_lc_query_sso_all_mask_forms():
    """Mirrors reference test_SSOs: every accepted cadence_mask form
    yields the single recorded object."""
    lc = _asteroid_lc(n=1)
    epoch = float(np.asarray(lc.time.jd)[0])
    responses = {f"EPOCH={epoch}": SKYBOT_ONE_OBJECT}
    for cm in ("all", np.asarray([True]), [True], True):
        seen = []
        res = lc.query_solar_system_objects(
            cadence_mask=cm, cache=False,
            fetch=_fetch_factory(responses, seen))
        assert len(res) == 1, cm
    res, mask = lc.query_solar_system_objects(
        cadence_mask=np.asarray([True]), cache=True, return_mask=True,
        fetch=_fetch_factory(responses, []))
    assert len(mask) == len(lc.flux)
    assert mask.sum() == 1


def test_lc_query_sso_radius_defaults():
    """Default cone radius: 21 px (TESS) / 4 px (Kepler) × 15 arcsec
    (reference lightcurve.py:1952-1960)."""
    lc = _asteroid_lc(n=1)
    seen = []
    lc.query_solar_system_objects(cadence_mask="all",
                                  fetch=_fetch_factory({}, seen))
    assert f"-bd={21 * 15 / 3600.0}" in seen[0]
    lc.meta["MISSION"] = "Kepler"
    seen2 = []
    lc.query_solar_system_objects(cadence_mask="all",
                                  fetch=_fetch_factory({}, seen2))
    assert f"-bd={4 * 15 / 3600.0}" in seen2[0]


def test_lc_query_sso_skips_nan_flux():
    """NaN-flux cadences are excluded before querying (reference
    lightcurve.py:1936-1943)."""
    lc = _asteroid_lc(n=3)
    flux = np.asarray(lc.flux.value).copy()
    flux[1] = np.nan
    lc.flux = flux
    seen = []
    lc.query_solar_system_objects(cadence_mask="all",
                                  fetch=_fetch_factory({}, seen))
    assert len(seen) == 2


def test_sso_env_fixture_roundtrip(tmp_path, monkeypatch):
    """$LIGHTKURVE_TPU_SKYBOT_FIXTURES replays responses keyed by epoch
    without any fetch= argument."""
    lc = _asteroid_lc(n=1)
    epoch = float(np.asarray(lc.time.jd)[0])
    fx = tmp_path / "skybot.json"
    fx.write_text(json.dumps({str(epoch): SKYBOT_ONE_OBJECT}))
    monkeypatch.setenv("LIGHTKURVE_TPU_SKYBOT_FIXTURES", str(fx))
    res = lc.query_solar_system_objects(cadence_mask="all", cache=False)
    assert len(res) == 1
    assert res.Name.iloc[0].strip() == "2000 VJ61"


def test_tpf_sso_asteroid_crossing():
    """End-to-end: a synthetic asteroid-crossing TPF (standing in for
    the reference's tests/data/asteroid_test.fits) → photometry →
    recorded SkyBot identification at the crossing epochs."""
    from tests.synthetic import make_synthetic_tpf
    tpf = make_synthetic_tpf(n_cadences=6)
    # inject a moving source crossing the aperture at cadences 2-3
    flux = np.asarray(tpf.hdu[1].data["FLUX"], dtype=np.float32)
    flux[2, 2, 1] += 500.0
    flux[3, 2, 3] += 500.0
    tpf.hdu[1].data["FLUX"][:] = flux
    lc = tpf.to_lightcurve(aperture_mask="all")
    lc.meta["MISSION"] = "TESS"
    lc.meta.setdefault("RA", 84.2)
    lc.meta.setdefault("DEC", -72.2)
    jd = np.asarray(lc.time.jd)
    responses = {f"EPOCH={jd[2]}": SKYBOT_ONE_OBJECT,
                 f"EPOCH={jd[3]}": SKYBOT_ONE_OBJECT}
    res, mask = lc.query_solar_system_objects(
        cadence_mask="all", return_mask=True,
        fetch=_fetch_factory(responses, []))
    assert len(res) == 2
    assert mask.sum() == 2
    assert set(np.flatnonzero(mask)) == {2, 3}
