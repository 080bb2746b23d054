"""HTTP MAST transport tests against a recorded mock Mashup server.

The mock implements MAST's Mashup/invoke protocol (the API astroquery
wraps; reference ``search.py:1115``) over the same observation/product
fixtures the recorded-transport tests use, so the HTTP client is proven
equivalent to :class:`RecordedMASTTransport` through the full
query→join→filter pipeline.  One test drives urllib against a real
localhost ``http.server`` to cover the default opener end-to-end.
"""
import json
import threading
import urllib.parse

import numpy as np
import pytest

from lightkurve_tpu.mast import (RecordedMASTTransport, ResolverError,
                                 query_mast, search_products_mast)
from lightkurve_tpu.mast_http import HTTPMASTTransport
from lightkurve_tpu.utils import LightkurveError

KEP10_RA, KEP10_DEC = 285.679420, 50.241299
TIC_RA, TIC_DEC = 84.291188, -80.469129


def _fixture_data():
    """Observations/products with BOTH the string obs_id (join key) and
    the numeric CAOM obsid (Mashup product-list key)."""
    observations, products = [], []
    next_obsid = [1000]

    def add_obs(obs_id, target_name, ra, dec, project, provenance,
                exptime, seqno, dtype, description):
        oid = next_obsid[0]
        next_obsid[0] += 1
        observations.append({
            "obsid": oid, "obs_id": obs_id, "target_name": target_name,
            "s_ra": ra, "s_dec": dec, "project": project,
            "provenance_name": provenance, "t_exptime": exptime,
            "sequence_number": seqno, "dataproduct_type": dtype,
            "description": description, "obs_collection": project})
        return oid

    def add_product(oid, obs_id, fname, description, data=b""):
        products.append({
            "parent_obsid": oid, "obs_id": obs_id,
            "productFilename": fname,
            "description": description,
            "dataURI": f"mast:PRODUCT/{fname}",
            "_bytes_key": fname if data else None})

    # Kepler-10, quarters 2 and 11 (exercises the q1-vs-q11 suffix rule)
    for q in (2, 11):
        obs_id = f"kplr011904151_lc_Q{q}"
        oid = add_obs(obs_id, "kplr011904151", KEP10_RA, KEP10_DEC,
                      "Kepler", "Kepler", 1800, None, "timeseries",
                      f"Lightcurve Long Cadence (CLC) - Q{q}")
        add_product(oid, obs_id, f"kplr011904151-q{q:02d}_llc.fits",
                    f"Lightcurve Long Cadence (CLC) - Q{q}")
        add_product(oid, obs_id, f"kplr011904151-q{q:02d}_lpd-targ.fits.gz",
                    f"Target Pixel Long Cadence (TPL) - Q{q}")
    # TESS TIC 273985862 sectors 1 and 2 + a neighbor 50" away
    for tic, sec, ra in [(273985862, 1, TIC_RA), (273985862, 2, TIC_RA),
                         (273985863, 1, TIC_RA + 50.0 / 3600.0
                          / np.cos(np.deg2rad(TIC_DEC)))]:
        obs_id = f"tess-s{sec:04d}-{tic}"
        oid = add_obs(obs_id, str(tic), ra, TIC_DEC, "TESS", "SPOC",
                      120, sec, "timeseries", f"TESS Sector {sec}")
        add_product(oid, obs_id,
                    f"tess-s{sec:04d}-{tic}-0120-s_lc.fits",
                    "Light curves")
        add_product(oid, obs_id,
                    f"tess-s{sec:04d}-{tic}-0120-s_tp.fits",
                    "Target pixel files")
    resolver = {"kepler-10": (KEP10_RA, KEP10_DEC),
                "tic 273985862": (TIC_RA, TIC_DEC)}
    return observations, products, resolver


class MockMashup:
    """In-process Mashup/invoke endpoint over fixture tables."""

    def __init__(self, observations, products, resolver,
                 file_bytes=None, executing_polls=0, fail_first=0):
        self.observations = observations
        self.products = products
        self.resolver = {k.lower(): v for k, v in resolver.items()}
        self.file_bytes = file_bytes or {}
        self.executing_polls = executing_polls
        self.fail_first = fail_first
        self.requests = []

    # the injectable opener
    def __call__(self, url, data=None, timeout=60.0):
        self.requests.append((url, data))
        if self.fail_first > 0:
            self.fail_first -= 1
            raise OSError("mock connection reset")
        if url.startswith("https://mock.download/"):
            uri = urllib.parse.parse_qs(
                urllib.parse.urlparse(url).query)["uri"][0]
            fname = uri.rsplit("/", 1)[-1]
            if fname not in self.file_bytes:
                raise OSError(f"404: {uri}")
            return self.file_bytes[fname]
        assert data is not None, "Mashup calls must POST"
        body = data.decode()
        assert body.startswith("request=")
        request = json.loads(urllib.parse.unquote(body[len("request="):]))
        if self.executing_polls > 0:
            self.executing_polls -= 1
            return json.dumps({"status": "EXECUTING", "data": []}).encode()
        return json.dumps(self._serve(request)).encode()

    def _serve(self, request):
        service = request["service"]
        params = request.get("params", {})
        if service == "Mast.Name.Lookup":
            key = str(params["input"]).lower().strip()
            if key not in self.resolver:
                return {"status": "COMPLETE", "resolvedCoordinate": []}
            ra, dec = self.resolver[key]
            return {"status": "COMPLETE",
                    "resolvedCoordinate": [{"ra": ra, "decl": dec}]}
        if service == "Mast.Caom.Products":
            wanted = {s.strip() for s in
                      str(params["obsid"]).split(",") if s.strip()}
            rows = [dict(p) for p in self.products
                    if str(p["parent_obsid"]) in wanted]
            for r in rows:
                r.pop("_bytes_key", None)
                r.pop("obs_id", None)      # the client re-keys via obsid
            return {"status": "COMPLETE", "data": rows}
        if service in ("Mast.Caom.Filtered", "Mast.Caom.Filtered.Position"):
            rows = [dict(r) for r in self.observations]
            if service.endswith("Position"):
                ra0, dec0, radius = [
                    float(x) for x in params["position"].split(",")]
                cosd = np.cos(np.deg2rad(dec0))
                rows = [r for r in rows if np.hypot(
                    (r["s_ra"] - ra0) * cosd, r["s_dec"] - dec0)
                    <= radius + 1e-12]
            for filt in params.get("filters", []):
                name, values = filt["paramName"], filt["values"]
                if values and isinstance(values[0], dict):   # min/max
                    lo, hi = values[0]["min"], values[0]["max"]
                    rows = [r for r in rows
                            if lo <= float(r.get(name, np.nan)) <= hi]
                else:
                    opts = {str(v).lower() for v in values}
                    rows = [r for r in rows
                            if str(r.get(name, "")).lower() in opts]
            return {"status": "COMPLETE", "data": rows}
        return {"status": "ERROR", "msg": f"unknown service {service}"}


def _http_transport(mock, **kw):
    return HTTPMASTTransport(mashup_url="https://mock.mast/invoke",
                             download_url="https://mock.download/file",
                             opener=mock, max_retries=3, **kw)


@pytest.fixture
def mock():
    obs, prod, res = _fixture_data()
    return MockMashup(obs, prod, res,
                      file_bytes={"tess-s0001-273985862-0120-s_lc.fits":
                                  b"SIMPLE fake fits bytes"})


def test_exact_kepler_name_query(mock):
    t = _http_transport(mock)
    rows = search_products_mast("KIC 11904151", t, filetype="Lightcurve")
    assert len(rows) == 2
    assert {r["mission"] for r in rows} == {"Kepler Quarter 02",
                                            "Kepler Quarter 11"}
    # exact-name query must not hit the resolver
    assert all("Name.Lookup" not in (c[0] or "") for c in t.calls)


def test_quarter_filter_through_http(mock):
    t = _http_transport(mock)
    rows = search_products_mast("KIC 11904151", t, filetype="Lightcurve",
                                quarter=2)
    assert len(rows) == 1 and rows[0]["mission"] == "Kepler Quarter 02"
    # q2 must not match q11's suffix either way
    rows11 = search_products_mast("KIC 11904151", t,
                                  filetype="Lightcurve", quarter=11)
    assert len(rows11) == 1 and rows11[0]["mission"] == "Kepler Quarter 11"


def test_cone_search_orders_by_distance(mock):
    t = _http_transport(mock)
    rows = search_products_mast("Kepler-10", t, filetype="Target Pixel",
                                radius=3600.0)
    assert len(rows) == 2                      # both quarters' TPFs
    rows = search_products_mast("TIC 273985862", t, radius=100.0,
                                filetype="Lightcurve", mission="TESS")
    assert [r["target_name"] for r in rows] == [
        "273985862", "273985862", "273985863"]
    assert rows[0]["distance"] <= rows[-1]["distance"]


def test_sector_and_exptime_filter(mock):
    t = _http_transport(mock)
    rows = search_products_mast("TIC 273985862", t, filetype="Lightcurve",
                                mission="TESS", sector=2)
    assert len(rows) == 1 and rows[0]["mission"] == "TESS Sector 02"
    rows = search_products_mast("TIC 273985862", t, filetype="Lightcurve",
                                mission="TESS", exptime="fast")
    assert rows == []                          # 120 s is short, not fast


def test_equivalence_with_recorded_transport(mock):
    """The HTTP client through the mock server returns the same filtered
    product set as RecordedMASTTransport on identical fixtures."""
    obs, prod, resolver = _fixture_data()
    rec = RecordedMASTTransport({
        "resolver": {k: list(v) for k, v in resolver.items()},
        "observations": obs,
        "products": [{k: v for k, v in p.items() if k != "_bytes_key"}
                     for p in prod]})
    http = _http_transport(mock)
    for kwargs in ({"filetype": "Lightcurve"},
                   {"filetype": "Target Pixel"},
                   {"filetype": "Lightcurve", "quarter": 11}):
        a = search_products_mast("KIC 11904151", rec, **kwargs)
        b = search_products_mast("KIC 11904151", http, **kwargs)
        assert [r["productFilename"] for r in a] == \
            [r["productFilename"] for r in b]
        assert [r["mission"] for r in a] == [r["mission"] for r in b]


def test_resolver_error(mock):
    t = _http_transport(mock)
    with pytest.raises(ResolverError):
        t.resolve_object("definitely not a star")


def test_download_product(mock, tmp_path):
    t = _http_transport(mock)
    rows = search_products_mast("TIC 273985862", t, filetype="Lightcurve",
                                mission="TESS", sector=1)
    path = t.download_product(rows[0], str(tmp_path))
    assert path.endswith("tess-s0001-273985862-0120-s_lc.fits")
    assert open(path, "rb").read() == b"SIMPLE fake fits bytes"
    # cached: a second call returns without re-downloading
    n_req = len(mock.requests)
    assert t.download_product(rows[0], str(tmp_path)) == path
    assert len(mock.requests) == n_req


def test_download_missing_uri_raises(mock, tmp_path):
    t = _http_transport(mock)
    with pytest.raises(LightkurveError):
        t.download_product({"productFilename": "x.fits"}, str(tmp_path))


def test_retry_on_transient_failure(mock):
    mock.fail_first = 2            # first two requests die, third works
    t = _http_transport(mock)
    obs = query_mast("KIC 11904151", t)
    assert len(obs) == 2


def test_executing_poll(mock, monkeypatch):
    mock.executing_polls = 2       # server says EXECUTING twice
    monkeypatch.setattr("time.sleep", lambda s: None)
    t = _http_transport(mock)
    obs = query_mast("KIC 11904151", t)
    assert len(obs) == 2


def test_unreachable_raises_after_retries(mock, monkeypatch):
    mock.fail_first = 99
    monkeypatch.setattr("time.sleep", lambda s: None)
    t = _http_transport(mock)
    with pytest.raises(LightkurveError, match="unreachable"):
        t.resolve_object("Kepler-10")


def test_default_opener_against_localhost():
    """urllib default opener end-to-end against a real local HTTP server
    speaking the Mashup protocol (no external egress)."""
    import http.server

    obs, prod, res = _fixture_data()
    mashup = MockMashup(obs, prod, res)

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            length = int(self.headers["Content-Length"])
            body = self.rfile.read(length)
            payload = mashup("https://mock.mast/invoke", data=body)
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/invoke"
        t = HTTPMASTTransport(mashup_url=url)
        rows = search_products_mast("KIC 11904151", t,
                                    filetype="Lightcurve")
        assert {r["mission"] for r in rows} == {"Kepler Quarter 02",
                                                "Kepler Quarter 11"}
    finally:
        srv.shutdown()
        srv.server_close()


def test_env_gate(monkeypatch):
    """LIGHTKURVE_TPU_MAST_HTTP=1 switches default_transport to the HTTP
    client; unset leaves it None (offline default)."""
    from lightkurve_tpu.mast import default_transport
    monkeypatch.delenv("LIGHTKURVE_TPU_MAST_FIXTURES", raising=False)
    monkeypatch.delenv("LIGHTKURVE_TPU_MAST_HTTP", raising=False)
    assert default_transport() is None
    monkeypatch.setenv("LIGHTKURVE_TPU_MAST_HTTP", "1")
    assert isinstance(default_transport(), HTTPMASTTransport)
