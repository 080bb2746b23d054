"""Mirror of reference correctors/test_metrics.py::
test_underfit_metric_neighbors against recorded archive fixtures.

The reference test downloads Proxima Cen's SPOC neighbors live; here the
same search→download→align→correlate chain runs through a
:class:`RecordedMASTTransport` over synthetic SPOC files sharing one
injected systematic: the corrected (pdcsap-like) flux scores > 0.99,
the uncorrected (sap-like) flux scores < 0.95, and a flat curve scores
exactly 1 (reference assertions at test_metrics.py:38-54).
"""
import numpy as np
import pytest

from lightkurve_tpu.correctors.metrics import underfit_metric_neighbors
from lightkurve_tpu.io.fits import (BinTableHDU, Header, HDUList,
                                    PrimaryHDU, write_fits)
from lightkurve_tpu.mast import RecordedMASTTransport
from lightkurve_tpu.search import search_lightcurve

N = 400
RA, DEC = 217.39, -62.67


def _spoc_file(tmp_path, tic, sap, pdcsap):
    fn = f"tess2019-s0011-{tic:016d}-0120-s_lc.fits"
    t = 1600.0 + np.arange(N) * 2.0 / 60 / 24
    table = BinTableHDU(data={
        "TIME": t,
        "SAP_FLUX": sap.astype(np.float32),
        "SAP_FLUX_ERR": np.full(N, 1.0, np.float32),
        "PDCSAP_FLUX": pdcsap.astype(np.float32),
        "PDCSAP_FLUX_ERR": np.full(N, 1.0, np.float32),
        "QUALITY": np.zeros(N, np.int32),
        "CADENCENO": np.arange(N, dtype=np.int32),
    }, header=Header({"EXTNAME": "LIGHTCURVE", "BJDREFI": 2457000,
                      "BJDREFF": 0.0, "TIMESYS": "TDB",
                      "TUNIT2": "e-/s", "TUNIT4": "e-/s"}))
    ph = Header({"TELESCOP": "TESS", "TICID": tic, "SECTOR": 11,
                 "OBJECT": f"TIC {tic}", "MISSION": "TESS",
                 "CREATOR": "LightCurveExporterPipelineModule",
                 "ORIGIN": "NASA/Ames"})
    path = str(tmp_path / fn)
    write_fits(HDUList([PrimaryHDU(header=ph), table]), path)
    return fn, path


@pytest.fixture
def neighbor_transport(tmp_path):
    rng = np.random.default_rng(3)
    t = np.arange(N)
    systematic = 0.02 * np.sin(t / 17.0) + 0.01 * np.sin(t / 5.0)
    observations, products = [], []
    for k, tic in enumerate([400001, 400002, 400003, 400004]):
        noise = 2e-3 * rng.standard_normal(N)
        sap = 1000.0 * (1.0 + systematic + noise)
        pdc = 1000.0 * (1.0 + noise)
        fn, path = _spoc_file(tmp_path, tic, sap, pdc)
        # small offsets: every neighbor within the 6000" search cone
        obs_id = f"o{tic}"
        observations.append(
            {"obs_id": obs_id, "target_name": str(tic),
             "s_ra": RA + 0.05 * k, "s_dec": DEC, "project": "TESS",
             "provenance_name": "SPOC", "t_exptime": 120,
             "sequence_number": 11, "dataproduct_type": "timeseries",
             "description": "TESS Sector 11"})
        products.append({"obs_id": obs_id, "productFilename": fn,
                         "description": "SPOC", "dataURI": f"mast:{fn}",
                         "local_path": path})
    return RecordedMASTTransport({
        "resolver": {"400001": [RA, DEC]},
        "observations": observations, "products": products})


def test_underfit_metric_neighbors(neighbor_transport, tmp_path):
    dl = str(tmp_path / "cache")
    sr = search_lightcurve("TIC 400001", sector=11, author="SPOC",
                           transport=neighbor_transport)
    lc_pdc = sr.download(download_dir=dl, flux_column="pdcsap_flux")
    score = underfit_metric_neighbors(lc_pdc, min_targets=3, max_targets=3,
                                      transport=neighbor_transport)
    assert score > 0.99
    lc_sap = sr.download(download_dir=dl, flux_column="sap_flux")
    score = underfit_metric_neighbors(lc_sap, min_targets=3, max_targets=3,
                                      transport=neighbor_transport)
    assert score < 0.95
    # a flat light curve scores a perfect 1
    lc_flat = lc_sap.copy()
    lc_flat.flux = np.ones(len(lc_flat))
    assert underfit_metric_neighbors(
        lc_flat, min_targets=3, max_targets=3,
        transport=neighbor_transport) == 1.0


def test_underfit_min_targets_enforced(neighbor_transport, tmp_path):
    from lightkurve_tpu.correctors.metrics import MinTargetsError
    sr = search_lightcurve("TIC 400001", sector=11, author="SPOC",
                           transport=neighbor_transport)
    lc = sr.download(download_dir=str(tmp_path / "c"))
    with pytest.raises(MinTargetsError, match="required"):
        underfit_metric_neighbors(lc, min_targets=30,
                                  transport=neighbor_transport)
