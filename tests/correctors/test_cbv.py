"""CBV corrector tests with synthetic CBV FITS files."""
import numpy as np
import pytest

from lightkurve_tpu import LightCurve
from lightkurve_tpu.correctors import (CBVCorrector, CotrendingBasisVectors,
                                       DesignMatrix, load_tess_cbvs,
                                       TessCotrendingBasisVectors)
from lightkurve_tpu.io.fits import (BinTableHDU, Header, HDUList,
                                    PrimaryHDU, write_fits)
from lightkurve_tpu.units import Quantity, electron_per_second


N_CAD = 400
SYSTEMATIC_PERIOD = 1.3


def _cbv_vectors(t):
    v1 = np.sin(2 * np.pi * t / SYSTEMATIC_PERIOD)
    v2 = np.cos(2 * np.pi * t / SYSTEMATIC_PERIOD)
    v3 = np.linspace(-1, 1, len(t))
    return v1, v2, v3


@pytest.fixture
def cbv_dir(tmp_path):
    """Write a TESS-style CBV FITS file with known vectors."""
    t = 1500.0 + np.arange(N_CAD) * 0.02
    v1, v2, v3 = _cbv_vectors(t)
    table = BinTableHDU(data={
        "TIME": t,
        "CADENCENO": np.arange(100, 100 + N_CAD, dtype=np.int32),
        "GAP": np.zeros(N_CAD, dtype=np.uint8),
        "VECTOR_1": v1.astype(np.float32),
        "VECTOR_2": v2.astype(np.float32),
        "VECTOR_3": v3.astype(np.float32),
    }, header=Header({"EXTNAME": "CBV.single-scale.2.4"}))
    ph = Header({"TELESCOP": "TESS", "SECTOR": 10, "CAMERA": 2, "CCD": 4})
    path = str(tmp_path / "tess2019-s0010-2-4-0140-s_cbv.fits")
    write_fits(HDUList([PrimaryHDU(header=ph), table]), path)
    return str(tmp_path)


def make_lc_with_systematics(rng, cadence_offset=0):
    t = 1500.0 + np.arange(N_CAD) * 0.02
    v1, v2, _ = _cbv_vectors(t)
    flux = 1000.0 * (1 + 0.004 * v1 - 0.002 * v2) \
        + 0.3 * rng.standard_normal(N_CAD)
    lc = LightCurve(time=t,
                    flux=Quantity(flux, electron_per_second),
                    flux_err=Quantity(np.full(N_CAD, 0.3),
                                      electron_per_second),
                    cadenceno=np.arange(100 + cadence_offset,
                                        100 + cadence_offset + N_CAD))
    lc.time = __import__("lightkurve_tpu").Time(t, format="btjd")
    lc.meta.update({"MISSION": "TESS", "SECTOR": 10, "CAMERA": 2, "CCD": 4,
                    "TARGETID": 42})
    return lc


def test_load_tess_cbvs(cbv_dir):
    cbvs = load_tess_cbvs(cbv_dir=cbv_dir, sector=10, camera=2, ccd=4,
                          cbv_type="SingleScale")
    assert isinstance(cbvs, TessCotrendingBasisVectors)
    assert cbvs.cbv_indices == [1, 2, 3]
    assert len(cbvs) == N_CAD
    dm = cbvs.to_designmatrix(cbv_indices=[1, 2])
    assert dm.shape == (N_CAD, 2)
    with pytest.raises(ValueError):
        cbvs.to_designmatrix(cbv_indices=[0])


def test_cbv_align(cbv_dir, rng):
    cbvs = load_tess_cbvs(cbv_dir=cbv_dir, sector=10, camera=2, ccd=4)
    # light curve missing 10 cadences at the start, plus 5 unknown ones
    lc = make_lc_with_systematics(rng)[10:]
    aligned = cbvs.align(lc)
    assert len(aligned) == len(lc)
    assert np.array_equal(aligned.cadenceno, np.asarray(lc["cadenceno"]))


def test_cbv_interpolate(cbv_dir, rng):
    cbvs = load_tess_cbvs(cbv_dir=cbv_dir, sector=10, camera=2, ccd=4)
    lc = make_lc_with_systematics(rng)
    # shift times by half a cadence → PCHIP interpolation
    lc.time = __import__("lightkurve_tpu").Time(
        lc.time.value + 0.01, format="btjd")
    interp = cbvs.interpolate(lc)
    assert len(interp) == len(lc)
    t = lc.time.value
    v1_true = np.sin(2 * np.pi * t / SYSTEMATIC_PERIOD)
    inner = slice(2, -2)
    np.testing.assert_allclose(interp["VECTOR_1"][inner], v1_true[inner],
                               atol=2e-3)


def test_correct_gaussian_prior_removes_systematics(cbv_dir, rng):
    lc = make_lc_with_systematics(rng)
    corr = CBVCorrector(lc, cbv_dir=cbv_dir)
    out = corr.correct_gaussian_prior(alpha=1e-9)
    raw_std = np.std(lc.flux.value)
    cor_std = np.std(out.flux.value)
    assert cor_std < 0.2 * raw_std
    # recovered coefficients ≈ injected (1000*0.004, -1000*0.002)
    assert abs(corr.coefficients[0] - 4.0) < 0.2
    assert abs(corr.coefficients[1] - (-2.0)) < 0.2


def test_correct_elasticnet(cbv_dir, rng):
    lc = make_lc_with_systematics(rng)
    corr = CBVCorrector(lc, cbv_dir=cbv_dir)
    out = corr.correct_elasticnet(alpha=1e-4, l1_ratio=0.5)
    assert np.std(out.flux.value) < 0.5 * np.std(lc.flux.value)


def test_correct_alpha_optimization(cbv_dir, rng):
    """Full α optimization with supplied neighbor fluxes (no network)."""
    lc = make_lc_with_systematics(rng)
    corr = CBVCorrector(lc, cbv_dir=cbv_dir)
    # neighbors share the v1 systematic (under-fitting metric input)
    t = lc.time.value
    v1, _, _ = _cbv_vectors(t)
    neighbors = [0.003 * v1 + 3e-4 * rng.standard_normal(N_CAD)
                 for _ in range(3)]
    out = corr.correct(alpha_bounds=(1e-6, 1e4), max_iter=12,
                       neighbor_flux=neighbors, verbose=False)
    # the optimizer balances over- vs under-fitting; verify it converged
    # to an in-bounds alpha with valid metrics and a finite correction
    assert 1e-6 <= corr.alpha <= 1e4
    assert 0.0 <= corr.over_fitting_score <= 1.0
    assert 0.0 <= corr.under_fitting_score <= 1.0
    assert np.isfinite(out.flux.value).all()
    # and that a deliberately weak prior still removes the systematics
    strong = corr.correct_gaussian_prior(alpha=1e-9)
    assert np.std(strong.flux.value) < 0.5 * np.std(lc.flux.value)


def test_cbv_requires_eps_units(cbv_dir):
    lc = LightCurve(time=[1, 2, 3], flux=[1.0, 2.0, 3.0])
    with pytest.raises(ValueError, match="e-/s"):
        CBVCorrector(lc, cbv_dir=cbv_dir)


def test_custom_cbv_object():
    t = np.arange(50, dtype=float)
    cbvs = CotrendingBasisVectors(
        data={"VECTOR_1": np.sin(t), "VECTOR_2": np.cos(t)}, time=t)
    assert cbvs.cbv_indices == [1, 2]
    dm = cbvs.to_designmatrix()
    assert dm.shape == (50, 2)
