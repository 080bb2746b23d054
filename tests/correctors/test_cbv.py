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


def test_CotrendingBasisVectors_nonretrieval():
    """Mirror of the reference's offline CotrendingBasisVectors test
    (reference tests/correctors/test_cbvcorrector.py:40-197):
    constructor defaults, to_designmatrix selection, plot validation,
    align gap insertion, interpolate extrapolation."""
    import matplotlib
    import matplotlib.pyplot as plt
    from lightkurve_tpu import TessLightCurve
    from lightkurve_tpu.correctors import CotrendingBasisVectors
    from lightkurve_tpu.time import Time

    # constructor with explicit CADENCENO/GAP
    cbvs = CotrendingBasisVectors(
        data={"CADENCENO": [1, 2, 3], "GAP": [False, True, False],
              "VECTOR_1": [2.0, 3.0, 4.0], "VECTOR_3": [3.0, 4.0, 5.0]},
        time=Time([443.51090033, 443.53133457, 443.55176891],
                  format="bkjd"))
    assert cbvs.cbv_indices == [1, 3]
    np.testing.assert_allclose(
        cbvs.time.value, [443.51090033, 443.53133457, 443.55176891])

    # auto-initialized GAP and CADENCENO
    cbvs = CotrendingBasisVectors(
        data={"VECTOR_3": [2.0, 3.0, 4.0], "VECTOR_12": [3.0, 4.0, 5.0]},
        time=Time([443.51, 443.53, 443.55], format="bkjd"))
    assert cbvs.cbv_indices == [3, 12]
    assert np.all(np.asarray(cbvs.gap_indicators) == False)  # noqa: E712
    assert np.all(np.asarray(cbvs.cadenceno) == [0, 1, 2])

    # to_designmatrix: missing CBV index 5 silently ignored
    cbvs = CotrendingBasisVectors(
        data={"CADENCENO": [1, 2, 3], "GAP": [False, True, False],
              "VECTOR_1": [1.0, 2.0, 3.0], "VECTOR_2": [4.0, 5.0, 6.0],
              "VECTOR_3": [7.0, 8.0, 9.0]},
        time=Time([1569.44053967, 1569.44192856, 1569.44331746],
                  format="btjd"))
    dm = cbvs.to_designmatrix(cbv_indices=[1, 3, 5], name="test cbv set")
    assert dm.shape == (3, 2)
    assert dm.name == "test cbv set"
    vals = np.asarray(dm.values)
    np.testing.assert_allclose(vals[:, 0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(vals[:, 1], [7.0, 8.0, 9.0])
    assert list(dm.columns) == ["VECTOR_1", "VECTOR_3"]

    # plot: unknown index ignored, 0-based request and bad strings raise
    ax = cbvs.plot(cbv_indices=[1, 2], ax=None)
    assert isinstance(ax, matplotlib.axes.Axes)
    ax = cbvs.plot(cbv_indices=[1, 2, 5], ax=ax)
    with pytest.raises(ValueError):
        cbvs.plot(cbv_indices=[0, 1, 2], ax=ax)
    with pytest.raises(ValueError):
        cbvs.plot("Doh!")
    plt.close("all")

    # align: LC cadences missing from the CBVs become NaN gap rows
    sample_lc = TessLightCurve(time=[1, 2, 3, 4, 6, 7],
                               flux=[1, 2, 3, 4, 6, 7],
                               flux_err=[0.1] * 6,
                               cadenceno=[1, 2, 3, 4, 6, 7])
    cbvs = CotrendingBasisVectors(
        data={"CADENCENO": [1, 2, 3, 5, 6], "GAP": [False, True, False,
                                                    False, False],
              "VECTOR_1": [1.0, 2.0, 3.0, 5.0, 6.0]},
        time=Time([1569.43915078, 1569.44053967, 1569.44192856,
                   1569.44470635, 1569.44609524], format="btjd"))
    aligned = cbvs.align(sample_lc)
    assert np.all(np.asarray(sample_lc["cadenceno"])
                  == np.asarray(aligned.cadenceno))
    assert len(aligned.cadenceno) == 6
    assert np.all(np.asarray(aligned.gap_indicators)[[1, 3, 5]])
    dm = aligned.to_designmatrix(cbv_indices=[1])
    v1 = np.asarray(dm.values)[:, 0]
    np.testing.assert_allclose(v1[[0, 1, 2, 4]], [1.0, 2.0, 3.0, 6.0])
    assert np.all(np.isnan(v1[[3, 5]]))

    # interpolate: out-of-range values zeroed unless extrapolate=True
    n_lc = 20
    x_lc = np.linspace(0.0, 2 * np.pi, num=n_lc)
    sample_lc = TessLightCurve(time=x_lc, flux=np.sin(x_lc),
                               flux_err=np.full(n_lc, 0.1),
                               cadenceno=np.arange(n_lc))
    n_cbv = 10
    x_cbv = np.linspace(0.0, 2 * np.pi, num=n_cbv)
    cbvs = CotrendingBasisVectors(
        data={"CADENCENO": np.arange(n_cbv),
              "GAP": np.full(n_cbv, False),
              "VECTOR_1": np.cos(x_cbv),
              "VECTOR_2": np.sin(x_cbv + np.pi * 0.125)},
        time=Time(x_cbv, format="btjd"))
    interp = cbvs.interpolate(sample_lc, extrapolate=False)
    np.testing.assert_allclose(interp.time.value, sample_lc.time.value)

    x_cbv = np.linspace(0.0, 1.5 * np.pi, num=n_cbv)
    cbvs = CotrendingBasisVectors(
        data={"CADENCENO": np.arange(n_cbv),
              "GAP": np.full(n_cbv, False),
              "VECTOR_1": np.cos(x_cbv),
              "VECTOR_2": np.sin(x_cbv + np.pi * 0.125)},
        time=Time(x_cbv, format="btjd"))
    outside = np.nonzero(sample_lc.time.value > 1.5 * np.pi)[0]
    interp = cbvs.interpolate(sample_lc, extrapolate=False)
    assert np.all(np.asarray(interp["VECTOR_1"])[outside] == 0.0)
    interp = cbvs.interpolate(sample_lc, extrapolate=True)
    assert np.all(np.asarray(interp["VECTOR_1"])[outside] != 0.0)


def _write_cbv_file(tmp_path, name, dt_days):
    t = 1500.0 + np.arange(N_CAD) * dt_days
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
    path = str(tmp_path / name)
    write_fits(HDUList([PrimaryHDU(header=ph), table]), path)
    return path


def test_CBV_cadence(tmp_path, rng):
    """Mirrors reference test_correctors.py::test_CBV_cadence: separate
    CBVs exist for 20-s and 2-min products; the corrector selects by
    cadence — auto-detected from a 'fast' product filename like the
    reference (cbvcorrector.py:136-138)."""
    _write_cbv_file(tmp_path, "tess2019-s0010-2-4-0140-s_cbv.fits",
                    2.0 / 60 / 24)
    _write_cbv_file(tmp_path, "tess2019-s0010-2-4-0140-s_fast-cbv.fits",
                    20.0 / 86400.0)
    cbv_dir = str(tmp_path)

    def median_cadence_s(cbvs):
        tv = np.asarray(cbvs.time.value, dtype=float)
        return float(np.median(np.diff(tv))) * 86400.0

    lc_fast = make_lc_with_systematics(rng)
    lc_fast.meta["FILENAME"] = "tess2019-s0010-0000000042-fast-lc.fits"
    corr = CBVCorrector(lc_fast, cbv_dir=cbv_dir)
    assert np.isclose(median_cadence_s(corr.cbvs[0]), 20.0, rtol=0.01)

    lc_reg = make_lc_with_systematics(rng)
    lc_reg.meta["FILENAME"] = "tess2019-s0010-0000000042-s_lc.fits"
    corr = CBVCorrector(lc_reg, cbv_dir=cbv_dir)
    assert np.isclose(median_cadence_s(corr.cbvs[0]), 120.0, rtol=0.01)
