"""Round-3 mirrors of reference tests with no same-name analogue here.

Each test re-implements the BEHAVIOR of a reference test (cited per test)
on synthetic in-memory data — no network, no astropy.
"""
import warnings

import numpy as np
import pytest

import lightkurve_tpu as lk
from lightkurve_tpu import KeplerLightCurve, LightCurve
from lightkurve_tpu.units import Quantity, Unit
from synthetic import make_synthetic_tpf


def test_invalid_lightcurve():
    """Mismatched column lengths raise (reference test_lightcurve.py:64)."""
    with pytest.raises(ValueError):
        LightCurve(time=np.array([1, 2, 3, 4, 5]),
                   flux=np.array([1, 2, 3, 4]))


def test_lc_nan_time():
    """NaN time values raise at construction (reference :73)."""
    with pytest.raises(ValueError):
        LightCurve(time=np.array([1, 2, 3, np.nan]),
                   flux=np.array([1, 2, 3, 4]))


def test_math_operators_on_objects():
    """LightCurve⊗LightCurve arithmetic, both orders; length mismatch
    raises (reference :94-131)."""
    lc1 = LightCurve(time=np.arange(1, 5), flux=np.arange(1, 5),
                     flux_err=np.arange(1, 5))
    lc2 = LightCurve(time=np.arange(1, 5), flux=np.arange(11, 15),
                     flux_err=np.arange(1, 5))
    np.testing.assert_array_equal((lc1 + lc2).flux.value,
                                  lc1.flux.value + lc2.flux.value)
    np.testing.assert_array_equal((lc1 - lc2).flux.value,
                                  lc1.flux.value - lc2.flux.value)
    np.testing.assert_array_equal((lc1 * lc2).flux.value,
                                  lc1.flux.value * lc2.flux.value)
    np.testing.assert_array_equal((lc1 / lc2).flux.value,
                                  lc1.flux.value / lc2.flux.value)
    np.testing.assert_array_equal((lc2 / lc1).flux.value,
                                  lc2.flux.value / lc1.flux.value)
    with pytest.raises(ValueError):
        lc1 + lc1[0:-2]
    with pytest.raises(ValueError):
        lc1 * lc1[0:-2]


def test_rmath_operators():
    """Reflected scalar arithmetic (reference :117-130)."""
    lc = LightCurve(time=np.arange(1, 5), flux=np.arange(1, 5),
                    flux_err=np.arange(1, 5))
    np.testing.assert_array_equal((1 + lc).flux.value, lc.flux.value + 1)
    np.testing.assert_array_equal((1 - lc).flux.value, 1 - lc.flux.value)
    np.testing.assert_array_equal((2 * lc).flux.value, lc.flux.value * 2)
    np.testing.assert_array_equal((2 / lc).flux.value, 2 / lc.flux.value)


def test_math_regression_925():
    """Reference #925: left-hand numpy-float arithmetic must work
    (reference :152-160)."""
    lc = LightCurve(time=[1, 2, 3], flux=[1, 1, 1], flux_err=[1, 1, 1])
    for three in [3, 3.0, np.float64(3), Quantity(3.0)]:
        assert (np.asarray((three * lc).flux.value) == 3).all()
        assert (np.asarray((lc * three).flux.value) == 3).all()
        assert (np.asarray((three + lc).flux.value) == 4).all()
        assert (np.asarray((lc + three).flux.value) == 4).all()


def test_math_operators_on_units():
    """Multiplying/dividing by a unit reassigns flux units
    (reference :131-141)."""
    lc = LightCurve(time=np.arange(1, 5), flux=np.arange(1, 5),
                    flux_err=np.arange(1, 5))
    from lightkurve_tpu.units import pixel
    lc_mul = lc * pixel
    lc_div = lc / pixel
    assert str(lc_mul.flux.unit) in ("pix", "pixel")
    assert str(lc_mul.flux_err.unit) in ("pix", "pixel")
    assert "pix" in str(lc_div.flux.unit)   # 1 / pix
    np.testing.assert_array_equal(lc_mul.flux.value, lc.flux.value)


def test_support_non_numeric_columns():
    """String-valued extra columns survive copy (reference :2050)."""
    lc = LightCurve(time=[1, 2, 3], flux=[2, 3, 4])
    lc["col1"] = ["a", "b", "c"]
    lc_copy = lc.copy()
    np.testing.assert_array_equal(np.asarray(lc_copy["col1"]),
                                  np.asarray(lc["col1"]))


def test_select_columns_as_lightcurve():
    """Column-subset indexing returns a LightCurve with guaranteed
    flux/flux_err columns (reference #1194, :2057-2080)."""
    lc = LightCurve(time=np.arange(0, 12))
    lc["flux"] = np.ones(12) - 0.01
    lc["flux_err"] = np.ones(12) * 1e-4
    lc["col1"] = np.zeros(12, dtype="i4")
    lc["col2"] = np.zeros(12, dtype="i4")
    sub = lc["time", "flux", "col2"]
    assert set(sub.colnames) == {"time", "flux", "flux_err", "col2"}
    assert np.isnan(np.asarray(sub.flux_err.value)).all()
    assert isinstance(sub, type(lc))


def test_bin_quality_centroids():
    """bin(binsize=2) averages the centroid columns (reference :840)."""
    lc = KeplerLightCurve(time=[1, 2, 3, 4], flux=[1, 1, 1, 1],
                          quality=[0, 1, 2, 3],
                          centroid_col=[0.0, 1, 0, 1],
                          centroid_row=[0.0, 2, 0, 2])
    binned = lc.bin(binsize=2)
    np.testing.assert_allclose(np.asarray(binned["centroid_col"],
                                          dtype=float), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(binned["centroid_row"],
                                          dtype=float), [1.0, 1.0])


def test_zero_fluxerr():
    """Reference #668 (test_regressioncorrector.py:107): flux_err <= 0
    must raise a graceful ValueError."""
    from lightkurve_tpu.correctors import RegressionCorrector
    lc = LightCurve(time=[1, 2], flux=[5, 10], flux_err=[1, 0])
    with pytest.raises(ValueError):
        RegressionCorrector(lc)
    lc = LightCurve(time=[1, 2], flux=[5, 10], flux_err=[1, -10])
    with pytest.raises(ValueError):
        RegressionCorrector(lc)


def test_centroid_methods_consistency():
    """Moments and quadratic centroids agree to 1% on a well-behaved
    target (reference test_targetpixelfile.py:266)."""
    tpf = make_synthetic_tpf(n_cadences=20, mission="TESS")
    col_m, row_m = tpf.estimate_centroids(method="moments")
    col_q, row_q = tpf.estimate_centroids(method="quadratic")
    assert np.max(np.abs((col_m.value - col_q.value) / col_m.value)) < 1e-2
    assert np.max(np.abs((row_m.value - row_q.value) / row_m.value)) < 1e-2


def test_parse_numeric_aperture_masks():
    """Reference #694 (:837): float/int array masks are interpreted as
    boolean."""
    tpf = make_synthetic_tpf(n_cadences=5, mission="TESS")
    mask = tpf._parse_aperture_mask(np.zeros(tpf.shape[1:], dtype=float))
    assert mask.dtype == bool
    mask = tpf._parse_aperture_mask(np.zeros(tpf.shape[1:], dtype=int))
    assert mask.dtype == bool


def test_missing_pipeline_mask():
    """Reference #791 (:813): empty/missing pipeline mask falls back to
    the threshold mask; explicit 'pipeline' raises."""
    tpf = make_synthetic_tpf(n_cadences=5, mission="TESS")
    tpf._aperture = None                  # like a TESSCut product
    lc = tpf.to_lightcurve()
    assert np.isfinite(lc.flux.value).any()
    assert lc.meta.get("APERTURE_MASK") == "threshold"
    with pytest.raises(ValueError):
        tpf.to_lightcurve(aperture_mask="pipeline")


def test_cutout_quality_masking():
    """Reference #813 (:829): cutout() keeps the quality-masked length."""
    tpf = make_synthetic_tpf(n_cadences=12, mission="TESS")
    cut = tpf.cutout(size=3)
    assert len(tpf) == len(cut)


def test_designmatrix_from_numpy():
    """Reference test_designmatrix.py:39: ndarray construction defaults."""
    from lightkurve_tpu.correctors import DesignMatrix
    dm = DesignMatrix(np.ones((10, 2)))
    assert list(dm.columns) == [0, 1]
    assert dm.name == "unnamed_matrix"
    np.testing.assert_array_equal(np.asarray(dm[0]), np.ones(10))


def test_designmatrix_from_dict():
    """Reference test_designmatrix.py:48: dict construction."""
    from lightkurve_tpu.correctors import DesignMatrix
    dm = DesignMatrix({"centroid_col": np.ones(10),
                       "centroid_row": np.ones(10)},
                      name="motion_systematics")
    assert dm.shape == (10, 2)
    np.testing.assert_array_equal(np.asarray(dm["centroid_col"]),
                                  np.ones(10))


def test_sff_nan_centroids():
    """Reference #827 (test_sffcorrector.py:232): NaN centroid columns
    must not break SFF after remove_nans."""
    rng = np.random.default_rng(3)
    n = 300
    t = np.arange(n) * 0.02
    lc = LightCurve(time=t, flux=1 + 1e-3 * rng.standard_normal(n),
                    flux_err=np.full(n, 1e-3))
    cc = 450 + 0.5 * np.sin(2 * np.pi * t / 0.3)
    cr = 600 + 0.5 * np.cos(2 * np.pi * t / 0.3)
    cc[10] = np.nan
    cr[20] = np.nan
    lc["centroid_col"] = cc
    lc["centroid_row"] = cr
    corrected = lc[5:250].remove_nans().to_corrector("sff").correct(
        windows=1)
    assert np.isfinite(corrected.flux.value).all()


def test_sff_designmatrix_prior_type():
    """Reference #982 (test_sffcorrector.py:241): prior_mu/prior_sigma
    are plain arrays, not Quantity objects."""
    rng = np.random.default_rng(4)
    size = 50
    lc = LightCurve(time=np.arange(size, dtype=float),
                    flux=rng.normal(loc=1.0, scale=0.1, size=size))
    corr = lc.to_corrector("sff")
    corr.correct(centroid_col=rng.normal(1.0, 0.1, size),
                 centroid_row=rng.normal(1.0, 0.1, size), windows=1)
    assert "Quantity" not in str(type(corr.design_matrix_collection.prior_mu))
    assert "Quantity" not in str(
        type(corr.design_matrix_collection.prior_sigma))


def test_stellar_estimator_calls():
    """Reference test_butler.py:288: TEFF from meta feeds the stellar
    estimators without passing teff explicitly."""
    from seismology.test_seismology import comb_spectrum
    snr = comb_spectrum()
    snr.meta = dict(snr.meta or {}, TEFF=3000)
    butler = snr.to_seismology()
    butler.estimate_numax()
    butler.estimate_deltanu()
    mass = butler.estimate_mass()
    rad = butler.estimate_radius()
    logg = butler.estimate_logg()
    for q in (mass, rad, logg):
        assert np.isfinite(q.value)


def test_aperture_photometry_nan():
    """Reference #648 (test_targetpixelfile.py:740): an all-NaN cadence
    reports NaN flux/flux_err, not zero."""
    tpf = make_synthetic_tpf(n_cadences=6, mission="TESS")
    tpf._columns["FLUX"] = np.array(tpf._columns["FLUX"], dtype=float)
    tpf._columns["FLUX_ERR"] = np.array(tpf._columns["FLUX_ERR"],
                                        dtype=float)
    tpf._columns["FLUX"][2] = np.nan
    tpf._columns["FLUX_ERR"][2] = np.nan
    lc = tpf.to_lightcurve(aperture_mask="all")
    assert not np.isnan(lc.flux.value[1])
    assert not np.isnan(lc.flux_err.value[1])
    assert np.isnan(lc.flux.value[2])
    assert np.isnan(lc.flux_err.value[2])


def test_endianness():
    """Reference #188 (test_targetpixelfile.py:707): big-endian FITS
    columns survive to_lightcurve().to_pandas().describe()."""
    tpf = make_synthetic_tpf(n_cadences=6, mission="TESS")
    tpf._columns["FLUX"] = np.asarray(tpf._columns["FLUX"]).astype(">f4")
    tpf.to_lightcurve().to_pandas().describe()


def test_lightcurve_append():
    """Reference test_lightcurve.py:test_lightcurve_append — append keeps
    every column, including mission extras."""
    lc = LightCurve(time=[1, 2, 3], flux=[1, 0.5, 1],
                    flux_err=[0.1, 0.2, 0.3])
    lc = lc.append(lc)
    np.testing.assert_array_equal(lc.time.value, 2 * [1, 2, 3])
    np.testing.assert_array_equal(lc.flux.value, 2 * [1, 0.5, 1])
    np.testing.assert_array_equal(lc.flux_err.value, 2 * [0.1, 0.2, 0.3])
    klc = KeplerLightCurve(
        time=[1, 2, 3], flux=[1, 0.5, 1],
        centroid_col=[4, 5, 6], centroid_row=[7, 8, 9],
        cadenceno=[10, 11, 12], quality=[10, 20, 30])
    klc = klc.append(klc)
    np.testing.assert_array_equal(klc.time.value, 2 * [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(klc.centroid_col), 2 * [4, 5, 6])
    np.testing.assert_array_equal(np.asarray(klc.centroid_row), 2 * [7, 8, 9])
    np.testing.assert_array_equal(np.asarray(klc.cadenceno), 2 * [10, 11, 12])
    np.testing.assert_array_equal(np.asarray(klc.quality), 2 * [10, 20, 30])


def test_lightcurve_append_multiple():
    """Reference test_lightcurve_append_multiple: list append."""
    lc = LightCurve(time=[1, 2, 3], flux=[1, 0.5, 1])
    lc = lc.append([lc, lc, lc])
    np.testing.assert_array_equal(lc.flux.value, 4 * [1, 0.5, 1])
    np.testing.assert_array_equal(lc.time.value, 4 * [1, 2, 3])


def test_to_csv():
    """Reference test_to_csv, incl. the pandas-1.x ``line_terminator``
    keyword spelling."""
    lc = LightCurve(time=range(3), flux=np.ones(3), flux_err=np.zeros(3))
    out = lc.to_csv(line_terminator="\n")
    lines = out.strip().split("\n")
    assert lines[0] == "time,flux,flux_err"
    body = np.array([row.split(",") for row in lines[1:]], dtype=float)
    np.testing.assert_array_equal(body,
                                  [[0, 1, 0], [1, 1, 0], [2, 1, 0]])


def test_initialization_with_table():
    """Reference test_initialization_with_table: ``data=`` mapping merges
    with the guaranteed columns."""
    lc = LightCurve(time=[1, 2, 3],
                    data={"flux": [1, 2, 11], "flux_err": [3, 4, 1],
                          "c": [1, 1, 1]})
    assert lc.colnames == ["time", "flux", "flux_err", "c"]


def test_head_tail_truncate():
    """Reference test_head_tail_truncate, incl. truncate on a column and
    on a plain attribute."""
    lc = LightCurve({"time": [1, 2, 3, 4, 5], "flux": [1, 2, 3, 4, 5]})
    assert lc.head(1).flux.value == 1
    assert lc.head(n=1).flux.value == 1
    assert lc.tail(1).flux.value == 5
    assert lc.tail(n=1).flux.value == 5
    assert all(lc.truncate(2, 4).flux.value == [2, 3, 4])
    assert lc.truncate(before=2).head(1).flux.value == 2
    assert lc.truncate(after=3).tail(1).flux.value == 3
    lc["cadenceno"] = [901, 902, 903, 904, 905]
    assert all(lc.truncate(902, 904, column="cadenceno").flux.value
               == [2, 3, 4])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        lc.cycle = [11, 12, 15, 14, 13]
    assert all(lc.truncate(12, 14, column="cycle").flux.value == [2, 4, 5])


def test_periodogram_basics():
    """Reference test_periodogram.py:test_periodogram_basics — plotting,
    properties, and NaN-row tolerance."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    rng = np.random.default_rng(7)
    lc = LightCurve(time=np.arange(1000), flux=rng.normal(1, 0.1, 1000),
                    flux_err=np.zeros(1000) + 0.1).normalize()
    pg = lc.to_periodogram()
    pg.plot()
    plt.close("all")
    pg.plot(view="period")
    plt.close("all")
    pg.show_properties()
    pg.to_table()
    str(pg)
    lc[400:500] = np.nan
    lc.to_periodogram()


def test_periodogram_warnings_units():
    """Reference test_periodogram_warnings: amplitude/psd units for a
    ppm-normalized input."""
    from lightkurve_tpu.units import uHz
    rng = np.random.default_rng(8)
    lc = LightCurve(time=np.arange(1000), flux=rng.normal(1, 0.1, 1000),
                    flux_err=np.zeros(1000) + 0.1).normalize(unit="ppm")
    pg = lc.to_periodogram(normalization="amplitude")
    assert str(pg.power.unit) == "ppm"
    pg = lc.to_periodogram(freq_unit=uHz, normalization="psd")
    assert str(pg.power.unit) == "ppm2 / uHz"


def test_regressioncorrector_priors():
    """Reference test_regressioncorrector_priors: prior width steers the
    posterior exactly as in the reference (dense and sparse)."""
    from lightkurve_tpu.correctors import DesignMatrix, RegressionCorrector
    lc1 = LightCurve(flux=[5, 10])
    lc2 = LightCurve(flux=[5, 10], flux_err=[1, 1])
    design_matrix = DesignMatrix({"a": [1, 1], "b": [1, 2]})
    for dm in [design_matrix, design_matrix.to_sparse()]:
        for lc in [lc1, lc2]:
            rc = RegressionCorrector(lc)
            rc.correct(dm)
            np.testing.assert_almost_equal(rc.coefficients, [0, 5])
            dm.prior_mu = [0, 5]
            dm.prior_sigma = [1e-6, 1e-6]
            rc.correct(dm)
            np.testing.assert_almost_equal(rc.coefficients, [0, 5])
            dm.prior_mu = [99, 99]
            dm.prior_sigma = [1e-6, 1e-6]
            rc.correct(dm)
            np.testing.assert_almost_equal(rc.coefficients, [99, 99])
            dm.prior_mu = [9, 9]
            dm.prior_sigma = [1e6, 1e6]
            rc.correct(dm)
            np.testing.assert_almost_equal(rc.coefficients, [0, 5])


def test_sinusoid_noise():
    """Reference test_sinusoid_noise: regression removes an injected
    sinusoid; works without flux_err; diagnose() runs."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from lightkurve_tpu.correctors import DesignMatrix, RegressionCorrector
    size = 100
    time = np.linspace(1, 100, size)
    true_flux = np.ones(size)
    noise = np.sin(time / 5)
    true_lc = LightCurve(time=time, flux=true_flux,
                         flux_err=0.1 * np.ones(size))
    noisy_lc = LightCurve(time=time, flux=true_flux + noise,
                          flux_err=true_lc.flux_err)
    design_matrix = DesignMatrix(
        {"noise": noise, "offset": np.ones(size)}, name="noise_model")
    for dm in [design_matrix, design_matrix.to_sparse()]:
        rc = RegressionCorrector(noisy_lc)
        corrected_lc = rc.correct(dm)
        np.testing.assert_almost_equal(corrected_lc.normalize().flux.value,
                                       true_lc.flux.value)
        rc.diagnose()
        plt.close("all")
        dm.prior_mu = [0.1, 0.1]
        dm.prior_sigma = [1e6, 1e6]
        corrected_lc = RegressionCorrector(noisy_lc).correct(dm)
        np.testing.assert_almost_equal(corrected_lc.normalize().flux.value,
                                       true_lc.flux.value)
        no_err = LightCurve(time=time, flux=true_flux + noise)
        corrected_lc = RegressionCorrector(no_err).correct(dm)
        np.testing.assert_almost_equal(corrected_lc.normalize().flux.value,
                                       true_lc.flux.value)


def test_tpf_with_zero_flux_cadence():
    """Reference #873 (test_pldcorrector.py): a cadence that is entirely
    zero flux must not break PLD."""
    tpf = make_synthetic_tpf(n_cadences=120, mission="TESS")
    flux = np.array(tpf._columns["FLUX"], dtype=float)
    flux[7] = 0.0
    tpf._columns["FLUX"] = flux
    corrected = tpf.to_corrector("pld").correct()
    assert np.isfinite(corrected.flux.value).any()


def test_pld_allflux_err_nan():
    """Reference test_tpf_with_allflux_err_NaN: all-NaN flux_err makes the
    PLD fit impossible and raises ValueError."""
    from lightkurve_tpu.correctors import PLDCorrector
    tpf = make_synthetic_tpf(n_cadences=120, mission="TESS")
    tpf._columns["FLUX_ERR"] = np.full_like(
        np.asarray(tpf._columns["FLUX_ERR"], dtype=float), np.nan)
    with pytest.raises(ValueError):
        PLDCorrector(tpf).correct()


def test_pld_someflux_err_nan():
    """Reference test_tpf_with_someflux_err_NaN: scattered NaN flux_err
    entries are masked out and PLD proceeds."""
    tpf = make_synthetic_tpf(n_cadences=120, mission="TESS")
    ferr = np.array(tpf._columns["FLUX_ERR"], dtype=float)
    ferr[3, 1, 1] = np.nan
    ferr[50, 2, 4] = np.nan
    tpf._columns["FLUX_ERR"] = ferr
    corrected = tpf.to_corrector("pld").correct()
    assert np.isfinite(corrected.flux.value).any()


def test_quality_flag_decoding_kepler():
    """Reference test_utils.py:test_quality_flag_decoding_kepler."""
    from lightkurve_tpu.utils import KeplerQualityFlags
    flags = list(KeplerQualityFlags.STRINGS.items())
    for key, value in flags:
        assert KeplerQualityFlags.decode(key)[0] == value
    assert KeplerQualityFlags.decode(flags[5][0] + flags[7][0]) == [
        flags[5][1], flags[7][1]]
    assert KeplerQualityFlags.decode(
        flags[3][0] + flags[4][0] + flags[5][0]) == [
        flags[3][1], flags[4][1], flags[5][1]]


def test_quality_flag_decoding_tess():
    """Reference test_utils.py:test_quality_flag_decoding_tess."""
    from lightkurve_tpu.utils import TessQualityFlags
    flags = list(TessQualityFlags.STRINGS.items())
    for key, value in flags:
        assert TessQualityFlags.decode(key)[0] == value
    assert TessQualityFlags.decode(flags[5][0] + flags[7][0]) == [
        flags[5][1], flags[7][1]]


def test_lightkurve_warning_suppressible():
    """Reference test_utils.py:test_lightkurve_warning — LightkurveWarning
    obeys the standard warnings machinery."""
    from lightkurve_tpu.utils import LightkurveWarning
    with warnings.catch_warnings(record=True) as warns:
        warnings.simplefilter("ignore", LightkurveWarning)
        lc = LightCurve(time=[1, 2, 3], flux=[-1.0, -2.0, -3.0])
        lc.normalize()  # negative median normally warns
        assert len(warns) == 0


def test_cotrendingbasisvectors_nonretrieval():
    """Reference test_cbvcorrector.py:test_CotrendingBasisVectors_nonretrieval:
    constructor defaults, to_designmatrix, plot, align, interpolate."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.axes
    import matplotlib.pyplot as plt
    from lightkurve_tpu.correctors.cbvcorrector import CotrendingBasisVectors
    from lightkurve_tpu.lightcurve import TessLightCurve
    from lightkurve_tpu.time import Time

    cbvs = CotrendingBasisVectors(
        data={"CADENCENO": [1, 2, 3], "GAP": [False, True, False],
              "VECTOR_1": [2.0, 3.0, 4.0], "VECTOR_3": [3.0, 4.0, 5.0]},
        time=Time([443.51090033, 443.53133457, 443.55176891], format="bkjd"))
    assert cbvs.cbv_indices == [1, 3]
    assert np.allclose(cbvs.time.value,
                       [443.51090033, 443.53133457, 443.55176891])

    # auto-initialized GAP / CADENCENO
    cbvs = CotrendingBasisVectors(
        data={"VECTOR_3": [2.0, 3.0, 4.0], "VECTOR_12": [3.0, 4.0, 5.0]},
        time=Time([443.51090033, 443.53133457, 443.55176891], format="bkjd"))
    assert cbvs.cbv_indices == [3, 12]
    assert np.all(np.asarray(cbvs.gap_indicators) == [False, False, False])
    assert np.all(cbvs.cadenceno == [0, 1, 2])

    # to_designmatrix drops unknown indices and keeps requested ones
    cbvs = CotrendingBasisVectors(
        data={"CADENCENO": [1, 2, 3], "GAP": [False, True, False],
              "VECTOR_1": [1.0, 2.0, 3.0], "VECTOR_2": [4.0, 5.0, 6.0],
              "VECTOR_3": [7.0, 8.0, 9.0]},
        time=Time([1569.44053967, 1569.44192856, 1569.44331746],
                  format="btjd"))
    dm = cbvs.to_designmatrix(cbv_indices=[1, 3, 5], name="test cbv set")
    assert dm.shape == (3, 2)
    assert np.all(dm["VECTOR_1"] == [1.0, 2.0, 3.0])
    assert np.all(dm["VECTOR_3"] == [7.0, 8.0, 9.0])
    assert dm.name == "test cbv set"
    with pytest.raises(KeyError):
        dm["VECTOR_2"]

    ax = cbvs.plot(cbv_indices=[1, 2], ax=None)
    assert isinstance(ax, matplotlib.axes.Axes)
    ax = cbvs.plot(cbv_indices=[1, 2, 5], ax=ax)
    assert isinstance(ax, matplotlib.axes.Axes)
    with pytest.raises(ValueError):
        cbvs.plot(cbv_indices=[0, 1, 2], ax=ax)
    with pytest.raises(ValueError):
        cbvs.plot("Doh!")
    plt.close("all")

    # align: trims extraneous CBV cadences, gap-fills missing ones
    sample_lc = TessLightCurve(time=[1, 2, 3, 4, 6, 7],
                               flux=[1, 2, 3, 4, 6, 7],
                               flux_err=[0.1] * 6,
                               cadenceno=[1, 2, 3, 4, 6, 7])
    cbvs = CotrendingBasisVectors(
        data={"CADENCENO": [1, 2, 3, 5, 6],
              "GAP": [False, True, False, False, False],
              "VECTOR_1": [1.0, 2.0, 3.0, 5.0, 6.0]},
        time=Time([1569.43915078, 1569.44053967, 1569.44192856,
                   1569.44470635, 1569.44609524], format="btjd"))
    cbvs = cbvs.align(sample_lc)
    assert np.all(np.asarray(sample_lc["cadenceno"]) == cbvs.cadenceno)
    assert len(cbvs.cadenceno) == 6
    assert np.all(np.asarray(cbvs.gap_indicators, dtype=bool)[[1, 3, 5]])
    dm = cbvs.to_designmatrix(cbv_indices=[1])
    assert np.all(dm["VECTOR_1"][[0, 1, 2, 4]] == [1.0, 2.0, 3.0, 6.0])
    assert np.all(np.isnan(dm["VECTOR_1"][[3, 5]]))

    # interpolate onto a finer light curve; extrapolate=False zeros the tail
    nlc = 20
    x_lc = np.linspace(0.0, 2 * np.pi, num=nlc)
    sample_lc = TessLightCurve(time=x_lc, flux=np.sin(x_lc),
                               flux_err=np.full(nlc, 0.1),
                               cadenceno=np.arange(nlc))
    ncbv = 10
    x_cbv = np.linspace(0.0, 2 * np.pi, num=ncbv)
    cbvs = CotrendingBasisVectors(
        data={"CADENCENO": np.arange(ncbv), "GAP": np.full(ncbv, False),
              "VECTOR_1": np.cos(x_cbv),
              "VECTOR_2": np.sin(x_cbv + np.pi * 0.125)},
        time=Time(x_cbv, format="btjd"))
    interp = cbvs.interpolate(sample_lc, extrapolate=False)
    assert np.all(interp.time.value == sample_lc.time.value)

    x_cbv = np.linspace(0.0, 1.5 * np.pi, num=ncbv)
    cbvs = CotrendingBasisVectors(
        data={"CADENCENO": np.arange(ncbv), "GAP": np.full(ncbv, False),
              "VECTOR_1": np.cos(x_cbv),
              "VECTOR_2": np.sin(x_cbv + np.pi * 0.125)},
        time=Time(x_cbv, format="btjd"))
    interp = cbvs.interpolate(sample_lc, extrapolate=False)
    tail = np.nonzero(interp.time.value > 1.5 * np.pi)[0]
    assert np.all(np.asarray(interp["VECTOR_1"])[tail] == 0.0)
    interp = cbvs.interpolate(sample_lc, extrapolate=True)
    assert np.all(np.asarray(interp["VECTOR_1"])[tail] != 0.0)


def test_compute_correlation():
    """Reference test_metrics.py:test_compute_correlation."""
    from lightkurve_tpu.correctors.metrics import _compute_correlation
    flux_matrix = np.ones((4, 4))
    assert np.all(_compute_correlation(flux_matrix) == 1.0)
    flux_matrix = np.array([[1.0, -1.0, 1.0, -1.0],
                            [-1.0, 1.0, 1.0, -1.0],
                            [1.0, -1.0, 1.0, -1.0],
                            [-1.0, 1.0, -1.0, 1.0]])
    truth = np.array([[1.0, -1.0, 0.5, -0.5],
                      [-1.0, 1.0, -0.5, 0.5],
                      [0.5, -0.5, 1.0, -1.0],
                      [-0.5, 0.5, -1.0, 1.0]])
    np.testing.assert_allclose(_compute_correlation(flux_matrix), truth)


def test_align_to_lc():
    """Reference test_metrics.py:test_align_to_lc."""
    from lightkurve_tpu.correctors.metrics import _align_to_lc
    time = np.arange(1, 100, 0.1)
    n = len(time)
    lc1 = LightCurve(time=time, flux=np.ones(n), flux_err=np.zeros(n))
    lc1["cadenceno"] = np.arange(1, n + 1)
    lc2 = LightCurve(time=time, flux=np.full(n, 2.0), flux_err=np.zeros(n))
    lc2["cadenceno"] = np.arange(1, n + 1)
    lc1 = lc1[0:10].append(lc1[20:100])
    lc2 = lc2[0:50].append(lc2[70:100])
    aligned_lc2 = _align_to_lc(lc2, lc1)
    assert np.all(np.asarray(lc1["cadenceno"])
                  == np.asarray(aligned_lc2["cadenceno"]))


def test_filenotfound():
    """Reference io/test_read.py:test_filenotfound (#540)."""
    filename = "some/path/DOESNOTEXIST"
    with pytest.raises(FileNotFoundError) as excinfo:
        lk.read(filename)
    assert filename in str(excinfo.value)


@pytest.mark.parametrize("fits_name", [
    "test-lc-tess-pimen-corrupted.fits",
    "test-lc-tess-pimen-corrupted-at-header.fits",
    "test-lc-tess-pimen-corrupted-at-header2.fits",
    "test-tpf-kplr-tabby-corrupted.fits",
    "test-tpf-kplr-tabby-corrupted-at-header.fits",
    "test-tpf-kplr-tabby-corrupted-at-header2.fits",
    "test-tpf-tess-pimen-corrupted.fits",
    "test-tpf-tess-pimen-corrupted-at-header.fits",
    "test-tpf-tess-pimen-corrupted-at-header2.fits",
])
def test_file_corrupted(fits_name):
    """Reference io/test_read.py:test_file_corrupted (#1184): the error
    for a corrupt file names the file."""
    import os
    path = os.path.join("/root/reference/tests/data", fits_name)
    if not os.path.isfile(path):
        pytest.skip("reference fixture not available")
    with pytest.raises(BaseException) as excinfo:
        lk.read(path)
    assert path in str(excinfo.value)


def test_basic_ascii_io(tmp_path):
    """Reference io/test_read.py:test_basic_ascii_io: CSV in, tab
    round-trip, extra string columns preserved."""
    csvfile = tmp_path / "lc.csv"
    csvfile.write_text(
        "time,flux,flux_err,color\n1,2,3,red\n4,5,6,green\n7,8,9,blue")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        lc_csv = LightCurve.read(str(csvfile), format="ascii.csv")
    assert lc_csv.time.value[0] == 1
    assert lc_csv.flux.value[1] == 5
    assert lc_csv.color[2] == "blue"
    tabfile = tmp_path / "lc.tab"
    lc_csv.write(str(tabfile), format="ascii.tab", overwrite=True)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        lc_rst = LightCurve.read(str(tabfile), format="ascii.tab")
    assert lc_rst.color[2] == "blue"
    assert np.all(lc_csv == lc_rst)


def test_detect_filetype_fixture_files():
    """Reference io/test_detect.py:test_detect_filetype."""
    from lightkurve_tpu.io.detect import detect_filetype
    from lightkurve_tpu.io.fits import open_fits
    import os
    D = "/root/reference/tests/data"
    if not os.path.isdir(D):
        pytest.skip("reference fixtures not available")
    assert detect_filetype(
        open_fits(os.path.join(D, "test-tpf-star.fits"))) \
        == "KeplerTargetPixelFile"
    assert detect_filetype(
        open_fits(os.path.join(
            D, "tess25155310-s01-first-cadences.fits.gz"))) \
        == "TessTargetPixelFile"


def test_lightcurve_scatter():
    """Reference test_lightcurve_scatter (driven by a synthetic curve in
    place of the remote Kepler-10 download): scatter on raw and folded
    light curves, with per-point colors."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    rng = np.random.default_rng(11)
    t = np.arange(0, 20, 0.01)
    lc = LightCurve(time=t,
                    flux=1 + 1e-4 * np.sin(2 * np.pi * t / 0.837491)
                    + 1e-5 * rng.standard_normal(len(t)),
                    flux_err=np.full(len(t), 1e-5)).flatten()
    foldkw = dict(period=0.837491)
    originaltime = LightCurve(time=lc.time, flux=lc.flux)
    foldedtimeinorder = originaltime.fold(**foldkw).flux
    fi, ax = plt.subplots(2, 2, figsize=(10, 6), sharey=True, sharex="col")
    scatterkw = dict(s=5, cmap="winter")
    lc.scatter(ax=ax[0, 0])
    lc.fold(**foldkw).scatter(ax=ax[0, 1])
    lc.scatter(ax=ax[1, 0], c=lc.time.value, **scatterkw)
    lc.fold(**foldkw).scatter(ax=ax[1, 1], c=foldedtimeinorder.value,
                              **scatterkw)
    plt.close("all")


def test_lightcurve_plots_unitless():
    """Reference test_lightcurve_plots_unitless."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    lc = LightCurve(time=np.arange(10))
    lc.flux = np.append(np.zeros(3), np.ones(7))
    lc.flux_err = np.zeros(10)
    lc.plot()
    lc.scatter()
    lc.errorbar()
    lc.plot(normalize=True, clip_outliers=True)
    plt.close("all")


def test_regression_346(tmp_path):
    """Mirror of reference test_lightcurve.py:test_regression_346 (#346):
    the v1 file-shim chain KeplerLightCurveFile → .PDCSAP_FLUX →
    remove_nans → to_corrector → correct → estimate_cdpp must run
    without IndexError."""
    import warnings
    import lightkurve_tpu as lk
    from lightkurve_tpu.utils import LightkurveDeprecationWarning
    from lightkurve_tpu.io.fits import (BinTableHDU, Header, HDUList,
                                        PrimaryHDU, write_fits)
    rng = np.random.default_rng(4)
    n = 300
    t = 2000.0 + np.arange(n) * 0.0204
    arclength = np.sin(2 * np.pi * t / 0.3)   # K2 roll systematics proxy
    flux = (1.0 + 0.002 * arclength
            + 50e-6 * rng.standard_normal(n)).astype(np.float64)
    flux[10] = np.nan
    tab = BinTableHDU(data={
        "TIME": t, "SAP_FLUX": flux, "PDCSAP_FLUX": flux,
        "SAP_QUALITY": np.zeros(n, np.int32),
        "MOM_CENTR1": 25.0 + 0.01 * arclength,
        "MOM_CENTR2": 25.0 + 0.01 * np.cos(2 * np.pi * t / 0.3)},
        header=Header({"EXTNAME": "LIGHTCURVE", "BJDREFI": 2454833,
                       "BJDREFF": 0.0, "TELESCOP": "Kepler"}))
    path = str(tmp_path / "kplr2_lc.fits")
    write_fits(HDUList([PrimaryHDU(header=Header({
        "TELESCOP": "Kepler", "KEPLERID": 346, "OBSMODE": "long cadence",
        "CREATOR": "FluxExporter2PipelineModule",
        "MISSION": "K2"})), tab]), path)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", LightkurveDeprecationWarning)
        cdpp = (lk.KeplerLightCurveFile(path).PDCSAP_FLUX.remove_nans()
                .to_corrector().correct().estimate_cdpp())
    assert np.isfinite(float(cdpp))


def test_lightcurvefile_repr(tmp_path):
    """Mirror of reference test_lightcurvefile_repr: __str__/__repr__ on
    read mission products."""
    from lightkurve_tpu import KeplerLightCurve, TessLightCurve
    from tests.io.test_fits import make_tess_lc_file
    path = str(tmp_path / "t_lc.fits")
    make_tess_lc_file(path)
    lcf = TessLightCurve.read(path)
    str(lcf)
    repr(lcf)


def test_to_corrector():
    """Mirrors reference test_correctors.py::test_to_corrector (gated
    remote upstream only because its fixture TPF downloads from MAST):
    tpf.to_corrector('pld').correct() returns a light curve of the TPF's
    length."""
    tpf = make_synthetic_tpf(n_cadences=120, mission="TESS")
    lc = tpf.to_corrector("pld").correct()
    assert len(lc.flux) == len(tpf.time)
