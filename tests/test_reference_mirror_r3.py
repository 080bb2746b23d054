"""Round-3 mirrors of reference tests with no same-name analogue here.

Each test re-implements the BEHAVIOR of a reference test (cited per test)
on synthetic in-memory data — no network, no astropy.
"""
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
