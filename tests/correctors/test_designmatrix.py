"""DesignMatrix tests (mirrors reference tests/correctors/test_designmatrix.py)."""
import numpy as np
import pytest

from lightkurve_tpu.correctors import (DesignMatrix, DesignMatrixCollection,
                                       SparseDesignMatrix,
                                       create_spline_matrix,
                                       create_sparse_spline_matrix)
from lightkurve_tpu.utils import LightkurveWarning


def test_basics():
    dm = DesignMatrix(np.arange(100), name="slope")
    assert dm.shape == (100, 1)
    assert repr(dm) == "slope DesignMatrix (100, 1)"
    dm = DesignMatrix({"a": np.ones(5), "b": np.arange(5)})
    assert dm.shape == (5, 2)
    assert dm.columns == ["a", "b"]
    assert np.allclose(dm["b"], np.arange(5))
    # default priors
    assert np.all(dm.prior_mu == 0)
    assert np.all(np.isinf(dm.prior_sigma))


def test_split():
    """Reference designmatrix.py:167-214: split at row indices."""
    dm = DesignMatrix({"a": np.ones(10), "b": np.arange(10)},
                      prior_mu=[1, 2], prior_sigma=[3, 4])
    s = dm.split([3, 7])
    assert s.shape == (10, 6)
    # rows outside each segment are zero
    assert np.all(s.values[3:, 0] == 0)
    assert np.all(s.values[:3, 2] == 0)
    assert np.all(s.values[7:, 2] == 0)
    # priors tiled
    assert np.allclose(s.prior_mu, [1, 2, 1, 2, 1, 2])
    assert np.allclose(s.prior_sigma, [3, 4, 3, 4, 3, 4])
    # reconstruction: sum of split columns == original
    recon = s.values[:, 0::2].sum(axis=1)
    assert np.allclose(recon, dm.values[:, 0])
    # no-op splits
    assert dm.split([0]).shape == dm.shape


def test_standardize():
    """Reference designmatrix.py:216-250."""
    col = np.concatenate([np.zeros(5), np.arange(1, 6, dtype=float)])
    dm = DesignMatrix({"a": col, "const": np.ones(10)})
    s = dm.standardize()
    nz = col != 0
    assert np.isclose(np.nanmedian(s.values[nz, 0]), 0, atol=1e-12)
    # constant column unchanged
    assert np.allclose(s.values[:, 1], 1.0)


def test_pca():
    rng = np.random.default_rng(0)
    base = rng.normal(size=(200, 3))
    X = base @ rng.normal(size=(3, 10))  # rank 3
    dm = DesignMatrix(X, name="pld")
    r = dm.pca(nterms=3)
    assert r.shape == (200, 3)
    # PCA is mean-centered (fbpca.pca raw=False semantics): the basis
    # spans the centered column space
    Xc = X - X.mean(axis=0, keepdims=True)
    U = r.values
    proj = U @ (U.T @ Xc)
    assert np.allclose(proj, Xc, atol=1e-6)
    # nterms capped at n columns
    assert dm.pca(nterms=99).shape[1] == 10


def test_append_constant_and_validate():
    dm = DesignMatrix(np.arange(10), name="slope").append_constant()
    assert dm.shape == (10, 2)
    assert dm.columns[-1] == "offset"
    assert np.all(dm.values[:, -1] == 1)
    # low-rank warning (reference designmatrix.py:306-349)
    dup = DesignMatrix(np.tile(np.arange(10.0)[:, None], (1, 4)))
    with pytest.warns(LightkurveWarning, match="low rank"):
        dup.validate()
    bad = DesignMatrix(np.arange(10), prior_sigma=[0.0])
    with pytest.raises(ValueError):
        bad.validate()
    bad2 = DesignMatrix(np.arange(10), prior_mu=[1, 2])
    with pytest.raises(ValueError):
        bad2.validate()


def test_collection():
    dm1 = DesignMatrix(np.ones((10, 2)), name="a", prior_mu=[1, 1],
                       prior_sigma=[2, 2])
    dm2 = DesignMatrix(np.arange(10), name="b")
    dmc = DesignMatrixCollection([dm1, dm2])
    assert dmc.X.shape == (10, 3)
    assert np.allclose(dmc.prior_mu, [1, 1, 0])
    assert dmc["a"] is dm1
    assert dmc[1] is dm2
    flat = dmc.to_designmatrix(name="flat")
    assert flat.shape == (10, 3)
    with pytest.raises(KeyError):
        dmc["nope"]


def test_spline_matrix():
    x = np.linspace(0, 10, 200)
    dm = create_spline_matrix(x, n_knots=8, degree=3)
    assert dm.shape == (200, 8)
    # B-spline partition of unity
    assert np.allclose(dm.values.sum(axis=1), 1.0, atol=1e-9)
    # each basis non-negative, compactly supported
    assert (dm.values >= -1e-12).all()
    # custom knots
    dm2 = create_spline_matrix(x, knots=[3.0, 7.0], degree=3)
    assert dm2.shape[0] == 200
    # sparse variant is API-compatible
    dm3 = create_sparse_spline_matrix(x, n_knots=8)
    assert isinstance(dm3, SparseDesignMatrix)
    assert np.allclose(dm3.values, dm.values)


def test_spline_fits_smooth_function(rng):
    """The spline basis must be able to represent a smooth trend."""
    x = np.linspace(0, 10, 500)
    y = np.sin(x) + 0.5 * x
    dm = create_spline_matrix(x, n_knots=20, degree=3)
    coef, *_ = np.linalg.lstsq(dm.values, y, rcond=None)
    resid = y - dm.values @ coef
    assert np.max(np.abs(resid)) < 1e-2
