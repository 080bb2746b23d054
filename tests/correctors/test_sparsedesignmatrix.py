"""Mirrors of reference tests/correctors/test_sparsedesignmatrix.py.

Our SparseDesignMatrix is a dense-backed API alias by design (TPU kernels
are dense; see ``lightkurve_tpu/correctors/designmatrix.py:6-9``), so the
dense↔sparse conversion *warnings* do not apply — every functional
assertion from the reference file is mirrored here, including accepting
``scipy.sparse`` inputs.
"""
import warnings

import numpy as np
import pytest
from numpy.testing import assert_array_equal
from scipy import sparse

from lightkurve_tpu.correctors import (DesignMatrix,
                                       DesignMatrixCollection,
                                       SparseDesignMatrix,
                                       SparseDesignMatrixCollection)
from lightkurve_tpu.correctors.designmatrix import (
    create_sparse_spline_matrix, create_spline_matrix)
from lightkurve_tpu.utils import LightkurveWarning


def test_designmatrix_basics():
    """Can we create a sparse design matrix from a csr matrix?"""
    size, name = 10, "testmatrix"
    arr = np.vstack([np.ones(size), np.arange(size),
                     np.arange(size) ** 2]).T
    X = sparse.csr_matrix(arr)
    dm = SparseDesignMatrix(X, name=name,
                            columns=["vector1", "vector2", "vector3"])
    assert dm.columns == ["vector1", "vector2", "vector3"]
    assert dm.name == name
    assert dm.shape == (size, 3)
    dm.plot()
    dm.plot_priors()
    assert dm.append_constant().shape == (size, 4)
    assert dm.pca(nterms=2).shape == (size, 2)
    assert dm.split([5]).shape == (size, 6)
    dm.__repr__()

    dm = SparseDesignMatrix(X, name=name,
                            columns=["vector1", "vector2", "vector3"])
    dm.append_constant(inplace=True)
    assert dm.shape == (size, 4)

    dm = SparseDesignMatrix(X, name=name,
                            columns=["vector1", "vector2", "vector3"])
    dm.split([5], inplace=True)
    assert dm.shape == (size, 6)

    import matplotlib.pyplot as plt
    plt.close("all")


def test_split():
    X = sparse.csr_matrix(
        np.vstack([np.linspace(0, 9, 10), np.linspace(100, 109, 10)]).T)
    dm = SparseDesignMatrix(X, columns=["a", "b"])
    assert dm.shape == (10, 2)
    assert dm.split(2).shape == (10, 4)
    assert dm.split([2, 8]).shape == (10, 6)
    # new areas are zero-padded
    assert (dm.split([2, 8]).values[2:, 0:2] == 0).all()
    assert (dm.split([2, 8]).values[:8, 4:] == 0).all()
    # column names unique
    assert len(set(dm.split(4).columns)) == 4


def test_standardize():
    X = sparse.csr_matrix(np.vstack([np.ones(10)]).T)
    dm = SparseDesignMatrix(X, columns=["const"])
    assert (np.asarray(dm.standardize()["const"])
            == np.asarray(dm["const"])).all()
    rng = np.random.default_rng(0)
    X = sparse.csr_matrix(np.vstack([rng.normal(5, 3, 100)]).T)
    dm = SparseDesignMatrix(X, columns=["normal"])
    assert np.round(np.mean(dm.standardize()["normal"]), 3) == 0
    assert np.round(np.std(dm.standardize()["normal"]), 1) == 1
    dm.standardize(inplace=True)


def test_pca():
    rng = np.random.default_rng(1)
    size = 10
    dm = DesignMatrix({"a": rng.normal(10, 20, size),
                       "b": rng.normal(40, 10, size),
                       "c": rng.normal(60, 5, size)}).to_sparse()
    for nterms in [1, 2, 3]:
        assert dm.pca(nterms=nterms).shape == (size, nterms)


def test_collection_basics():
    size = 5
    dm1 = DesignMatrix(np.ones((size, 1)), columns=["col1"],
                       name="matrix1").to_sparse()
    dm2 = DesignMatrix(np.zeros((size, 2)), columns=["col2", "col3"],
                       name="matrix2").to_sparse()

    dmc = SparseDesignMatrixCollection([dm1, dm2])
    assert_array_equal(dmc["matrix1"].values, dm1.values)
    assert_array_equal(dmc["matrix2"].values, dm2.values)
    assert_array_equal(dmc.values, np.hstack((dm1.values, dm2.values)))
    dmc.plot()
    dmc.__repr__()

    dmc = dm1.collect(dm2)
    assert_array_equal(dmc["matrix1"].values, dm1.values)
    assert_array_equal(dmc["matrix2"].values, dm2.values)

    # mixed dense/sparse members are accepted (dense-backed design: no
    # conversion warnings are necessary)
    dm1d = DesignMatrix(np.ones((size, 1)), columns=["col1"],
                        name="matrix1")
    dmc = SparseDesignMatrixCollection([dm1d, dm2])
    dmc.plot()
    dmc.__repr__()
    assert isinstance(dmc.to_designmatrix(), SparseDesignMatrix)

    import matplotlib.pyplot as plt
    plt.close("all")


def test_designmatrix_rank():
    dm = DesignMatrix({"a": [1, 2, 3]}).to_sparse()
    assert dm.rank == 1
    dm.validate(rank=True)  # no warning expected

    with pytest.warns(LightkurveWarning, match="rank"):
        dm = DesignMatrix({"a": [1, 2, 3], "b": [1, 1, 1], "c": [1, 1, 1],
                           "d": [1, 1, 1], "e": [3, 4, 5]})
        dm.validate(rank=True)
    dm = dm.to_sparse()
    assert dm.rank == 2
    with pytest.warns(LightkurveWarning, match="rank"):
        # our SparseDesignMatrix.validate defaults rank off (dense-backed);
        # explicit rank=True must still warn like the reference
        DesignMatrix({"a": [1, 2, 3], "b": [1, 1, 1], "c": [1, 1, 1],
                      "d": [1, 1, 1], "e": [3, 4, 5]}).validate(rank=True)


def test_splines():
    """Dense and sparse splines produce the same answer."""
    x = np.linspace(0, 1, 100)
    spline_dense = create_spline_matrix(x, knots=[0.1, 0.3, 0.6, 0.9],
                                        degree=2)
    spline_sparse = create_sparse_spline_matrix(
        x, knots=[0.1, 0.3, 0.6, 0.9], degree=2)
    assert np.allclose(spline_dense.values, spline_sparse.values)
    assert isinstance(spline_dense, DesignMatrix)
    assert isinstance(spline_sparse, SparseDesignMatrix)
