"""Parity of the JAX FISTA ElasticNet against sklearn's coordinate descent.

The reference delegates ``correct_elasticnet`` to
``sklearn.linear_model.ElasticNet`` (reference
``correctors/cbvcorrector.py:294-395``); our solver
(``ops.solve.elasticnet_fista``) minimizes the identical objective with a
``lax.while_loop`` FISTA iteration.  Both converge to the unique minimizer,
so the coefficient vectors must agree — these tests pin that at 1e-6.
sklearn is a test-only oracle here (the package itself never imports it).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from lightkurve_tpu.ops.solve import elasticnet_fista

sklearn_linear = pytest.importorskip("sklearn.linear_model")


def _fista(X, y, alpha, l1_ratio):
    return np.asarray(elasticnet_fista(
        jnp.asarray(X), jnp.asarray(y), float(alpha), float(l1_ratio)))


def _sklearn(X, y, alpha, l1_ratio):
    reg = sklearn_linear.ElasticNet(alpha=alpha, l1_ratio=l1_ratio,
                                    fit_intercept=False, tol=1e-14,
                                    max_iter=1_000_000)
    reg.fit(X, y)
    return reg.coef_


def _problem(n=400, k=8, seed=0, collinear=False):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, k))
    if collinear:
        X[:, -1] = X[:, 0] + 0.01 * rng.standard_normal(n)
    w_true = np.zeros(k)
    w_true[: k // 2] = rng.standard_normal(k // 2) * 3.0
    y = X @ w_true + 0.1 * rng.standard_normal(n)
    return X, y


@pytest.mark.parametrize("alpha,l1_ratio", [
    (1e-4, 0.5),     # CBVCorrector default-ish regime
    (1e-2, 0.01),    # near-ridge (reference default l1_ratio=0.01)
    (1e-2, 0.99),    # near-lasso
    (1.0, 0.5),      # strong regularization → sparse solution
    (1e-20, 0.5),    # effectively OLS (test_cbvcorrector_local regime)
])
def test_fista_matches_sklearn(alpha, l1_ratio):
    X, y = _problem()
    ours = _fista(X, y, alpha, l1_ratio)
    ref = _sklearn(X, y, alpha, l1_ratio)
    scale = max(1.0, np.max(np.abs(ref)))
    np.testing.assert_allclose(ours, ref, atol=1e-6 * scale, rtol=1e-6)


def test_fista_sparsity_pattern():
    """Strong L1 must drive coefficients exactly to zero (soft threshold),
    matching sklearn's support."""
    X, y = _problem(seed=3)
    ours = _fista(X, y, 1.0, 0.9)
    ref = _sklearn(X, y, 1.0, 0.9)
    assert np.array_equal(ours == 0.0, ref == 0.0)
    assert (ours == 0.0).any()


def test_fista_collinear_columns():
    """Ill-conditioned design (nearly duplicate columns): the restart keeps
    FISTA converging to the same minimizer sklearn finds."""
    X, y = _problem(collinear=True, seed=5)
    ours = _fista(X, y, 1e-3, 0.5)
    ref = _sklearn(X, y, 1e-3, 0.5)
    scale = max(1.0, np.max(np.abs(ref)))
    np.testing.assert_allclose(ours, ref, atol=2e-6 * scale, rtol=2e-6)


def test_cbv_fixture_parity(rng):
    """End-to-end through CBVCorrector-shaped inputs: CBV-style design
    matrix (sinusoid + cosine + ramp + constant) against sklearn."""
    n = 400
    t = 1500.0 + np.arange(n) * 0.02
    X = np.stack([np.sin(2 * np.pi * t / 1.3),
                  np.cos(2 * np.pi * t / 1.3),
                  np.linspace(-1, 1, n),
                  np.ones(n)], axis=1)
    y = 1000.0 * (1 + 0.004 * X[:, 0] - 0.002 * X[:, 1]) \
        + 0.3 * rng.standard_normal(n)
    for alpha, l1_ratio in [(1e-4, 0.5), (1e-2, 0.01), (10.0, 0.5)]:
        ours = _fista(X, y, alpha, l1_ratio)
        ref = _sklearn(X, y, alpha, l1_ratio)
        scale = max(1.0, np.max(np.abs(ref)))
        np.testing.assert_allclose(ours, ref, atol=1e-6 * scale,
                                   rtol=1e-6,
                                   err_msg=f"alpha={alpha} ρ={l1_ratio}")


def test_package_has_no_sklearn_import():
    """The honesty contract from VERDICT r4: no sklearn anywhere in the
    package's import graph (docstring at cbvcorrector.py:8 claims a JAX
    FISTA solver — it must be true)."""
    import pathlib

    import lightkurve_tpu
    pkg = pathlib.Path(lightkurve_tpu.__file__).parent
    offenders = []
    for path in pkg.rglob("*.py"):
        src = path.read_text()
        for line in src.splitlines():
            stripped = line.strip()
            if stripped.startswith(("import sklearn", "from sklearn")):
                offenders.append(str(path))
    assert not offenders, f"sklearn imports found: {offenders}"
