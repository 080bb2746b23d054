"""Batched linear-algebra kernels for the corrector stack.

TPU equivalents of the reference's normal-equation solves
(``regressioncorrector.py:127-189``: Bayesian ridge with Gaussian priors),
its iterative sigma-clip refit loop (``:243-273``), and fbpca's randomized
PCA (``designmatrix.py:252-282``).  All operate on dense arrays and are
vmappable over leading target axes; the solves hit the MXU as matmuls +
Cholesky.
"""
from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp

from .stats import sigma_clip_mask

__all__ = ["solve_regression", "iterative_clipped_regression",
           "randomized_pca", "chol_solve_small", "elasticnet_fista"]


def chol_solve_small(A, b):
    """``x = A⁻¹ b`` for a small static-k symmetric-PD system, unrolled.

    Sibling of ``ops.lombscargle._chol_quadform_rows`` (which stops at
    the quadform): batched ``jnp.linalg.solve`` lowers to scalar
    LU-pivot loops on TPU, so for the k ≲ 16 systems of the PRF
    Levenberg-Marquardt steps the O(k³/3) unrolled recurrences —
    pure elementwise ops over any leading batch axes — are far faster.
    ``A`` is (..., k, k), ``b`` is (..., k); returns (..., k).
    """
    M = A.shape[-1]
    L = [[None] * M for _ in range(M)]
    inv = [None] * M
    for i in range(M):
        d = A[..., i, i]
        for kk in range(i):
            d = d - L[i][kk] * L[i][kk]
        Lii = jnp.sqrt(jnp.maximum(d, 1e-30))
        inv[i] = 1.0 / Lii
        L[i][i] = Lii
        for j in range(i + 1, M):
            s = A[..., j, i]
            for kk in range(i):
                s = s - L[j][kk] * L[i][kk]
            L[j][i] = s * inv[i]
    z = [None] * M                       # forward: L z = b
    for i in range(M):
        s = b[..., i]
        for kk in range(i):
            s = s - L[i][kk] * z[kk]
        z[i] = s * inv[i]
    x = [None] * M                       # back: Lᵀ x = z
    for i in reversed(range(M)):
        s = z[i]
        for kk in range(i + 1, M):
            s = s - L[kk][i] * x[kk]
        x[i] = s * inv[i]
    return jnp.stack(x, axis=-1)


def _true_f32(fn):
    """Force full-f32 matmuls: TPU DEFAULT precision truncates f32 inputs
    to bf16 on the MXU, which corrupts normal-equation solves.  Corrector
    matrices are (n, k≲100) — the 3-pass cost is negligible."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapper


@_true_f32
def solve_regression(X, y, flux_err, mask, prior_mu=None, prior_sigma=None):
    """Weighted ridge solve:  w = (XᵀΣ⁻¹X + Λ)⁻¹ (XᵀΣ⁻¹y + Λμ).

    Parameters
    ----------
    X : (n, k) design matrix.
    y : (n,) data.
    flux_err : (n,) per-sample σ.
    mask : (n,) bool — True rows participate (replaces row deletion).
    prior_mu, prior_sigma : (k,) Gaussian priors (σ=inf → unregularized).

    Returns
    -------
    w : (k,) coefficients;  sigma_w_inv : (k, k) posterior precision.
    """
    inv_var = jnp.where(mask, 1.0 / jnp.square(flux_err), 0.0)
    Xw = X * inv_var[:, None]
    sigma_w_inv = X.T @ Xw
    B = Xw.T @ y
    if prior_sigma is not None:
        prec = 1.0 / jnp.square(prior_sigma)
        sigma_w_inv = sigma_w_inv + jnp.diag(prec)
        if prior_mu is not None:
            B = B + prior_mu * prec
    w = jnp.linalg.solve(sigma_w_inv, B)
    return w, sigma_w_inv


@_true_f32
@partial(jax.jit, static_argnames=("niters", "clip_maxiters"))
def iterative_clipped_regression(X, y, flux_err, mask, prior_mu, prior_sigma,
                                 sigma=5.0, niters=5, clip_maxiters=5):
    """The RegressionCorrector fit loop as a fixed-iteration device program.

    Each iteration solves the ridge system on the current mask, then rejects
    residual outliers with astropy-style sigma clipping
    (``regressioncorrector.py:245-273``).  Returns (w, final mask, model).
    """
    k = X.shape[1]

    def body(_, carry):
        m, _, _ = carry
        # fit on the CURRENT mask, then update the mask — the reference
        # keeps the coefficients of the final fit made BEFORE the last
        # outlier update (regressioncorrector.py:245-276)
        w, sigma_w_inv = solve_regression(X, y, flux_err, m, prior_mu,
                                          prior_sigma)
        model = X @ w
        resid = y - model
        outlier = sigma_clip_mask(resid, mask=m, sigma=sigma,
                                  maxiters=clip_maxiters)
        return m & ~outlier, w, sigma_w_inv

    # initial carry derived from X (not fresh zeros) so that under
    # shard_map the carry is device-varying like the body's outputs
    w0 = X[0] * 0.0
    s0 = jnp.outer(w0, w0)
    m, w, sigma_w_inv = jax.lax.fori_loop(
        0, niters, body, (mask, w0, s0))
    return w, m, sigma_w_inv


@_true_f32
@partial(jax.jit, static_argnames=("max_iter",))
def elasticnet_fista(X, y, alpha, l1_ratio, tol=1e-14, max_iter=50_000):
    """ElasticNet via FISTA (accelerated proximal gradient) with adaptive
    restart — the device replacement for sklearn's Cython coordinate
    descent (reference ``correctors/cbvcorrector.py:294-395`` delegates to
    ``sklearn.linear_model.ElasticNet``).

    Minimizes sklearn's objective (``fit_intercept=False``)::

        1/(2n) ||y - Xw||²  +  α·ρ·||w||₁  +  α(1-ρ)/2·||w||²

    The design matrices here are skinny (n cadences × k ≲ 40 CBV columns),
    so the problem is pre-reduced to its normal-equation form — ``G = XᵀX/n``
    and ``c = Xᵀy/n`` — making every FISTA iteration an O(k²) matvec; tens
    of thousands of iterations cost less than one host↔device round trip.
    The Lipschitz constant is λmax(G) + α(1-ρ) (exact, via ``eigvalsh`` on
    the tiny k×k Gram).  Gradient-scheme adaptive restart (O'Donoghue &
    Candès 2015) keeps the linear rate on the strongly-convex CBV fits.

    Returns ``w`` (k,) — converged to the unique minimizer, which is what
    sklearn's coordinate descent converges to; parity is checked at 1e-6
    in ``tests/correctors/test_elasticnet_parity.py``.
    """
    n = X.shape[0]
    G = (X.T @ X) / n
    c = (X.T @ y) / n
    lam1 = alpha * l1_ratio
    lam2 = alpha * (1.0 - l1_ratio)
    L = jnp.linalg.eigvalsh(G)[-1] + lam2
    step = 1.0 / jnp.maximum(L, jnp.finfo(X.dtype).tiny)
    thr = lam1 * step

    def grad(w):
        return G @ w - c + lam2 * w

    def prox_step(v):
        z = v - step * grad(v)
        return jnp.sign(z) * jnp.maximum(jnp.abs(z) - thr, 0.0)

    k = X.shape[1]
    w0 = jnp.zeros((k,), X.dtype)

    def cond(carry):
        i, w, w_prev, _, _, delta = carry
        scale = jnp.maximum(1.0, jnp.max(jnp.abs(w)))
        return (i < max_iter) & (delta > tol * scale)

    def body(carry):
        i, w, _, v, t, _ = carry
        w_new = prox_step(v)
        # gradient-scheme restart: momentum fights descent → reset t
        restart = jnp.dot(v - w_new, w_new - w) > 0.0
        t = jnp.where(restart, 1.0, t)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        v_new = w_new + ((t - 1.0) / t_new) * (w_new - w)
        delta = jnp.max(jnp.abs(w_new - w))
        return i + 1, w_new, w, v_new, t_new, delta

    init = (jnp.asarray(0), w0, w0, w0, jnp.asarray(1.0, X.dtype),
            jnp.asarray(jnp.inf, X.dtype))
    _, w, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    return w


@_true_f32
def randomized_pca(A, k, n_iter=10, seed=0, oversample=2):
    """Randomized-SVD PCA (Halko et al. 2011), the fbpca.pca equivalent.

    Returns (U, s, Vt) truncated to ``k`` components.  Deterministic for a
    given ``seed`` — the reference's fbpca draws unseeded Gaussians, so
    parity tests compare subspaces, not signs (SURVEY.md §7 hard part (f)).
    """
    m, n = A.shape
    l = min(k + oversample, min(m, n))
    key = jax.random.PRNGKey(seed)
    G = jax.random.normal(key, (n, l), dtype=A.dtype)
    Q = A @ G
    Q, _ = jnp.linalg.qr(Q)
    for _ in range(n_iter):
        Q, _ = jnp.linalg.qr(A.T @ Q)
        Q, _ = jnp.linalg.qr(A @ Q)
    B = Q.T @ A                     # (l, n)
    Ub, s, Vt = jnp.linalg.svd(B, full_matrices=False)
    U = Q @ Ub
    return U[:, :k], s[:k], Vt[:k]
