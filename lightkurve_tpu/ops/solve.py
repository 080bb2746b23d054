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
           "randomized_pca", "chol_solve_small"]


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
