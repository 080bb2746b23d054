"""Savitzky-Golay filtering as gathers + matmuls (TPU-friendly).

The reference's ``flatten`` wraps ``scipy.signal.savgol_filter`` with the
default ``mode='interp'`` edge handling (``lightcurve.py:1040-1046``).  In
'interp' mode every output sample is the value at position ``k`` of a
least-squares degree-``polyorder`` polynomial fitted to a length-``w`` window
anchored inside the array: interior points use the centered window
(``k = w//2``), edge points re-use the first/last full window with ``k``
shifted.  That formulation maps directly onto TPU as a static ``(w, w)``
projection matrix ``H = V (VᵀV)⁻¹ Vᵀ`` plus per-point window gathers — and it
generalizes for free to gap-segmented light curves by anchoring windows
inside each segment instead of the whole array.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["savgol_design_matrix", "savgol_filter_interp"]


def savgol_design_matrix(window_length: int, polyorder: int) -> np.ndarray:
    """Host-side (w, w) projection matrix of the degree-``polyorder`` LSQ fit.

    Row ``k`` gives the weights producing the fitted polynomial value at
    window position ``k``; row ``w//2`` equals scipy's convolution
    coefficients (up to reflection).
    """
    w = int(window_length)
    if w % 2 != 1 or w < 1:
        raise ValueError("window_length must be a positive odd integer")
    if polyorder >= w:
        raise ValueError("polyorder must be less than window_length")
    # Use centered positions for numerical conditioning.
    pos = np.arange(w, dtype=np.float64) - (w - 1) / 2.0
    V = np.vander(pos, N=polyorder + 1, increasing=True)
    H = V @ np.linalg.pinv(V)
    return H


def savgol_filter_interp(x, H, seg_lo=None, seg_hi=None):
    """Apply SG smoothing with 'interp' edges, segment-aware.

    Parameters
    ----------
    x : (..., n) array of samples.
    H : (w, w) projection matrix from :func:`savgol_design_matrix`.
    seg_lo, seg_hi : optional int arrays broadcastable to ``x.shape``:
        for each sample, the [lo, hi) bounds of its contiguous segment.
        Defaults to the whole axis.  Segments shorter than ``w`` produce
        garbage for their samples — callers must overwrite them (the
        reference uses the segment median, ``lightcurve.py:1035-1038``).

    Returns
    -------
    trend : same shape as ``x``.
    """
    H = jnp.asarray(H, dtype=x.dtype)
    w = H.shape[0]
    hw = w // 2
    n = x.shape[-1]
    idx = jnp.arange(n)
    if seg_lo is None:
        seg_lo = jnp.zeros((n,), dtype=jnp.int32)
    if seg_hi is None:
        seg_hi = jnp.full((n,), n, dtype=jnp.int32)
    seg_lo = jnp.broadcast_to(seg_lo, x.shape).astype(jnp.int32)
    seg_hi = jnp.broadcast_to(seg_hi, x.shape).astype(jnp.int32)

    # anchored window start per sample
    start = jnp.clip(idx - hw, seg_lo, jnp.maximum(seg_lo, seg_hi - w))
    offset = (idx - start).astype(jnp.int32)            # position inside window
    win_idx = jnp.clip(start[..., None] + jnp.arange(w), 0, n - 1)  # (..., n, w)
    x_win = jnp.take_along_axis(
        x, win_idx.reshape(x.shape[:-1] + (-1,)), axis=-1
    ).reshape(x.shape + (w,))
    weights = H[offset]                                  # (..., n, w)
    return jnp.sum(weights * x_win, axis=-1)
