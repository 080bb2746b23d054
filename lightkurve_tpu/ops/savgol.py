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
import jax
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

    Notes
    -----
    Non-finite and out-of-segment samples are treated as the in-segment
    mean for the matmul (exact for every valid output, whose anchored
    window never touches them).  Direct callers must therefore remove or
    segment-bound NaNs themselves — a window CONTAINING a NaN does not
    propagate NaN here, unlike ``scipy.signal.savgol_filter``.

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

    # Static-shift + matmul formulation (no O(n·w) window gather — TPU
    # gathers made this the pipeline bottleneck, 18 s for a (512, 8192)
    # flatten vs 0.15 s for the BLS search it feeds):
    #   trend_i = Σ_j H[o_i, j] x[i + j - o_i] = Σ_s x[i+s]·W[o_i, s+w-1]
    # with W[o, s+w-1] = H[o, o+s].  The shifted stack S[..., i, k] =
    # x[i + k - (w-1)] is w static slices; trend under EVERY window offset
    # is one MXU matmul S·Wᵀ, and the per-sample offset picks its column.
    # SG reproduces constants exactly (H rows sum to 1), so mean-shifting
    # x keeps the matmul's bf16 input rounding (TPU DEFAULT precision)
    # relative to the signal and is undone exactly on return.
    # the contraction multiplies out-of-window neighbors by 0, and invalid
    # (NaN or out-of-segment) samples may sit within w-1 positions of a
    # segment — zero them (a valid output's anchored window always lies
    # inside its own [seg_lo, seg_hi), so this is exact).  The mean shift
    # must likewise use only IN-SEGMENT samples: padded stacks zero-fill
    # up to 50% of a row, and a mean dragged toward 0 by padding leaves
    # xc ~ O(1) for real samples, forfeiting the bf16 input-rounding
    # protection the shift exists for (TPU DEFAULT matmul precision).
    in_seg = (idx >= seg_lo) & (idx < seg_hi) & jnp.isfinite(x)
    x0 = jnp.where(in_seg, x, 0.0)
    mu = (jnp.sum(x0, axis=-1, keepdims=True)
          / jnp.maximum(jnp.sum(in_seg, axis=-1, keepdims=True), 1))
    xc = x0 - mu
    pad = [(0, 0)] * (x.ndim - 1) + [(w - 1, w - 1)]
    xp = jnp.pad(xc, pad)
    o = np.arange(w)[:, None]
    j = np.arange(2 * w - 1)[None, :] - (w - 1) + o      # host index tables
    W = jnp.where(jnp.asarray((j >= 0) & (j < w)),
                  jnp.take_along_axis(H, jnp.asarray(np.clip(j, 0, w - 1)),
                                      axis=1), 0.0)      # (w, 2w-1)
    import os
    if os.environ.get("LK_SAVGOL_IMPL", "conv") == "conv":
        # one w-feature convolution instead of materializing the
        # (..., n, 2w-1) shifted stack (3.4 GB at (512, 8192, 101) —
        # the stack+einsum form measured 227 ms on a v5e, the conv 9 ms)
        lead = xp.shape[:-1]
        xin = xp.reshape((-1, 1, xp.shape[-1]))          # (B', 1, n+2w-2)
        # XLA convolution is cross-correlation — no kernel flip
        kern = W[:, None, :].astype(x.dtype)             # (w, 1, 2w-1)
        out = jax.lax.conv_general_dilated(
            xin, kern, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))     # (B', w, n)
        trend_all = out.reshape(lead + (w, n))
        # one-hot select-reduce over the w window offsets — fuses into
        # the conv epilogue (take_along_axis here measured 66 ms at
        # (512, 101, 8192) on a v5e vs ~0 for the fused one-hot)
        oh = offset[..., None, :] == jnp.arange(w, dtype=jnp.int32)[:, None]
        trend = jnp.sum(jnp.where(oh, trend_all, 0.0), axis=-2)
        return trend + mu
    S = jnp.stack([xp[..., k:k + n] for k in range(2 * w - 1)], axis=-1)
    trend_all = jnp.einsum("...nk,ok->...no", S, W)      # (..., n, w)
    trend = jnp.take_along_axis(trend_all, offset[..., None],
                                axis=-1)[..., 0]
    return trend + mu
