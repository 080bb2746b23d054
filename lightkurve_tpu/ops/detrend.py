"""Savitzky-Golay flatten as a single fixed-shape device computation.

Re-implements the full semantics of the reference's ``LightCurve.flatten``
(``lightcurve.py:943-1078``) — NaN/user masking, gap segmentation at
``dt > break_tolerance * median(dt)``, per-segment SG filtering with the
short-segment median fallback, the iterative sigma-clip loop, and the final
linear interp/extrapolation of the trend over all cadences — as one jittable
function over fixed shapes.  The reference's row *compaction* (it filters
``flux[mask]`` before filtering) is reproduced on device with a stable
argsort-based compaction, so results match the numpy/scipy path bit-for-bit
in float64 (tested in ``tests/test_detrend.py``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .masked import masked_median, masked_median_grouped, masked_std
from .savgol import savgol_filter_interp
from .interp import interp_linear_fill

__all__ = ["flatten", "flatten_batch"]


def _compact(valid):
    """Stable permutation placing valid entries first, in original order.

    Kept for callers that want the permutation itself; the flatten hot
    loop applies the compaction with one payload ``lax.sort`` instead
    (see ``one_iter``) — on TPU a multi-payload sort costs ~8.5 ms at
    (512, 8192) where the equivalent permutation gathers (~250 ms) or
    unique-index scatters (which anti-fuse when several share a jit —
    measured seconds) are far slower."""
    n = valid.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    cv = jnp.cumsum(valid)
    m = cv[-1]
    target = jnp.where(valid, cv - 1, m + (idx - cv))
    return jnp.zeros((n,), jnp.int32).at[target].set(idx,
                                                     unique_indices=True)


def _fill_scan(flag, val, reverse=False):
    """Per-position most recent ``val`` where ``flag`` (inclusive), as a
    log2(n) ``associative_scan`` — returns (seen, filled)."""
    def comb(a, b):
        av, ax = a
        bv, bx = b
        return (bv | av, jnp.where(bv, bx, ax))
    return jax.lax.associative_scan(comb, (flag, val), axis=flag.ndim - 1,
                                    reverse=reverse)


def _segment_bounds(brk, n):
    """Per-position [lo, hi) bounds given break flags (brk[i] = new segment
    starts at i).  Positions are compacted indices.

    Built from two forward/backward fill scans (~6 ms at (512, 8192) on a
    v5e).  The alternatives all lower catastrophically on TPU:
    lax.cummax/cummin ~220 ms, a break-position table with batched 1-D
    gathers ~40 s (!) — batched gathers and scatters are near-scalar."""
    idx = jnp.arange(n, dtype=jnp.int32)
    # lo[i] = most recent break at or before i (brk[0] is always True)
    _, lo = _fill_scan(brk, idx)
    # hi[i] = first break strictly after i, else n: reverse-inclusive
    # fill shifted left one position
    seen, nxt = _fill_scan(brk, idx, reverse=True)
    hi = jnp.concatenate(
        [jnp.where(seen[1:], nxt[1:], n), jnp.full((1,), n, jnp.int32)])
    return lo, hi


@partial(jax.jit, static_argnames=("niters", "max_segments"))
def flatten(time, flux, valid, H, break_tolerance, sigma,
            niters=3, max_segments=16):
    """Compute the SG trend of one (masked, padded) light curve.

    Parameters
    ----------
    time, flux : (n,) arrays.  Padded tail entries must be finite and the
        valid prefix of ``time`` (after compaction) sorted ascending.
    valid : (n,) bool — True where the sample participates in the fit (the
        caller combines the user mask, finiteness, and the initial global
        sigma cut, per ``lightcurve.py:997-1010``).
    H : (w, w) SG projection matrix (``savgol_design_matrix``).
    break_tolerance : float; pass NaN to disable gap splitting (reference
        converts None to NaN, ``lightcurve.py:1015-1016``).
    sigma : clip threshold.
    niters : static int — sigma-clip iterations.
    max_segments : static int — cap on gap segments tracked for the
        short-segment median fallback.

    Returns
    -------
    trend : (n,) trend evaluated at every input time (via linear
        interp/extrapolation over clipped points).
    valid_out : (n,) the post-clipping mask.
    """
    n = time.shape[0]
    w = H.shape[0]
    idx = jnp.arange(n)

    def one_iter(valid):
        m = jnp.sum(valid)
        # apply the stable valid-first compaction as ONE payload sort —
        # gathers (~250 ms) and scatters (which anti-fuse to seconds when
        # several share a jit) both lower near-scalar on TPU, a
        # multi-payload lax.sort is ~8.5 ms at (512, 8192)
        ct, cf, order = jax.lax.sort(
            ((~valid).astype(jnp.int32), time, flux,
             idx.astype(jnp.int32)), dimension=0, num_keys=1)[1:]

        # gap detection over compacted times (lightcurve.py:1022-1027)
        dt = jnp.diff(ct, append=ct[-1:])          # dt[i] = ct[i+1]-ct[i]
        dt_valid = idx < (m - 1)
        med_dt = masked_median(dt, dt_valid)
        is_gap = dt > (break_tolerance * med_dt)   # NaN tol → all False
        brk = jnp.concatenate([jnp.array([True]), is_gap[:-1]])
        brk = brk | (idx >= m)                     # padding: isolated segs
        lo, hi = _segment_bounds(brk, n)
        hi = jnp.minimum(hi, m)                    # segments end at padding
        seglen = hi - lo

        # SG trend with anchored windows inside each segment
        trend_c = savgol_filter_interp(cf, H, lo, hi)

        # short-segment median fallback (lightcurve.py:1035-1038) — one
        # shared key/payload sort for all segment medians instead of a
        # (max_segments, n) batched sort, which dominated the TPU step
        seg_id = jnp.clip(jnp.cumsum(brk) - 1, 0, max_segments - 1)
        seg_med = masked_median_grouped(cf, seg_id, max_segments,
                                        valid=idx < m)
        short = (w > seglen) | (seglen < break_tolerance)
        # one-hot contraction instead of seg_med[seg_id]: batched 1-D
        # gathers lower near-scalar on TPU even for a 16-entry table
        med_elem = jnp.sum(
            jnp.where(seg_id[:, None]
                      == jnp.arange(max_segments, dtype=jnp.int32),
                      seg_med[None, :], 0.0), axis=-1)
        trend_c = jnp.where(short, med_elem, trend_c)

        # clip outliers vs the trend (lightcurve.py:1049-1056)
        resid = cf - trend_c
        std = masked_std(resid, idx < m)
        keep = jnp.abs(resid) < (std * sigma + 1e-14)
        keep = keep & (idx < m)

        # interpolate trend through kept points onto ALL times; the kept
        # points ARE grid points of the (ascending) time vector, so no
        # rank search is needed — send (keep, trend) back to original
        # positions with ONE sort keyed on `order` (NaN marks dropped
        # points, so a single payload carries both), then fill the
        # interpolation endpoints scan-wise (interp_linear_fill)
        merged = jnp.where(keep, trend_c, jnp.nan)
        trend_orig = jax.lax.sort((order, merged), dimension=0,
                                  num_keys=1)[1]
        valid_new = jnp.isfinite(trend_orig)
        trend_full = interp_linear_fill(time, valid_new, trend_orig)
        return valid_new, trend_full

    def body(_, carry):
        valid, _ = carry
        return one_iter(valid)

    valid0, trend0 = one_iter(valid)
    if niters > 1:
        valid_f, trend_f = jax.lax.fori_loop(1, niters, body, (valid0, trend0))
    else:
        valid_f, trend_f = valid0, trend0
    return trend_f, valid_f


def flatten_batch(time, flux, valid, H, break_tolerance, sigma,
                  niters=3, max_segments=16):
    """vmapped :func:`flatten` over a leading batch axis."""
    fn = partial(flatten, niters=niters, max_segments=max_segments)
    return jax.vmap(lambda t, f, v: fn(t, f, v, H, break_tolerance, sigma))(
        time, flux, valid)
