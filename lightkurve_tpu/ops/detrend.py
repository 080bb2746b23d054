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


def _compact_targets(valid):
    """Destination of each position under the stable valid-first compaction.

    Closed-form from the running valid/invalid counts — no sort.  Arrays
    are moved INTO compacted order by scattering with these targets
    (``out.at[target].set(a)``), which costs ~32 ms at (512, 8192) on a
    v5e where the equivalent permutation GATHER (``a[order]``) costs
    ~250 ms — XLA lowers batched 1-D gathers near-scalar on TPU but
    scatters onto a unique-index permutation stay vectorized."""
    n = valid.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    cv = jnp.cumsum(valid)
    m = cv[-1]
    return jnp.where(valid, cv - 1, m + (idx - cv))


def _compact(valid):
    """Stable permutation placing valid entries first, in original order
    (the inverse of :func:`_compact_targets`, one scatter)."""
    n = valid.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    target = _compact_targets(valid)
    return jnp.zeros((n,), jnp.int32).at[target].set(idx,
                                                     unique_indices=True)


def _segment_bounds(brk, n):
    """Per-position [lo, hi) bounds given break flags (brk[i] = new segment
    starts at i).  Positions are compacted indices.

    lax.cummax/cummin lower catastrophically on TPU (~220 ms at
    (512, 8192), the largest single slice of the flatten step), so the
    bounds are built from a break-position TABLE instead: ``T[g]`` is the
    position of the g-th break (one scatter), and each element's segment
    is ``[T[u], T[u+1])`` with ``u`` the running break count (cumsum).
    Exact for any number of segments."""
    idx = jnp.arange(n, dtype=jnp.int32)
    u = jnp.cumsum(brk)                        # 1-indexed break counter
    # park non-break elements at slot 0 (never read: u >= 1 everywhere
    # because brk[0] is always True); slots past the last break keep n
    pos = jnp.where(brk, u, 0)
    table = jnp.full((n + 2,), n, jnp.int32).at[pos].set(idx)
    lo = table[u]
    hi = table[u + 1]                          # break strictly after i
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
        target = _compact_targets(valid)
        order = jnp.zeros((n,), jnp.int32).at[target].set(
            idx.astype(jnp.int32), unique_indices=True)
        m = jnp.sum(valid)
        # apply the compaction as scatters, not gathers (see
        # _compact_targets): ct[target[i]] = time[i]
        ct = jnp.zeros_like(time).at[target].set(time, unique_indices=True)
        cf = jnp.zeros_like(flux).at[target].set(flux, unique_indices=True)

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
        trend_c = jnp.where(short, seg_med[seg_id], trend_c)

        # clip outliers vs the trend (lightcurve.py:1049-1056)
        resid = cf - trend_c
        std = masked_std(resid, idx < m)
        keep = jnp.abs(resid) < (std * sigma + 1e-14)
        keep = keep & (idx < m)

        # interpolate trend through kept points onto ALL times; the kept
        # points ARE grid points of the (ascending) time vector, so no
        # compaction or rank search is needed at all — scatter the trend
        # back to original positions and forward/backward-fill the
        # interpolation endpoints (interp_linear_fill, gather-free)
        valid_new = jnp.zeros_like(valid).at[order].set(keep)
        trend_orig = jnp.zeros_like(flux).at[order].set(trend_c,
                                                        unique_indices=True)
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
