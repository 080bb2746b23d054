"""Interpolation kernels: linear-with-extrapolation and PCHIP.

Replaces the reference's ``scipy.interpolate.interp1d(..,
fill_value="extrapolate")`` (used to spread the flatten trend back over
masked cadences, ``lightcurve.py:1053-1058``) and
``scipy.interpolate.PchipInterpolator`` (CBV alignment,
``cbvcorrector.py:1309``) with pure-JAX equivalents over fixed shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["interp_linear_extrap", "interp_linear_ranked",
           "interp_linear_fill", "pchip_interpolate", "pchip_slopes"]


def interp_linear_extrap(x, xp, fp, n_valid=None):
    """Piecewise-linear interpolation with linear extrapolation at both ends.

    Matches ``scipy.interpolate.interp1d(xp, fp, fill_value="extrapolate")``.

    Parameters
    ----------
    x : (..., m) query points.
    xp : (..., n) sorted sample positions (may contain padding past
        ``n_valid``; padded entries are ignored).
    fp : (..., n) sample values.
    n_valid : scalar or (...,) int — number of valid leading entries of
        ``xp``/``fp``; defaults to all.
    """
    n = xp.shape[-1]
    if n_valid is None:
        n_valid = n
    n_valid = jnp.asarray(n_valid)
    # Push padded xp entries to +inf so searchsorted ignores them.
    valid = jnp.arange(n) < n_valid[..., None]
    xp_s = jnp.where(valid, xp, jnp.inf)

    idx = jnp.searchsorted(xp_s, x, side="left")
    return _interp_at_ranks(x, xp, fp, idx, n_valid)


def interp_linear_ranked(x, xp, fp, ranks, n_valid):
    """:func:`interp_linear_extrap` when the searchsorted result is already
    known — ``ranks[i]`` = number of valid ``xp`` entries strictly below
    ``x[i]``.  When the sample positions are a SUBSET of the (sorted)
    query grid the ranks are an exclusive cumsum of the membership mask,
    which avoids the per-row binary search (vmapped ``searchsorted`` is
    ~600 ms for (512, 8192) on a v5e; the cumsum is ~10 ms)."""
    return _interp_at_ranks(x, xp, fp, ranks, jnp.asarray(n_valid))


def _interp_at_ranks(x, xp, fp, idx, n_valid):
    # use segment [idx-1, idx], clamped into the valid range [0, n_valid-1]
    hi = jnp.clip(idx, 1, jnp.maximum(n_valid[..., None], 2) - 1)
    lo = hi - 1
    x_lo = jnp.take_along_axis(xp, lo, axis=-1)
    x_hi = jnp.take_along_axis(xp, hi, axis=-1)
    f_lo = jnp.take_along_axis(fp, lo, axis=-1)
    f_hi = jnp.take_along_axis(fp, hi, axis=-1)
    denom = x_hi - x_lo
    slope = jnp.where(denom != 0, (f_hi - f_lo) / jnp.where(denom == 0, 1, denom), 0.0)
    return f_lo + slope * (x - x_lo)


def _last2_scan(valid, x, f, reverse=False):
    """Nearest-two valid samples in scan order, inclusive, per position.

    Forward (``reverse=False``): for each i, the last and second-to-last
    positions j <= i with ``valid[j]``.  Reverse: the first and second
    positions j >= i.  Returns ``(v1, x1, f1, v2, x2, f2)`` where the
    ``v*`` flags say whether that neighbor exists; ``x*``/``f*`` are
    meaningful only under their flag.

    The carry is the 'last two valid items' monoid (concatenate, keep the
    two most recent) — associative, so ``lax.associative_scan`` runs it
    in log2(n) vectorized steps with no gathers.
    """
    def comb(a, b):
        av1, ax1, af1, av2, ax2, af2 = a
        bv1, bx1, bf1, bv2, bx2, bf2 = b
        v1 = bv1 | av1
        x1 = jnp.where(bv1, bx1, ax1)
        f1 = jnp.where(bv1, bf1, af1)
        v2 = bv2 | (bv1 & av1) | ((~bv1) & av2)
        x2 = jnp.where(bv2, bx2, jnp.where(bv1, ax1, ax2))
        f2 = jnp.where(bv2, bf2, jnp.where(bv1, af1, af2))
        return (v1, x1, f1, v2, x2, f2)

    false = jnp.zeros_like(valid)
    elems = (valid, x, f, false, x, f)
    # positive axis: associative_scan's reverse path rejects axis=-1
    return jax.lax.associative_scan(comb, elems, axis=valid.ndim - 1,
                                    reverse=reverse)


def interp_linear_fill(x, kept, f):
    """:func:`interp_linear_extrap` when the sample points are a subset of
    the (ascending) query grid itself, marked in place by ``kept``.

    Bit-equivalent to compacting ``(x[kept], f[kept])`` and calling
    :func:`interp_linear_ranked` with cumsum ranks, but entirely
    gather-free: the interpolation endpoints come from two
    ``associative_scan`` forward/backward fills instead of four
    ``take_along_axis`` gathers (~170 ms -> ~20 ms for (512, 8192) on a
    v5e, where XLA lowers batched 1-D gathers poorly).

    Endpoint selection mirrors ``_interp_at_ranks``'s clamping: interior
    points use (last kept strictly before, first kept at-or-after); the
    head extrapolates through the first two kept points, the tail through
    the last two.
    """
    nxt = _last2_scan(kept, x, f, reverse=True)           # at or after i
    inc = _last2_scan(kept, x, f, reverse=False)
    # strictly-before = inclusive scan shifted right one position
    def shift(a):
        pad = jnp.zeros_like(a[..., :1])
        return jnp.concatenate([pad, a[..., :-1]], axis=-1)
    pv1, px1, pf1, pv2, px2, pf2 = (shift(a) for a in inc)
    nv1, nx1, nf1, nv2, nx2, nf2 = nxt

    head = ~pv1                                           # rank == 0
    x_lo = jnp.where(head, nx1,
                     jnp.where(nv1, px1, jnp.where(pv2, px2, px1)))
    f_lo = jnp.where(head, nf1,
                     jnp.where(nv1, pf1, jnp.where(pv2, pf2, pf1)))
    x_hi = jnp.where(head, jnp.where(nv2, nx2, nx1),
                     jnp.where(nv1, nx1, px1))
    f_hi = jnp.where(head, jnp.where(nv2, nf2, nf1),
                     jnp.where(nv1, nf1, pf1))
    denom = x_hi - x_lo
    slope = jnp.where(denom != 0,
                      (f_hi - f_lo) / jnp.where(denom == 0, 1, denom), 0.0)
    return f_lo + slope * (x - x_lo)


def pchip_slopes(x, y):
    """Derivatives of the PCHIP (Fritsch-Carlson) monotone cubic interpolant.

    Matches scipy's ``PchipInterpolator`` slope rules, including the
    one-sided three-point edge formula with monotonicity clamping.
    ``x`` must be strictly increasing, fully valid, length >= 2.
    """
    h = jnp.diff(x, axis=-1)                       # (n-1,)
    delta = jnp.diff(y, axis=-1) / h               # (n-1,)

    # interior slopes: weighted harmonic mean where deltas share sign
    h0, h1 = h[..., :-1], h[..., 1:]
    d0, d1 = delta[..., :-1], delta[..., 1:]
    w1 = 2 * h1 + h0
    w2 = h1 + 2 * h0
    same_sign = (d0 * d1) > 0
    denom = jnp.where(same_sign, w1 / jnp.where(d0 == 0, 1, d0)
                      + w2 / jnp.where(d1 == 0, 1, d1), 1.0)
    interior = jnp.where(same_sign, (w1 + w2) / denom, 0.0)

    def _edge(h0, h1, d0, d1):
        # scipy's _edge_case: one-sided three-point estimate
        d = ((2 * h0 + h1) * d0 - h0 * d1) / (h0 + h1)
        mask0 = jnp.sign(d) != jnp.sign(d0)
        mask1 = (jnp.sign(d0) != jnp.sign(d1)) & (jnp.abs(d) > 3 * jnp.abs(d0))
        d = jnp.where(mask0, 0.0, d)
        return jnp.where(mask1 & ~mask0, 3 * d0, d)

    if x.shape[-1] == 2:
        left = delta[..., 0]
        right = delta[..., -1]
    else:
        left = _edge(h[..., 0], h[..., 1], delta[..., 0], delta[..., 1])
        right = _edge(h[..., -1], h[..., -2], delta[..., -1], delta[..., -2])
    return jnp.concatenate([left[..., None], interior, right[..., None]], axis=-1)


def pchip_interpolate(xq, x, y, extrapolate=True):
    """Evaluate the PCHIP interpolant of (x, y) at query points ``xq``."""
    d = pchip_slopes(x, y)
    n = x.shape[-1]
    idx = jnp.clip(jnp.searchsorted(x, xq, side="right") - 1, 0, n - 2)
    x0 = jnp.take_along_axis(x, idx, axis=-1)
    x1 = jnp.take_along_axis(x, idx + 1, axis=-1)
    y0 = jnp.take_along_axis(y, idx, axis=-1)
    y1 = jnp.take_along_axis(y, idx + 1, axis=-1)
    d0 = jnp.take_along_axis(d, idx, axis=-1)
    d1 = jnp.take_along_axis(d, idx + 1, axis=-1)
    h = x1 - x0
    t = (xq - x0) / h
    h00 = (1 + 2 * t) * (1 - t) ** 2
    h10 = t * (1 - t) ** 2
    h01 = t * t * (3 - 2 * t)
    h11 = t * t * (t - 1)
    out = h00 * y0 + h10 * h * d0 + h01 * y1 + h11 * h * d1
    if not extrapolate:
        out = jnp.where((xq < x[..., :1]) | (xq > x[..., -1:]), jnp.nan, out)
    return out
