"""Mask-aware reductions — the TPU replacement for NaN semantics.

The reference leans on ``np.nansum``/``np.nanmedian`` etc. (e.g. aperture
photometry at ``targetpixelfile.py:868-932``); on TPU we carry explicit
boolean validity masks alongside fixed-shape arrays.  All functions reduce
over the LAST axis and broadcast over leading batch axes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "nan_to_mask", "masked_sum", "masked_mean", "masked_var", "masked_std",
    "masked_median", "masked_quantile", "masked_median_grouped",
]


def nan_to_mask(x, mask=None):
    """Return (x_filled_with_zero, validity_mask) combining NaNs and ``mask``."""
    finite = jnp.isfinite(x)
    if mask is not None:
        finite = finite & mask
    return jnp.where(finite, x, 0.0), finite


def masked_sum(x, mask, axis=-1):
    return jnp.sum(jnp.where(mask, x, 0.0), axis=axis)


def _count(mask, axis):
    return jnp.sum(mask, axis=axis).astype(jnp.result_type(float))


def masked_mean(x, mask, axis=-1):
    n = _count(mask, axis)
    s = masked_sum(x, mask, axis)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), jnp.nan)


def masked_var(x, mask, axis=-1, ddof=0):
    """Variance over valid entries (matches np.nanvar semantics)."""
    n = _count(mask, axis)
    mu = masked_mean(x, mask, axis)
    d = jnp.where(mask, x - jnp.expand_dims(mu, axis), 0.0)
    ss = jnp.sum(d * d, axis=axis)
    denom = n - ddof
    return jnp.where(denom > 0, ss / jnp.maximum(denom, 1), jnp.nan)


def masked_std(x, mask, axis=-1, ddof=0):
    return jnp.sqrt(masked_var(x, mask, axis, ddof))


def masked_quantile(x, mask, q, axis=-1):
    """Quantile over valid entries using linear interpolation (numpy default).

    Implemented as a full sort with invalid entries pushed to +inf, then a
    gather at the (per-row) fractional rank — O(n log n), fully static
    shapes, vmappable.
    """
    if axis != -1:
        x = jnp.moveaxis(x, axis, -1)
        mask = jnp.moveaxis(mask, axis, -1)
    big = jnp.asarray(jnp.inf, dtype=x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big), axis=-1)
    n = jnp.sum(mask, axis=-1)
    # fractional index into the sorted valid prefix
    pos = q * (n.astype(xs.dtype) - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, xs.shape[-1] - 1)
    hi = jnp.clip(lo + 1, 0, xs.shape[-1] - 1)
    frac = pos - lo.astype(xs.dtype)
    v_lo = jnp.take_along_axis(xs, lo[..., None], axis=-1)[..., 0]
    v_hi = jnp.take_along_axis(xs, hi[..., None], axis=-1)[..., 0]
    # at integer ranks (n==1 medians, q==1.0) the hi sample sits in the
    # +inf invalid padding and frac==0 — but 0*inf is NaN, so select
    # rather than rely on the frac term vanishing
    out = jnp.where(frac > 0, v_lo + frac * (v_hi - v_lo), v_lo)
    return jnp.where(n > 0, out, jnp.nan)


def masked_median(x, mask, axis=-1):
    """Median over valid entries (matches ``np.nanmedian``)."""
    return masked_quantile(x, mask, 0.5, axis=axis)


def masked_median_grouped(x, group_id, n_groups, valid=None):
    """Per-group medians over the last axis sharing ONE sort.

    Computes ``[masked_median(x, (group_id == g) & valid) for g in
    range(n_groups)]`` with a single key/payload sort of ``x`` instead of
    ``n_groups`` full sorts — the difference between 16 batched sorts and
    1 in flatten's short-segment fallback, where device sorts dominate
    the pipeline.  Matches :func:`masked_quantile` (numpy linear
    interpolation) exactly for non-empty groups; empty groups return 0.0
    (callers never read them — segment ids only index real segments).

    Parameters
    ----------
    x : (..., n) values.
    group_id : (..., n) int32 group of each sample (in [0, n_groups)).
    n_groups : static int.
    valid : optional (..., n) bool; invalid samples belong to no group.

    Returns
    -------
    (..., n_groups) medians.
    """
    n = x.shape[-1]
    big = jnp.asarray(jnp.inf, dtype=x.dtype)
    keys = x if valid is None else jnp.where(valid, x, big)
    gid = group_id.astype(jnp.int32)
    if valid is not None:
        gid = jnp.where(valid, gid, n_groups)      # park invalids
    vs, gs = jax.lax.sort((keys, gid), dimension=-1, num_keys=1)

    meds = []
    for g in range(n_groups):
        m = (gs == g)
        ng = jnp.sum(m, axis=-1, keepdims=True).astype(x.dtype)
        pos = 0.5 * (ng - 1.0)
        lo = jnp.clip(jnp.floor(pos), 0, n - 1)
        hi = jnp.clip(lo + 1, 0, None)
        c = jnp.cumsum(m, axis=-1)
        # the j-th in-group element is the unique position with
        # (cumcount == j+1) & member
        v_lo = jnp.sum(jnp.where(m & (c == lo + 1), vs, 0.0), axis=-1,
                       keepdims=True)
        sel_hi = m & (c == jnp.minimum(hi, jnp.maximum(ng - 1, 0)) + 1)
        v_hi = jnp.sum(jnp.where(sel_hi, vs, 0.0), axis=-1, keepdims=True)
        med = v_lo + (pos - lo) * (v_hi - v_lo)
        meds.append(jnp.where(ng > 0, med, 0.0))
    return jnp.concatenate(meds, axis=-1)
