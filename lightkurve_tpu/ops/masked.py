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
    "masked_median", "masked_quantile",
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
