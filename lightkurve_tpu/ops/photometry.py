"""Pixel-cube photometry kernels: masked reductions over (time, row, col).

TPU equivalents of the reference's aperture photometry
(``targetpixelfile.py:868-932``), moment centroids (``:834-851``) and
background estimation (``:744-781``).  Cubes are ``(..., t, h, w)`` so a
stack of thousands of targets is one batched reduction.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .masked import masked_median, masked_mean

__all__ = ["aperture_photometry_cube", "centroid_moments_cube",
           "background_estimate_cube"]


@partial(jax.jit, static_argnames=("flux_method",))
def aperture_photometry_cube(flux, flux_err, aperture, flux_method="sum"):
    """Aperture photometry over a pixel cube.

    Parameters
    ----------
    flux, flux_err : (..., t, h, w) cubes (NaN = missing pixel).
    aperture : (..., h, w) bool mask of selected pixels.
    flux_method : 'sum' | 'median' | 'mean' (reference ``:888-909``).

    Returns
    -------
    flux_lc, flux_err_lc : (..., t) with the reference's NaN propagation
    rules: all-NaN-in-aperture → NaN, all-zero-cadence → NaN; errors combine
    in quadrature for 'sum' (median/mean of squares otherwise).
    """
    ap = aperture[..., None, :, :] & jnp.ones_like(flux, dtype=bool)
    tshape = flux.shape[:-2] + (-1,)
    f = flux.reshape(tshape)
    fe = flux_err.reshape(tshape)
    sel = ap.reshape(tshape)
    finite_f = sel & jnp.isfinite(f)
    finite_e = sel & jnp.isfinite(fe)

    if flux_method == "sum":
        out_f = jnp.sum(jnp.where(finite_f, f, 0.0), axis=-1)
        out_e = jnp.sqrt(jnp.sum(jnp.where(finite_e, fe * fe, 0.0), axis=-1))
    elif flux_method == "median":
        out_f = masked_median(f, finite_f)
        out_e = jnp.sqrt(masked_median(fe * fe, finite_e))
    elif flux_method == "mean":
        out_f = masked_mean(f, finite_f)
        out_e = jnp.sqrt(masked_mean(fe * fe, finite_e))
    else:
        raise ValueError("`flux_method` must be 'sum', 'median', or 'mean'.")

    all_nan_f = ~jnp.any(finite_f, axis=-1)
    all_zero = jnp.all(f == 0.0, axis=-1)   # full cube, reference :908-910
    all_nan_e = ~jnp.any(finite_e, axis=-1)
    nan = jnp.nan
    out_f = jnp.where(all_nan_f | all_zero, nan, out_f)
    out_e = jnp.where(all_nan_e, nan, out_e)
    return out_f, out_e


@jax.jit
def centroid_moments_cube(flux, aperture, column=0, row=0):
    """Flux-weighted center of mass per cadence (reference ``:834-851``).

    Returns (centroid_col, centroid_row) in absolute pixel coordinates.
    """
    h, w = flux.shape[-2:]
    yy = jnp.arange(h)[:, None] + row
    xx = jnp.arange(w)[None, :] + column
    ap = aperture[..., None, :, :].astype(flux.dtype)
    fin = jnp.isfinite(flux)
    f0 = jnp.where(fin, flux, 0.0)
    total = jnp.sum(jnp.where(aperture[..., None, :, :], f0, 0.0),
                    axis=(-2, -1))
    # NOTE: the reference multiplies the FULL cube by the mask (NaNs outside
    # the aperture still poison nansum only where masked in — we replicate
    # nansum(xx * mask * flux)).
    col_c = jnp.sum(jnp.where(fin, xx * ap * flux, 0.0), axis=(-2, -1)) / total
    row_c = jnp.sum(jnp.where(fin, yy * ap * flux, 0.0), axis=(-2, -1)) / total
    return col_c, row_c


@jax.jit
def background_estimate_cube(flux, background_mask):
    """Per-cadence median background flux per pixel (reference ``:744-781``)."""
    tshape = flux.shape[:-2] + (-1,)
    f = flux.reshape(tshape)
    sel = background_mask.reshape(background_mask.shape[:-2] + (1, -1)) \
        if background_mask.ndim == flux.ndim - 1 else background_mask.reshape(tshape)
    sel = jnp.broadcast_to(sel, f.shape)
    return masked_median(f, sel & jnp.isfinite(f))
