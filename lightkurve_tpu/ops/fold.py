"""Phase folding and transit masks.

Device equivalents of the reference's ``LightCurve.fold``
(``lightcurve.py:1089-1214``, delegating to astropy ``TimeSeries.fold``) and
``create_transit_mask`` (kernel at ``lightcurve.py:3035``).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["fold_phase", "transit_mask", "bin_folded"]


def fold_phase(time, period, epoch_time=None, epoch_phase=0.0,
               wrap_phase=None, normalize_phase=False):
    """Phase of each time w.r.t. (period, epoch).

    phase = ((t - epoch_time + epoch_phase) mod P), wrapped so that values
    >= ``wrap_phase`` are reduced by one period (astropy ``fold`` semantics;
    default wrap at P/2 giving [-P/2, P/2)).  With ``normalize_phase`` the
    result is divided by P (and ``epoch_phase``/``wrap_phase`` are given in
    units of phase).
    """
    if epoch_time is None:
        epoch_time = time.ravel()[0] if hasattr(time, "ravel") else time[0]
    period = jnp.asarray(period)
    if normalize_phase:
        eph = jnp.asarray(epoch_phase) * period
        wrap = period * (0.5 if wrap_phase is None else jnp.asarray(wrap_phase))
    else:
        eph = jnp.asarray(epoch_phase)
        wrap = period * 0.5 if wrap_phase is None else jnp.asarray(wrap_phase)
    phase = jnp.mod(time - epoch_time + eph, period)
    phase = jnp.where(phase >= wrap, phase - period, phase)
    if normalize_phase:
        phase = phase / period
    return phase


def transit_mask(time, period, transit_time, duration):
    """Boolean in-transit mask; supports arrays of planets via broadcasting.

    Kernel (reference ``lightcurve.py:3035``):
    ``abs((t - t0 + 0.5 P) % P - 0.5 P) < 0.5 * duration``.
    """
    period = jnp.atleast_1d(jnp.asarray(period))[..., None]
    t0 = jnp.atleast_1d(jnp.asarray(transit_time))[..., None]
    dur = jnp.atleast_1d(jnp.asarray(duration))[..., None]
    hp = 0.5 * period
    m = jnp.abs(jnp.mod(time[None, :] - t0 + hp, period) - hp) < 0.5 * dur
    return jnp.any(m, axis=0)


def bin_folded(phase, values, mask, n_bins, phase_min, phase_max):
    """Equal-width phase binning (FoldedLightCurve.bin fast path)."""
    from .binning import bin_aggregate
    width = (phase_max - phase_min) / n_bins
    ids = jnp.floor((phase - phase_min) / width).astype(jnp.int32)
    in_range = (ids >= 0) & (ids < n_bins)
    ids = jnp.clip(ids, 0, n_bins - 1)
    mean, rmse, std, cnt = bin_aggregate(values, mask & in_range, ids, n_bins)
    mids = phase_min + (jnp.arange(n_bins) + 0.5) * width
    return mids, mean, rmse, std, cnt
