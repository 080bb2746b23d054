"""Batched FFT autocorrelation for asteroseismology.

The reference's numax/deltanu estimators autocorrelate a sliding window of
the power spectrum at every trial frequency center
(``seismology/utils.py:137-154`` via ``np.correlate(s, s, 'full')``, driven
by the loop at ``numax_estimators.py:175-182``).  Here the whole "2D ACF"
is ONE batched FFT autocorrelation over all window centers at once.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["autocorrelate_windows", "acf2d"]


def _next_pow2(n):
    return 1 << (int(n) - 1).bit_length()


@partial(jax.jit, static_argnames=("window",))
def autocorrelate_windows(power, starts, window):
    """Zero-mean autocorrelation of ``window``-length slices of ``power``.

    Parameters
    ----------
    power : (m,) spectrum.
    starts : (c,) int window start indices; windows are clipped at the array
        bounds exactly like Python slicing (out-of-range lanes contribute
        zero), reproducing the reference's edge truncation.
    window : static int window length (2·spread in the reference).

    Returns
    -------
    acf : (c, window) non-negative-lag autocorrelations (lag 0..window-1);
        lags beyond a truncated window's length are zero.
    n_valid : (c,) true (clipped) window lengths.
    """
    m = power.shape[0]
    offs = jnp.arange(window)
    idx = starts[:, None] + offs[None, :]                   # (c, window)
    valid = (idx >= 0) & (idx < m)
    vals = power[jnp.clip(idx, 0, m - 1)]
    n_valid = jnp.sum(valid, axis=-1)
    mean = jnp.sum(jnp.where(valid, vals, 0.0), axis=-1) / \
        jnp.maximum(n_valid, 1)
    s = jnp.where(valid, vals - mean[:, None], 0.0)         # (c, window)

    nfft = _next_pow2(2 * window)
    from .fft import fft_pair, ifft_pair
    pad = jnp.zeros(s.shape[:-1] + (nfft - window,), dtype=s.dtype)
    sp = jnp.concatenate([s, pad], axis=-1)
    Fr, Fi = fft_pair(sp, jnp.zeros((), s.dtype))
    spec = Fr * Fr + Fi * Fi                 # |F|² (real)
    acf_full, _ = ifft_pair(spec, jnp.zeros((), s.dtype))
    return acf_full[:, :window], n_valid


def acf2d(power, starts, window):
    """Alias mirroring the reference's "2D ACF" terminology."""
    return autocorrelate_windows(power, starts, window)
