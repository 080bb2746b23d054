"""Split-real FFT for TPU backends without native complex/FFT support.

The axon TPU tunnel (and some restricted XLA builds) implement neither
complex dtypes nor the FFT custom-call.  This module provides a pure-JAX
radix-2 Cooley-Tukey FFT that carries (real, imag) as separate float arrays
— matmul base case on the MXU, log₂(n) vectorized butterfly stages on the
VPU, twiddle factors embedded as float64 numpy constants.  Transforms along
the LAST axis; length must be a power of two (callers already pad to
``bitceil`` grids).  Dispatch: ``fft_pair``/``ifft_pair`` use native
``jnp.fft`` when the backend supports it (probed once) unless
``conf.fft_backend`` forces a choice.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["fft_pair", "ifft_pair", "rfft_pair", "native_fft_supported"]

_BASE = 32  # matmul base-case size


@lru_cache(maxsize=None)
def _base_matrices(n_min, sign):
    k = np.arange(n_min)
    ang = sign * 2.0 * np.pi * k[:, None] * k[None, :] / n_min
    return np.cos(ang), np.sin(ang)


@lru_cache(maxsize=None)
def _stage_factor(L, sign):
    ang = sign * np.pi * np.arange(L) / L
    return np.cos(ang)[:, None], np.sin(ang)[:, None]


def _fft_core(xr, xi, sign):
    n = xr.shape[-1]
    if n & (n - 1):
        raise ValueError(f"FFT length must be a power of two, got {n}")
    dtype = xr.dtype
    n_min = min(n, _BASE)
    c = n // n_min
    # (..., n) -> (..., n_min, c): column j is the stride-c subsequence x[j::c]
    Xr = xr.reshape(xr.shape[:-1] + (n_min, c))
    Xi = xi.reshape(xi.shape[:-1] + (n_min, c))
    Mr, Mi = _base_matrices(n_min, sign)
    Mr = jnp.asarray(Mr, dtype)
    Mi = jnp.asarray(Mi, dtype)
    # HIGHEST: TPU DEFAULT-precision matmuls truncate f32 inputs to bf16 on
    # the MXU — fatal for O(1)-magnitude DFT twiddles.  The base case is a
    # tiny (32×32) contraction, so full f32 costs nothing measurable.
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    Yr = mm(Mr, Xr) - mm(Mi, Xi)
    Yi = mm(Mr, Xi) + mm(Mi, Xr)
    L = n_min
    while L < n:
        half = Yr.shape[-1] // 2
        Er, Ei = Yr[..., :half], Yi[..., :half]
        Or_, Oi = Yr[..., half:], Yi[..., half:]
        fr, fi = _stage_factor(L, sign)
        fr = jnp.asarray(fr, dtype)
        fi = jnp.asarray(fi, dtype)
        Tr = fr * Or_ - fi * Oi
        Ti = fr * Oi + fi * Or_
        Yr = jnp.concatenate([Er + Tr, Er - Tr], axis=-2)
        Yi = jnp.concatenate([Ei + Ti, Ei - Ti], axis=-2)
        L *= 2
    return Yr.reshape(xr.shape), Yi.reshape(xr.shape)


@lru_cache(maxsize=1)
def native_fft_supported():
    """Probe whether the default backend implements complex FFT."""
    try:
        x = jnp.fft.fft(jnp.ones(8, jnp.float32))
        np.asarray(x)
        return True
    except Exception:
        return False


def _use_native():
    try:
        from ..config import conf
        mode = getattr(conf, "fft_backend", "auto")
    except Exception:
        mode = "auto"
    if mode == "native":
        return True
    if mode == "custom":
        return False
    return native_fft_supported()


def fft_pair(xr, xi):
    """Forward DFT of xr + i·xi along the last axis → (re, im)."""
    if _use_native():
        y = jnp.fft.fft(jax.lax.complex(xr, jnp.broadcast_to(xi, xr.shape)
                                        .astype(xr.dtype)))
        return jnp.real(y), jnp.imag(y)
    return _fft_core(xr, jnp.broadcast_to(xi, xr.shape).astype(xr.dtype), -1)


def ifft_pair(xr, xi):
    """Inverse DFT (normalized by 1/n) → (re, im)."""
    n = xr.shape[-1]
    if _use_native():
        y = jnp.fft.ifft(jax.lax.complex(xr, jnp.broadcast_to(xi, xr.shape)
                                         .astype(xr.dtype)))
        return jnp.real(y), jnp.imag(y)
    yr, yi = _fft_core(xr, jnp.broadcast_to(xi, xr.shape).astype(xr.dtype), +1)
    inv = 1.0 / n
    return yr * inv, yi * inv


def rfft_pair(x):
    """FFT of a real signal (full-length spectrum as (re, im))."""
    return fft_pair(x, jnp.zeros((), x.dtype))
