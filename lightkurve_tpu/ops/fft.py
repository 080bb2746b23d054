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
def _stage_factor(L, sign):
    ang = sign * np.pi * np.arange(L) / L
    return np.cos(ang)[:, None], np.sin(ang)[:, None]


def _fft_core(xr, xi, sign):
    n = xr.shape[-1]
    if n & (n - 1):
        raise ValueError(f"FFT length must be a power of two, got {n}")
    if n >= _FOUR_STEP_MIN:
        return _fft_four_step(xr, xi, sign)
    dtype = xr.dtype
    n_min = min(n, _BASE)
    c = n // n_min
    # (..., n) -> (..., n_min, c): column j is the stride-c subsequence x[j::c]
    Xr = xr.reshape(xr.shape[:-1] + (n_min, c))
    Xi = xi.reshape(xi.shape[:-1] + (n_min, c))
    Mr, Mi = _dft_matrices(n_min, sign)
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


# ---------------------------------------------------------------------------
# Four-step (Bailey) FFT — the TPU path for long transforms.
#
# The radix-2 butterfly stages above halve the trailing (lane) dimension
# every stage, so for large n the final ~7 stages run essentially
# lane-serial on the VPU (measured ~2 s for a (256, 131072) batch on one
# v5e).  Factoring n = n1·n2 instead turns the transform into two batched
# DFT *matmuls* on the MXU with an elementwise twiddle in between:
#
#   x[(j1·n2)+j2] → A[j1,j2];  B = F(n1)ᵀA;  B *= T[k1,j2];  X = B·F(n2)
#   with T = exp(s·2πi·k1·j2/n),  output X[k1,k2] read out as k = k1+n1·k2.
#
# All factor matrices are built on the host in float64.  Complex values
# travel as (re, im) pairs; a complex matmul is 4 real matmuls at HIGHEST
# precision (TPU DEFAULT would truncate the unit-modulus twiddles to bf16).
# ---------------------------------------------------------------------------
_FOUR_STEP_MIN = 1024


@lru_cache(maxsize=None)
def _dft_matrices(m, sign):
    k = np.arange(m)
    ang = sign * 2.0 * np.pi * k[:, None] * k[None, :] / m
    return np.cos(ang), np.sin(ang)


@lru_cache(maxsize=None)
def _four_step_twiddle(n1, n2, sign):
    k1 = np.arange(n1)[:, None]
    j2 = np.arange(n2)[None, :]
    ang = sign * 2.0 * np.pi * (k1 * j2) / (n1 * n2)
    return np.cos(ang), np.sin(ang)


def _fft_four_step(xr, xi, sign):
    n = xr.shape[-1]
    n1 = 1 << (n.bit_length() // 2)
    n2 = n // n1
    dtype = xr.dtype
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    Ar = xr.reshape(xr.shape[:-1] + (n1, n2))
    Ai = xi.reshape(xi.shape[:-1] + (n1, n2))
    F1r, F1i = (jnp.asarray(a, dtype) for a in _dft_matrices(n1, sign))
    Br = mm(F1r, Ar) - mm(F1i, Ai)                   # (..., n1, n2)
    Bi = mm(F1r, Ai) + mm(F1i, Ar)
    Tr, Ti = (jnp.asarray(a, dtype) for a in _four_step_twiddle(n1, n2,
                                                                sign))
    Cr = Br * Tr - Bi * Ti
    Ci = Br * Ti + Bi * Tr
    F2r, F2i = (jnp.asarray(a, dtype) for a in _dft_matrices(n2, sign))
    Xr = mm(Cr, F2r) - mm(Ci, F2i)                   # (..., n1, n2) = [k1,k2]
    Xi = mm(Cr, F2i) + mm(Ci, F2r)
    # k = k1 + n1·k2 → k2-major layout
    Xr = jnp.swapaxes(Xr, -1, -2).reshape(xr.shape)
    Xi = jnp.swapaxes(Xi, -1, -2).reshape(xr.shape)
    return Xr, Xi


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
