"""Pallas TPU kernel for the BLS duration-window scan.

The shared-time BLS kernel (``ops.bls._bls_shared_scan``) has two stages:
(1) the fold histogram as an MXU matmul — already near MXU peak — and
(2) the duration-window scan over the bin prefix sums, which in XLA form
re-reads the (C, nbins_pad, 2B) ``csum`` array from HBM for every trial
duration (6 rolled passes + winner-stat select passes: measured 74 ms of
the 132 ms step at B=512/N=8192/P=512 on a v5e).

This kernel fuses the whole window scan: each grid cell loads one
(nbins_pad, TB) tile of the w- and wy-prefix sums into VMEM ONCE and
evaluates every duration, the objective, the running argmax and the
winner statistics in-register.  HBM traffic drops from ~13 passes over
``csum`` to exactly one.

Semantics are identical to the XLA windowing stage in
``_bls_shared_scan`` (reference behavior: astropy's BLS objective at
``/root/reference/src/lightkurve/periodogram.py:1169``):

    w_in(b, k)  = csum[b + k - 1] - csum[b - 1]   (circular via the
                  duplicated wrap extension rows already in the fold)
    depth       = wy_out / w_out - wy_in / w_in
    objective   = 0.5 * w_in * depth^2            (likelihood)
                  or depth / sqrt(1/w_in + 1/w_out)  (snr)

with windows valid for start bins b < nbins_p and k <= nbins_p; the
first strictly-greater duration wins (same tie rule as the XLA path).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["window_scan_pallas", "window_scan_pallas_uniform"]

LANE_TILE = 128  # lane width of one batch tile


def _make_kernel(nbins_pad, k_durs, dur_values, d_phase, use_likelihood,
                 out_dtype):
    neg_inf = float("-inf")

    def kernel(nbp_ref, pc_ref, tw_ref, twy_ref, cw_ref, cwy_ref,
               power_ref, depth_ref, w_in_ref, t0_ref, dur_ref):
        cw = cw_ref[0]                       # (nbins_pad, TB) f32
        cwy = cwy_ref[0]
        c = pl.program_id(0)
        nbp = nbp_ref[c, 0]                  # int32 scalar
        pc = pc_ref[c, 0]                    # f32 scalar (trial period)
        tw = tw_ref[0]                       # (1, TB)
        twy = twy_ref[0]

        rows = jax.lax.broadcasted_iota(jnp.int32, (nbins_pad, LANE_TILE), 0)
        row0 = rows == 0
        # exclusive prefix: c_ex[r] = csum[r-1], c_ex[0] = 0
        cex_w = jnp.where(row0, 0.0, pltpu.roll(cw, 1, axis=0))
        cex_wy = jnp.where(row0, 0.0, pltpu.roll(cwy, 1, axis=0))

        best_v = jnp.full((LANE_TILE,), -jnp.inf, jnp.float32)
        best_depth = jnp.zeros((LANE_TILE,), jnp.float32)
        best_win = jnp.ones((LANE_TILE,), jnp.float32)
        best_arg = jnp.zeros((LANE_TILE,), jnp.float32)
        best_k = jnp.full((LANE_TILE,), float(k_durs[0]), jnp.float32)
        # durations carry the OUTPUT dtype: under interpret-mode x64 the
        # f32 representation of e.g. 0.2 differs from the XLA path's f64
        best_dur = jnp.full((LANE_TILE,), float(dur_values[0]), out_dtype)

        for k, dval in zip(k_durs, dur_values):
            # pltpu.roll requires a non-negative shift; roll by -(k-1)
            # equals roll by nbins_pad-(k-1)
            hi_w = pltpu.roll(cw, nbins_pad - (k - 1), axis=0)
            hi_wy = pltpu.roll(cwy, nbins_pad - (k - 1), axis=0)
            w_in = hi_w - cex_w
            wy_in = hi_wy - cex_wy
            w_out = tw - w_in
            wy_out = twy - wy_in
            valid = (rows < nbp) & (k <= nbp)
            ok = valid & (w_in > 0) & (w_out > 0)
            w_in_s = jnp.where(ok, w_in, 1.0)
            w_out_s = jnp.where(ok, w_out, 1.0)
            depth = wy_out / w_out_s - wy_in / w_in_s
            if use_likelihood:
                obj = 0.5 * w_in_s * depth * depth
            else:
                obj = depth * jax.lax.rsqrt(1.0 / w_in_s + 1.0 / w_out_s)
            obj = jnp.where(ok, obj, neg_inf)
            v = jnp.max(obj, axis=0)                       # (TB,)
            arg = jnp.argmax(obj, axis=0).astype(jnp.int32)
            sel = rows == arg[None, :]
            d_at = jnp.sum(jnp.where(sel, depth, 0.0), axis=0)
            w_at = jnp.sum(jnp.where(sel, w_in_s, 0.0), axis=0)
            upd = v > best_v
            best_v = jnp.where(upd, v, best_v)
            best_depth = jnp.where(upd, d_at, best_depth)
            best_win = jnp.where(upd, w_at, best_win)
            best_arg = jnp.where(upd, arg.astype(jnp.float32), best_arg)
            best_k = jnp.where(upd, float(k), best_k)
            best_dur = jnp.where(upd, jnp.asarray(float(dval), out_dtype),
                                 best_dur)

        # t0 in the OUTPUT dtype (f64 under x64): best_arg/best_k are
        # exact small ints in f32, but the product must not round to f32
        t0 = (best_arg.astype(out_dtype)
              + 0.5 * best_k.astype(out_dtype)) * d_phase
        t0 = t0 - jnp.floor(t0 / pc.astype(out_dtype)) * pc.astype(out_dtype)
        power_ref[0] = best_v.astype(out_dtype)[None, :]
        depth_ref[0] = best_depth.astype(out_dtype)[None, :]
        w_in_ref[0] = best_win.astype(out_dtype)[None, :]
        t0_ref[0] = t0.astype(out_dtype)[None, :]
        dur_ref[0] = best_dur.astype(out_dtype)[None, :]

    return kernel


def _uniform_window_body(cy, cn, nbp, pc, ty, nbins_pad, n_total, k_durs,
                         dur_values, d_phase, use_likelihood, out_dtype):
    """Shared in-register duration-window scan for per-curve-constant
    weights.  ``cy`` (npad, TB) / ``cn`` (npad, 1) are INCLUSIVE bin
    prefix sums (with the circular wrap extension rows already folded
    in), ``ty`` (1, TB) per-curve totals, ``nbp``/``pc`` scalars.
    Returns (power, depth, n_in, t0, duration) as (TB,) vectors in
    ``out_dtype``.  Used by both the standalone window kernel and the
    fully-fused fold+window kernel (``ops.bls_fused_pallas``).

    The in-window count column (npad, 1) replaces B per-curve weight
    columns, divisions happen once per bin instead of once per
    (bin, curve), and depth is one fma per element:
    ``depth = tot_y·inv_out − y_in·(inv_in + inv_out)``.
    """
    neg_inf = float("-inf")
    lane = cy.shape[1]

    rows = jax.lax.broadcasted_iota(jnp.int32, (nbins_pad, lane), 0)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (nbins_pad, 1), 0)
    cex_y = jnp.where(rows == 0, 0.0, pltpu.roll(cy, 1, axis=0))
    cex_n = jnp.where(rows1 == 0, 0.0, pltpu.roll(cn, 1, axis=0))

    best_v = jnp.full((lane,), -jnp.inf, jnp.float32)
    best_depth = jnp.zeros((lane,), jnp.float32)
    best_nin = jnp.ones((lane,), jnp.float32)
    best_arg = jnp.zeros((lane,), jnp.float32)
    best_k = jnp.full((lane,), float(k_durs[0]), jnp.float32)
    # durations carry the OUTPUT dtype: under interpret-mode x64 the
    # f32 representation of e.g. 0.2 differs from the XLA path's f64
    best_dur = jnp.full((lane,), float(dur_values[0]), out_dtype)

    for k, dval in zip(k_durs, dur_values):
        n_in = pltpu.roll(cn, nbins_pad - (k - 1), axis=0) - cex_n
        y_in = pltpu.roll(cy, nbins_pad - (k - 1), axis=0) - cex_y
        n_out = n_total - n_in
        okn = ((rows1 < nbp) & (k <= nbp)
               & (n_in > 0) & (n_out > 0))          # (npad, 1)
        n_in_s = jnp.where(okn, n_in, 1.0)
        inv_in = 1.0 / n_in_s
        inv_out = 1.0 / jnp.where(okn, n_out, 1.0)
        s = inv_in + inv_out                         # (npad, 1)
        depth = ty * inv_out - y_in * s              # (npad, TB)
        if use_likelihood:
            obj = (0.5 * n_in_s) * depth * depth
        else:
            obj = depth * jax.lax.rsqrt(s)
        obj = jnp.where(okn, obj, neg_inf)
        v = jnp.max(obj, axis=0)                     # (TB,)
        arg = jnp.argmax(obj, axis=0).astype(jnp.int32)
        sel = rows == arg[None, :]
        d_at = jnp.sum(jnp.where(sel, depth, 0.0), axis=0)
        n_at = jnp.sum(jnp.where(sel, n_in_s, 0.0), axis=0)
        upd = v > best_v
        best_v = jnp.where(upd, v, best_v)
        best_depth = jnp.where(upd, d_at, best_depth)
        best_nin = jnp.where(upd, n_at, best_nin)
        best_arg = jnp.where(upd, arg.astype(jnp.float32), best_arg)
        best_k = jnp.where(upd, float(k), best_k)
        best_dur = jnp.where(upd, jnp.asarray(float(dval), out_dtype),
                             best_dur)

    t0 = (best_arg.astype(out_dtype)
          + 0.5 * best_k.astype(out_dtype)) * d_phase
    t0 = t0 - jnp.floor(t0 / pc.astype(out_dtype)) * pc.astype(out_dtype)
    return (best_v.astype(out_dtype), best_depth.astype(out_dtype),
            best_nin.astype(out_dtype), t0.astype(out_dtype), best_dur)


def _make_kernel_uniform(nbins_pad, n_total, k_durs, dur_values, d_phase,
                         use_likelihood, out_dtype):
    """Window scan for per-curve-constant weights (see
    :func:`_uniform_window_body`)."""

    def kernel(nbp_ref, pc_ref, ty_ref, cn_ref, cy_ref,
               power_ref, depth_ref, n_in_ref, t0_ref, dur_ref):
        cy = cy_ref[0]                       # (nbins_pad, TB) f32
        cn = cn_ref[0]                       # (nbins_pad, 1)  f32
        c = pl.program_id(0)
        nbp = nbp_ref[c, 0]                  # int32 scalar
        pc = pc_ref[c, 0]                    # f32 scalar (trial period)
        ty = ty_ref[0]                       # (1, TB) per-curve Σ(y−μ)

        power, depth, n_in, t0, dur = _uniform_window_body(
            cy, cn, nbp, pc, ty, nbins_pad, n_total, k_durs, dur_values,
            d_phase, use_likelihood, out_dtype)
        power_ref[0] = power[None, :]
        depth_ref[0] = depth[None, :]
        n_in_ref[0] = n_in[None, :]
        t0_ref[0] = t0[None, :]
        dur_ref[0] = dur[None, :]

    return kernel


@partial(jax.jit, static_argnames=("n_total", "k_durs", "dur_values",
                                   "d_phase", "use_likelihood", "interpret"))
def window_scan_pallas_uniform(cs_y, cs_n, nbins_p, pc, tot_y, n_total,
                               k_durs, dur_values, d_phase,
                               use_likelihood=True, interpret=False):
    """Uniform-weight duration-window scan (see ``_make_kernel_uniform``).

    Parameters
    ----------
    cs_y : (C, nbins_pad, B) f32 — prefix sums of the Σ(y−μ) fold.
    cs_n : (C, nbins_pad, 1) f32 — prefix sums of the count fold.
    tot_y : (B,) f32 per-curve totals; n_total: static sample count.

    Returns dict of (C, B) arrays with COUNT-based statistics (``w_in``
    holds n_in); the caller applies the per-curve weight rescale.
    """
    C, nbins_pad, B = cs_y.shape
    assert B % LANE_TILE == 0, f"B={B} must be a multiple of {LANE_TILE}"
    nb = B // LANE_TILE
    out_dtype = cs_y.dtype

    kernel = _make_kernel_uniform(nbins_pad, float(n_total), k_durs,
                                  dur_values, float(d_phase),
                                  use_likelihood, out_dtype)

    grid = (C, nb)
    cy_spec = pl.BlockSpec((1, nbins_pad, LANE_TILE), lambda c, b: (c, 0, b),
                           memory_space=pltpu.VMEM)
    cn_spec = pl.BlockSpec((1, nbins_pad, 1), lambda c, b: (c, 0, 0),
                           memory_space=pltpu.VMEM)
    ty_spec = pl.BlockSpec((1, 1, LANE_TILE), lambda c, b: (0, 0, b),
                           memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((C, 1), lambda c, b: (0, 0),
                               memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, 1, LANE_TILE), lambda c, b: (c, 0, b),
                            memory_space=pltpu.VMEM)
    out_struct = jax.ShapeDtypeStruct((C, 1, B), out_dtype)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[scalar_spec, scalar_spec, ty_spec, cn_spec, cy_spec],
        out_specs=[out_spec] * 5,
        out_shape=[out_struct] * 5,
        interpret=interpret,
    )(nbins_p.astype(jnp.int32).reshape(C, 1),
      pc.astype(out_dtype).reshape(C, 1),
      tot_y.reshape(1, 1, B).astype(out_dtype),
      cs_n, cs_y)
    power, depth, n_in, t0, dur = (o.reshape(C, B) for o in outs)
    return dict(power=power, depth=depth, w_in=n_in, transit_time=t0,
                duration=dur)


@partial(jax.jit, static_argnames=("k_durs", "dur_values", "d_phase",
                                   "use_likelihood", "interpret"))
def window_scan_pallas(csum, nbins_p, pc, total, k_durs, dur_values,
                       d_phase, use_likelihood=True, interpret=False):
    """Duration-window scan over bin prefix sums, one HBM pass.

    Parameters
    ----------
    csum : (C, nbins_pad, 2B) f32 — inclusive prefix sums of the circular
        double-deposit fold histogram; columns [0:B] are Σw, [B:2B] Σw·y.
    nbins_p : (C,) int32 — per-period bin count ceil(period/d_phase).
    pc : (C,) — trial periods.
    total : (2B,) f32 — direct Σw / Σw·y totals.
    k_durs, dur_values : static tuples (duration bin counts / values).
    d_phase : static float bin width.

    Returns dict of (C, B) arrays: power, depth, w_in, transit_time,
    duration.
    """
    C, nbins_pad, twoB = csum.shape
    B = twoB // 2
    assert B % LANE_TILE == 0, f"B={B} must be a multiple of {LANE_TILE}"
    nb = B // LANE_TILE
    out_dtype = csum.dtype

    kernel = _make_kernel(nbins_pad, k_durs, dur_values, float(d_phase),
                          use_likelihood, out_dtype)

    grid = (C, nb)
    csum_spec_w = pl.BlockSpec((1, nbins_pad, LANE_TILE),
                               lambda c, b: (c, 0, b),
                               memory_space=pltpu.VMEM)
    csum_spec_wy = pl.BlockSpec((1, nbins_pad, LANE_TILE),
                                lambda c, b: (c, 0, b + nb),
                                memory_space=pltpu.VMEM)
    tot_spec_w = pl.BlockSpec((1, 1, LANE_TILE), lambda c, b: (0, 0, b),
                              memory_space=pltpu.VMEM)
    tot_spec_wy = pl.BlockSpec((1, 1, LANE_TILE), lambda c, b: (0, 0, b + nb),
                               memory_space=pltpu.VMEM)
    # SMEM blocks must span the whole array; the kernel indexes by
    # program_id(0)
    scalar_spec = pl.BlockSpec((C, 1), lambda c, b: (0, 0),
                               memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, 1, LANE_TILE), lambda c, b: (c, 0, b),
                            memory_space=pltpu.VMEM)
    out_struct = jax.ShapeDtypeStruct((C, 1, B), out_dtype)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[scalar_spec, scalar_spec, tot_spec_w, tot_spec_wy,
                  csum_spec_w, csum_spec_wy],
        out_specs=[out_spec] * 5,
        out_shape=[out_struct] * 5,
        interpret=interpret,
    )(nbins_p.astype(jnp.int32).reshape(C, 1),
      pc.astype(csum.dtype).reshape(C, 1),
      total.reshape(1, 1, twoB).astype(csum.dtype),
      total.reshape(1, 1, twoB).astype(csum.dtype),
      csum, csum)
    power, depth, w_in, t0, dur = (o.reshape(C, B) for o in outs)
    return dict(power=power, depth=depth, w_in=w_in, transit_time=t0,
                duration=dur)
