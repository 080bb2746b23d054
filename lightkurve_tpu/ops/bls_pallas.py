"""Pallas TPU kernel for the binned BLS scan.

The per-period fold-and-bin is the hot loop of the transit search.  XLA
lowers ``segment_sum`` to scatter-adds, which serialize on TPU; this
kernel instead builds the phase histogram as **one-hot matmuls on the
MXU**: for each 128-bin tile, a (128, N) one-hot of the samples' bin ids
is contracted against the (N, 2) [w, w·y] matrix — a dense matmul the
systolic array executes at full rate.  Windowed box sums then come from a
prefix sum over the (nbins, 2) histogram, and the per-period optimum over
(phase, duration) is reduced in-kernel so only O(P) scalars leave the
kernel.

Grid: one program per trial period; time/weight arrays are replicated
into VMEM once (they are shared by every period).  Output layout matches
``ops.bls.bls_power_binned``.

Works under ``interpret=True`` on CPU for testing; on TPU it requires a
Mosaic-enabled backend.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bls_power_pallas"]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _make_kernel(n, nbins_pad, n_dur, use_likelihood):
    def kernel(periods_ref, dphase_ref, ts_ref, wwy_ref, kdur_ref,
               power_ref, depth_ref, deptherr_ref, snr_ref, ll_ref,
               dur_idx_ref, t0_ref, hist_ref):
        period = periods_ref[0]
        d_phase = dphase_ref[0]
        ts = ts_ref[:]                                  # (1, n)
        phase = ts - jnp.floor(ts / period) * period
        ids = jnp.floor(phase / d_phase).astype(jnp.int32)
        ids = jnp.clip(ids, 0, nbins_pad - 1)           # (1, n)

        # histogram into (nbins_pad, 2) via one-hot matmuls, 128 bins/tile
        n_tiles = nbins_pad // 128
        wwy = wwy_ref[:]                                # (n, 2)

        def tile_body(tb, _):
            base = tb * 128
            rows = base + jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
            onehot = (rows == ids).astype(wwy.dtype)    # (128, n)
            hist_ref[pl.ds(base, 128), :] = jnp.dot(
                onehot, wwy, preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_body, 0)

        # prefix sums over bins (cw[j] = sum of bins < j)
        hist = hist_ref[:]                              # (nbins_pad, 2)
        csum = jnp.cumsum(hist, axis=0)
        nbins_p = jnp.minimum(
            jnp.ceil(period / d_phase).astype(jnp.int32), nbins_pad)
        # totals over the VALID bins only (ids were clipped; bins past
        # nbins_p hold clipped junk when period > nbins_pad*d_phase —
        # callers size nbins_pad to the longest period so this is exact)
        total = csum[nbins_p - 1, :]
        total_w = total[0]
        total_wy = total[1]

        def exclusive(idx):
            # csum_excl[j] = sum of bins [0, j) with j in [0, nbins_p]
            safe = jnp.clip(idx - 1, 0, nbins_pad - 1)
            vals = csum[safe, :]
            return jnp.where((idx > 0)[..., None], vals, 0.0)

        starts = jax.lax.broadcasted_iota(jnp.int32, (nbins_pad, n_dur), 0)
        k_durs = kdur_ref[:]                            # (1, n_dur)
        ends = starts + k_durs
        wraps = ends > nbins_p
        ends_m = jnp.where(wraps, ends - nbins_p, ends)
        c_lo = exclusive(starts)                        # (nbins_pad,n_dur,2)
        c_hi = exclusive(ends_m)
        plain = c_hi - c_lo
        wrap = (total[None, None, :] - c_lo) + c_hi
        in_sums = jnp.where(wraps[..., None], wrap, plain)
        w_in = in_sums[..., 0]
        wy_in = in_sums[..., 1]
        w_out = total_w - w_in
        wy_out = total_wy - wy_in

        ok = (w_in > 0) & (w_out > 0) & (starts < nbins_p)
        w_in_s = jnp.where(ok, w_in, 1.0)
        w_out_s = jnp.where(ok, w_out, 1.0)
        depth = wy_out / w_out_s - wy_in / w_in_s
        depth_err = jnp.sqrt(1.0 / w_in_s + 1.0 / w_out_s)
        snr = depth / depth_err
        ll = 0.5 * w_in_s * depth * depth
        objective = jnp.where(ok, ll if use_likelihood else snr, -jnp.inf)

        flat = objective.reshape(-1)
        best = jnp.argmax(flat)
        power_ref[0] = flat[best]
        take = lambda a: a.reshape(-1)[best]
        depth_ref[0] = take(depth)
        deptherr_ref[0] = take(depth_err)
        snr_ref[0] = take(snr)
        ll_ref[0] = take(ll)
        dur_idx_ref[0] = (best % n_dur).astype(jnp.int32)
        t0_ref[0] = ((best // n_dur).astype(jnp.float32)
                     + 0.5 * k_durs[0, best % n_dur].astype(jnp.float32)
                     ) * d_phase

    return kernel


def bls_power_pallas(t, y, dy, periods, durations, oversample=10,
                     objective="likelihood", nbins=None, d_phase=None,
                     interpret=False):
    """Binned BLS via the Pallas MXU-histogram kernel.

    Same outputs as :func:`lightkurve_tpu.ops.bls.bls_power_binned`.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU).
    """
    t = jnp.asarray(t, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    periods_np = np.asarray(periods, dtype=np.float32)
    durations_np = np.asarray(durations, dtype=np.float32)
    if dy is None:
        w = jnp.ones_like(y)
    else:
        w = 1.0 / jnp.square(jnp.asarray(dy, jnp.float32))
    t_min = jnp.min(t)
    ts = (t - t_min)[None, :]                            # (1, n)
    wwy = jnp.stack([w, w * y], axis=1)                  # (n, 2)

    if d_phase is None:
        d_phase = float(durations_np.min()) / oversample
    if nbins is None:
        nbins = int(np.ceil(periods_np.max() / d_phase))
    nbins_pad = _round_up(max(nbins, 128), 128)
    n = t.shape[0]
    n_dur = len(durations_np)
    k_durs = np.maximum((durations_np / d_phase + 0.5).astype(np.int32), 1)
    P = len(periods_np)

    kernel = _make_kernel(n, nbins_pad, n_dur,
                          objective == "likelihood")
    out_sd = [jax.ShapeDtypeStruct((P,), jnp.float32) for _ in range(5)] \
        + [jax.ShapeDtypeStruct((P,), jnp.int32),
           jax.ShapeDtypeStruct((P,), jnp.float32)]
    outs = pl.pallas_call(
        kernel,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_dur), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1,), lambda i: (i,),
                                memory_space=pltpu.SMEM)
                   for _ in range(7)],
        out_shape=out_sd,
        scratch_shapes=[pltpu.VMEM((nbins_pad, 2), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(periods_np), jnp.asarray([np.float32(d_phase)]),
      ts, wwy, jnp.asarray(k_durs, jnp.int32)[None, :])

    power, depth, depth_err, snr, ll, dur_idx, t0 = outs
    return dict(power=power, depth=depth, depth_err=depth_err,
                depth_snr=snr, log_likelihood=ll,
                duration=jnp.asarray(durations_np)[dur_idx],
                transit_time=t0 + t_min,
                period=jnp.asarray(periods_np))
