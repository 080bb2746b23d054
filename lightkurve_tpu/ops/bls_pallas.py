"""Pallas TPU kernel for the binned BLS scan.

The per-period fold-and-bin is the hot loop of the transit search.  XLA
lowers ``segment_sum`` to scatter-adds, which serialize on TPU; this
kernel instead builds the phase histogram as **one-hot matmuls on the
MXU**: for each 128-bin tile, a (128, N) one-hot of the samples' bin ids
is contracted against the (N, 2) [w, w·y] matrix — a dense matmul the
systolic array executes at full rate.

Mosaic-specific design constraints shaped the rest of the kernel:

- no ``cumsum`` primitive → prefix sums are a log-step shift-add scan
  built on ``pltpu.roll``;
- no ``dynamic_slice``/gather → windowed box sums use STATIC shifts of
  the prefix array (durations are compile-time constants), and
  phase-wrap windows are covered by scanning a SECOND fold shifted by
  half a period (a box that wraps in fold A never wraps in fold B for
  durations < period/2, which astropy's validation also requires);
- per-period scalars ride in SMEM blocks of 8 periods per program.

Output layout matches ``ops.bls.bls_power_binned``.  Runs under
``interpret=True`` on CPU for testing.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bls_power_pallas"]

PERIODS_PER_PROGRAM = 8


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _make_kernel(n, nbins_pad, k_durs, d_phase, use_likelihood):
    n_dur = len(k_durs)
    d_phase = float(d_phase)

    def kernel(periods_ref, ts_ref, wwy_ref,
               power_ref, depth_ref, deptherr_ref, snr_ref, ll_ref,
               dur_idx_ref, t0_ref, hist_ref):
        wwy = wwy_ref[:]                                # (n, 2)
        ts = ts_ref[:]                                  # (1, n)
        n_tiles = nbins_pad // 128
        row2 = jax.lax.broadcasted_iota(jnp.int32, (nbins_pad, 2), 0)
        rows1 = jax.lax.broadcasted_iota(jnp.int32, (nbins_pad, 1), 0)

        def histogram(ids):
            """(nbins_pad, 2) histogram of w/wy by bin id (MXU matmuls)."""
            def tile_body(tb, _):
                base = tb * 128
                r = base + jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
                onehot = (r == ids).astype(wwy.dtype)
                hist_ref[pl.ds(base, 128), :] = jnp.dot(
                    onehot, wwy, preferred_element_type=jnp.float32)
                return 0
            jax.lax.fori_loop(0, n_tiles, tile_body, 0)
            return hist_ref[:]

        def prefix(hist):
            """Inclusive prefix sum along bins (log-step roll-scan)."""
            csum = hist
            shift = 1
            while shift < nbins_pad:
                rolled = pltpu.roll(csum, shift, 0)
                csum = csum + jnp.where(row2 >= shift, rolled, 0.0)
                shift *= 2
            return csum

        def shift_up(x, s):
            """y[j] = x[j+s] (garbage masked to 0 in the last s rows)."""
            if s == 0:
                return x
            # circular roll by -s ≡ roll by nbins_pad - s (must be >= 0)
            rolled = pltpu.roll(x, nbins_pad - s, 0)
            return jnp.where(row2 < nbins_pad - s, rolled, 0.0)

        def shift_down1(x):
            """y[j] = x[j-1], 0 at j=0."""
            rolled = pltpu.roll(x, 1, 0)
            return jnp.where(row2 >= 1, rolled, 0.0)

        for slot in range(PERIODS_PER_PROGRAM):
            period = periods_ref[slot, 0]
            nbins_p = jnp.ceil(period / d_phase).astype(jnp.int32)

            cols = {"w_in": [], "wy_in": [], "t0": [], "valid": []}
            total_w = None
            total_wy = None
            for fold in range(2):
                # fold 0: phase = ts mod p; fold 1: shifted by p/2
                base_t = ts if fold == 0 else ts + 0.5 * period
                phase = base_t - jnp.floor(base_t / period) * period
                ids = jnp.clip(
                    jnp.floor(phase / d_phase).astype(jnp.int32),
                    0, nbins_pad - 1)
                hist = histogram(ids)
                csum = prefix(hist)
                if fold == 0:
                    total = jnp.sum(hist, axis=0)       # (2,)
                    total_w = total[0]
                    total_wy = total[1]
                c_excl = shift_down1(csum)              # csum[j-1]
                for k in k_durs:
                    hi = shift_up(csum, int(k) - 1)     # csum[j+k-1]
                    in_sums = hi - c_excl               # (nbins_pad, 2)
                    w_in = in_sums[:, 0:1]
                    wy_in = in_sums[:, 1:2]
                    valid = (rows1 + int(k)) <= nbins_p
                    t0_b = (rows1.astype(jnp.float32)
                            + 0.5 * float(k)) * d_phase
                    if fold == 1:
                        t0_b = t0_b - 0.5 * period
                        t0_b = t0_b - jnp.floor(t0_b / period) * period
                    cols["w_in"].append(w_in)
                    cols["wy_in"].append(wy_in)
                    cols["t0"].append(t0_b)
                    cols["valid"].append(valid)

            # per-column (static count) reduction, then a where-chain over
            # columns — Mosaic forbids the non-tile-aligned reshape a flat
            # argmax would need
            best = None
            for c in range(2 * n_dur):
                w_in = cols["w_in"][c]                  # (nbins_pad, 1)
                wy_in = cols["wy_in"][c]
                valid = cols["valid"][c]
                t0_col = cols["t0"][c]
                w_out = total_w - w_in
                wy_out = total_wy - wy_in
                ok = valid & (w_in > 0) & (w_out > 0)
                w_in_s = jnp.where(ok, w_in, 1.0)
                w_out_s = jnp.where(ok, w_out, 1.0)
                depth = wy_out / w_out_s - wy_in / w_in_s
                depth_err = jnp.sqrt(1.0 / w_in_s + 1.0 / w_out_s)
                snr = depth / depth_err
                ll = 0.5 * w_in_s * depth * depth
                obj = jnp.where(ok, ll if use_likelihood else snr,
                                -jnp.inf)
                v = jnp.max(obj)
                at = obj == v                           # first row wins
                r = jnp.min(jnp.where(at, rows1, nbins_pad))
                sel = rows1 == r

                def pick(a):
                    return jnp.sum(jnp.where(sel, a, 0.0))

                cand = dict(power=v, depth=pick(depth),
                            depth_err=pick(depth_err), snr=pick(snr),
                            ll=pick(ll), t0=pick(t0_col),
                            dur=jnp.int32(c % n_dur))
                if best is None:
                    best = cand
                else:
                    upd = cand["power"] > best["power"]
                    best = {k: jnp.where(upd, cand[k], best[k])
                            for k in best}

            power_ref[slot, 0] = best["power"]
            depth_ref[slot, 0] = best["depth"]
            deptherr_ref[slot, 0] = best["depth_err"]
            snr_ref[slot, 0] = best["snr"]
            ll_ref[slot, 0] = best["ll"]
            dur_idx_ref[slot, 0] = best["dur"]
            t0_ref[slot, 0] = best["t0"]

    return kernel


def bls_power_pallas(t, y, dy, periods, durations, oversample=10,
                     objective="likelihood", nbins=None, d_phase=None,
                     interpret=False):
    """Binned BLS via the Pallas MXU-histogram kernel.

    Same outputs as :func:`lightkurve_tpu.ops.bls.bls_power_binned`
    (window t0 candidates are the union of the two folds' grids, so the
    recovered optimum can only be equal or better).  ``interpret=True``
    runs the kernel in the Pallas interpreter (CPU).
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
    ppp = PERIODS_PER_PROGRAM
    P_pad = _round_up(P, ppp)
    periods_pad = np.pad(periods_np, (0, P_pad - P),
                         constant_values=periods_np[-1])

    kernel = _make_kernel(n, nbins_pad, tuple(int(k) for k in k_durs),
                          np.float32(d_phase), objective == "likelihood")
    f32 = jnp.float32
    out_sd = [jax.ShapeDtypeStruct((P_pad, 1), f32) for _ in range(5)] \
        + [jax.ShapeDtypeStruct((P_pad, 1), jnp.int32),
           jax.ShapeDtypeStruct((P_pad, 1), f32)]
    scalar_out = [pl.BlockSpec((ppp, 1), lambda i: (i, 0),
                               memory_space=pltpu.SMEM) for _ in range(7)]
    outs = pl.pallas_call(
        kernel,
        grid=(P_pad // ppp,),
        in_specs=[
            pl.BlockSpec((ppp, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=scalar_out,
        out_shape=out_sd,
        scratch_shapes=[pltpu.VMEM((nbins_pad, 2), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(periods_pad)[:, None], ts, wwy)

    power, depth, depth_err, snr, ll, dur_idx, t0 = \
        [o[:P, 0] for o in outs]
    return dict(power=power, depth=depth, depth_err=depth_err,
                depth_snr=snr, log_likelihood=ll,
                duration=jnp.asarray(durations_np)[dur_idx],
                transit_time=t0 + t_min,
                period=jnp.asarray(periods_np))
