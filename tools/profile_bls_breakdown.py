"""Stage-level timing breakdown of _bls_shared_scan on the real TPU.

Isolates: (1) fold one-hot + histogram matmul, (2) + cumsum, (3) full
windowing with per-duration sel/pick winner stats (production), (4)
windowing with objective-max only (no winner-stat reconstruction).
Device-resident methodology: inputs built on device, scalar reduced,
materialized once after the rep loop.
"""
import os
import sys
import time as _time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightkurve_tpu.ops.bls import _bls_shared_scan

B = int(os.environ.get("LK_B", 512))
N = int(os.environ.get("LK_N", 8192))
P = int(os.environ.get("LK_P", 512))
CHUNK = int(os.environ.get("LK_CHUNK", 16))
REPS = int(os.environ.get("LK_REPS", 3))

dtype = jnp.float32
t_np = np.arange(N) * (2.0 / 60 / 24)
periods_np = np.linspace(1.0, float(t_np[-1] / 3), P)
durations_np = np.array([0.05, 0.10, 0.15, 0.20, 0.25, 0.33])
d_phase = float(durations_np.min()) / 10
nbins = int(np.ceil(periods_np.max() / d_phase))
k_durs = tuple(int(max(round(d / d_phase), 1)) for d in durations_np)
dvals = tuple(float(d) for d in durations_np)
k_max = max(k_durs)
nbins_ext = nbins + k_max - 1
nbins_pad = ((nbins_ext + 127) // 128) * 128
n_tiles = nbins_pad // 128
print(f"B={B} N={N} P={P} chunk={CHUNK} nbins={nbins} nbins_pad={nbins_pad} "
      f"tiles={n_tiles} k_durs={k_durs}", flush=True)

ts = jnp.asarray(t_np, dtype)
periods = jnp.asarray(periods_np, dtype)


def make_inputs(key):
    y = 1.0 + 2e-4 * jax.random.normal(key, (B, N), dtype)
    w = jnp.ones((B, N), dtype)
    mu = jnp.mean(y, axis=1, keepdims=True)
    return w.T, (w * (y - mu)).T          # (N, B) each


def fold_hist(ts, W, WY, pc):
    nbins_p = jnp.ceil(pc / d_phase).astype(jnp.int32)
    phase = ts[None, :] - jnp.floor(ts[None, :] / pc[:, None]) * pc[:, None]
    ids = jnp.clip((phase / d_phase).astype(jnp.int32), 0, nbins - 1)
    ids2 = ids + nbins_p[:, None]
    WWY = jnp.concatenate([W, WY], axis=1)
    tiles = []
    for tb in range(n_tiles):
        rows = tb * 128 + jnp.arange(128, dtype=jnp.int32)
        onehot = ((ids[:, None, :] == rows[None, :, None])
                  | (ids2[:, None, :] == rows[None, :, None])
                  ).astype(WWY.dtype)
        tiles.append(jax.lax.dot_general(
            onehot, WWY, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    return jnp.concatenate(tiles, axis=1)   # (C, nbins_pad, 2B)


def scan_over(fn, W, WY):
    n_chunks = P // CHUNK
    out = jax.lax.map(lambda pc: fn(ts, W, WY, pc),
                      periods.reshape(n_chunks, CHUNK))
    return out


@jax.jit
def stage_hist(W, WY):
    return jnp.sum(scan_over(fold_hist, W, WY))


@jax.jit
def stage_hist_csum(W, WY):
    def f(ts, W, WY, pc):
        h = fold_hist(ts, W, WY, pc)
        return jnp.cumsum(h, axis=1)
    return jnp.sum(scan_over(f, W, WY))


@jax.jit
def stage_objmax(W, WY):
    total = jnp.sum(jnp.concatenate([W, WY], axis=1), axis=0,
                    dtype=jnp.float32)[None, None, :]
    rows_b = jnp.arange(nbins_pad, dtype=jnp.int32)

    def f(ts, W, WY, pc):
        nbins_p = jnp.ceil(pc / d_phase).astype(jnp.int32)
        csum = jnp.cumsum(fold_hist(ts, W, WY, pc), axis=1)
        c_ex = jnp.concatenate(
            [jnp.zeros_like(csum[:, :1, :]), csum[:, :-1, :]], axis=1)
        best_v = None
        for k in k_durs:
            hi = jnp.roll(csum, -(k - 1), axis=1)
            in_sums = hi - c_ex
            w_in = in_sums[..., :B]
            wy_in = in_sums[..., B:]
            w_out = total[..., :B] - w_in
            wy_out = total[..., B:] - wy_in
            valid = ((rows_b[None, :] < nbins_p[:, None])
                     & (k <= nbins_p)[:, None])[..., None]
            ok = valid & (w_in > 0) & (w_out > 0)
            w_in_s = jnp.where(ok, w_in, 1.0)
            w_out_s = jnp.where(ok, w_out, 1.0)
            depth = wy_out / w_out_s - wy_in / w_in_s
            obj = jnp.where(ok, 0.5 * w_in_s * depth * depth, -jnp.inf)
            v = jnp.max(obj, axis=1)
            best_v = v if best_v is None else jnp.maximum(best_v, v)
        return best_v
    return jnp.sum(scan_over(f, W, WY))


@jax.jit
def stage_full(W, WY):
    out = _bls_shared_scan(ts, W, WY, periods, k_durs, dvals, d_phase,
                           nbins, True, CHUNK)
    return sum(jnp.sum(v) for v in out.values())


def bench(name, fn, W, WY):
    r = fn(W, WY)
    r.block_until_ready()
    t0 = _time.time()
    for _ in range(REPS):
        r = fn(W, WY)
    float(jnp.real(r)) if r.dtype != bool else None
    dt = (_time.time() - t0) / REPS
    print(f"{name:>16}: {dt*1e3:8.1f} ms", flush=True)
    return dt


key = jax.random.PRNGKey(0)
W, WY = make_inputs(key)
W.block_until_ready()

t_full = bench("full", stage_full, W, WY)
t_hist = bench("hist", stage_hist, W, WY)
t_csum = bench("hist+csum", stage_hist_csum, W, WY)
t_obj = bench("hist+csum+objmax", stage_objmax, W, WY)
print(f"windowing-only ≈ {(t_obj-t_csum)*1e3:.1f} ms; "
      f"winner-stats overhead ≈ {(t_full-t_obj)*1e3:.1f} ms; "
      f"csum ≈ {(t_csum-t_hist)*1e3:.1f} ms", flush=True)
print(f"rate(full) = {B*P/t_full:.0f} curve-period/s", flush=True)
