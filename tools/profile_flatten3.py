"""Incremental PREFIX timing of flatten's real one_iter at (512, 8192).

Unlike the component profilers (profile_flatten{,2}.py), this times
jitted prefixes of the actual pipeline — stage attribution survives XLA
fusion across the exact tensors the real step builds.  Differences
between consecutive rows ≈ incremental cost of each stage.
"""
import os
import sys
import time as _time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lightkurve_tpu.ops.detrend as D
from lightkurve_tpu.ops.savgol import savgol_design_matrix, \
    savgol_filter_interp
from lightkurve_tpu.ops.masked import masked_median, masked_median_grouped, \
    masked_std
from lightkurve_tpu.ops.interp import interp_linear_ranked

B, N, W = 512, 8192, 101
MAXSEG = 16
rng = np.random.default_rng(0)
tnp = np.arange(N) * 0.002
fnp = 1.0 + 0.01 * np.sin(2 * np.pi * tnp / 3.0) \
    + 1e-4 * rng.standard_normal((B, N))
dtype = jnp.float32
tt = jnp.broadcast_to(jnp.asarray(tnp, dtype), (B, N))
ff = jnp.asarray(fnp, dtype)
vv = jnp.asarray(rng.random((B, N)) > 0.01)
H = jnp.asarray(savgol_design_matrix(W, 2), dtype)
BT = jnp.asarray(5.0, dtype)
SG = jnp.asarray(3.0, dtype)


def prefix(stage):
    """one_iter of detrend.flatten up to `stage`, returning a scalar."""
    def f1(time, flux, valid):
        n = time.shape[0]
        w = W
        idx = jnp.arange(n)
        order = D._compact(valid)
        m = jnp.sum(valid)
        ct = time[order]
        cf = flux[order]
        if stage == 1:
            return ct.sum() + cf.sum()
        dt = jnp.diff(ct, append=ct[-1:])
        dt_valid = idx < (m - 1)
        med_dt = masked_median(dt, dt_valid)
        is_gap = dt > (BT * med_dt)
        brk = jnp.concatenate([jnp.array([True]), is_gap[:-1]])
        brk = brk | (idx >= m)
        lo, hi = D._segment_bounds(brk, n)
        hi = jnp.minimum(hi, m)
        seglen = hi - lo
        if stage == 2:
            return lo.sum() + hi.sum()
        trend_c = savgol_filter_interp(cf, H, lo, hi)
        if stage == 3:
            return trend_c.sum()
        seg_id = jnp.clip(jnp.cumsum(brk) - 1, 0, MAXSEG - 1)
        seg_med = masked_median_grouped(cf, seg_id, MAXSEG, valid=idx < m)
        short = (w > seglen) | (seglen < BT)
        trend_c = jnp.where(short, seg_med[seg_id], trend_c)
        if stage == 4:
            return trend_c.sum()
        resid = cf - trend_c
        std = masked_std(resid, idx < m)
        keep = jnp.abs(resid) < (std * SG + 1e-14)
        keep = keep & (idx < m)
        if stage == 5:
            return keep.sum().astype(dtype)
        order2 = D._compact(keep)
        m2 = jnp.sum(keep)
        xp = ct[order2]
        fp = trend_c[order2]
        valid_new = jnp.zeros_like(valid).at[order].set(keep)
        kept_i = valid_new.astype(jnp.int32)
        ranks = jnp.cumsum(kept_i) - kept_i
        if stage == 6:
            return xp.sum() + fp.sum() + ranks.sum().astype(dtype)
        trend_full = interp_linear_ranked(time, xp, fp, ranks, m2)
        return trend_full.sum()

    return jax.jit(jax.vmap(f1))


def timeit(name, fn, reps=3):
    r = fn(tt, ff, vv)
    jax.tree.map(lambda a: a.block_until_ready(), r)
    t0 = _time.time()
    for _ in range(reps):
        r = fn(tt, ff, vv)
    jax.tree.map(lambda a: np.asarray(a), r)
    dt = (_time.time() - t0) / reps
    print(f"{name:>28}: {dt*1e3:8.1f} ms", flush=True)
    return dt


names = ["1 compact+gathers", "2 gaps+bounds", "3 savgol", "4 seg medians",
         "5 clip", "6 recompact+ranks", "7 interp (full iter)"]
prev = 0.0
for s, nm in enumerate(names, 1):
    dt = timeit(nm, prefix(s))
    print(f"{'':>28}  (+{(dt-prev)*1e3:7.1f} ms incremental)", flush=True)
    prev = dt

timeit("full flatten niters=1",
       lambda a, b, c: D.flatten_batch(a, b, c, H, BT, SG, niters=1))
timeit("full flatten niters=3",
       lambda a, b, c: D.flatten_batch(a, b, c, H, BT, SG, niters=3))
