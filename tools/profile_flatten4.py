"""Incremental PREFIX timing of the sort/scan flatten one_iter at (512, 8192).

Times jitted prefixes of the CURRENT pipeline (sort-applied compaction,
fill-scan segment bounds, conv savgol with fused one-hot offset pick,
sort-applied scatter-back, scan-based interp); differences between
consecutive rows ~= incremental stage cost.
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
from lightkurve_tpu.ops.interp import interp_linear_fill

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
        m = jnp.sum(valid)
        ct, cf, order = jax.lax.sort(
            ((~valid).astype(jnp.int32), time, flux,
             idx.astype(jnp.int32)), dimension=0, num_keys=1)[1:]
        if stage == 1:
            return ct.sum() + cf.sum() + order.sum().astype(dtype)
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
        med_elem = jnp.sum(
            jnp.where(seg_id[:, None] == jnp.arange(MAXSEG, dtype=jnp.int32),
                      seg_med[None, :], 0.0), axis=-1)
        trend_c = jnp.where(short, med_elem, trend_c)
        if stage == 4:
            return trend_c.sum()
        resid = cf - trend_c
        std = masked_std(resid, idx < m)
        keep = jnp.abs(resid) < (std * SG + 1e-14)
        keep = keep & (idx < m)
        if stage == 5:
            return keep.sum().astype(dtype)
        merged = jnp.where(keep, trend_c, jnp.nan)
        trend_orig = jax.lax.sort((order, merged), dimension=0,
                                  num_keys=1)[1]
        valid_new = jnp.isfinite(trend_orig)
        if stage == 6:
            return (jnp.where(valid_new, trend_orig, 0.0).sum()
                    + valid_new.sum().astype(dtype))
        trend_full = interp_linear_fill(time, valid_new, trend_orig)
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


names = ["1 sort compact", "2 gaps+bounds", "3 savgol", "4 seg medians",
         "5 clip", "6 sort back", "7 interp fill (full iter)"]
prev = 0.0
for s, nm in enumerate(names, 1):
    dt = timeit(nm, prefix(s))
    print(f"{'':>28}  (+{(dt-prev)*1e3:7.1f} ms incremental)", flush=True)
    prev = dt

timeit("full flatten niters=1",
       lambda a, b, c: D.flatten_batch(a, b, c, H, BT, SG, niters=1))
timeit("full flatten niters=3",
       lambda a, b, c: D.flatten_batch(a, b, c, H, BT, SG, niters=3))
