"""Stage timing of flatten_batch on the real TPU: where do the 2.5 s at
(512, 8192) x 3 iters go?  Variants replace suspected hot pieces with
cheap stand-ins (results wrong, time telling).
"""
import os
import sys
import time as _time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import lightkurve_tpu.ops.detrend as D
from lightkurve_tpu.ops.savgol import savgol_design_matrix

B, N = 512, 8192
rng = np.random.default_rng(0)
t = np.arange(N) * 0.002
flux = 1.0 + 0.01 * np.sin(2 * np.pi * t / 3.0) \
    + 1e-4 * rng.standard_normal((B, N))
dtype = jnp.float32
tt = jnp.broadcast_to(jnp.asarray(t, dtype), (B, N))
ff = jnp.asarray(flux, dtype)
mm = jnp.ones((B, N), bool)
H = jnp.asarray(savgol_design_matrix(101, 2), dtype)
bt = jnp.asarray(5.0, dtype)
sg = jnp.asarray(3.0, dtype)


def timeit(name, fn, reps=2):
    r = fn()
    jax.tree.map(lambda a: a.block_until_ready(), r)
    t0 = _time.time()
    for _ in range(reps):
        r = fn()
    jax.tree.map(lambda a: np.asarray(a), r)
    dt = (_time.time() - t0) / reps
    print(f"{name:>26}: {dt*1e3:8.1f} ms  ({B/dt:.0f} curves/s)",
          flush=True)


timeit("full flatten (3 iters)",
       lambda: D.flatten_batch(tt, ff, mm, H, bt, sg, niters=3))
timeit("1 iter",
       lambda: D.flatten_batch(tt, ff, mm, H, bt, sg, niters=1))

# variant: no seg-median fallback (16 masked medians per iter)
orig_masked_median = D.masked_median


def fake_masked_median(x, mask, axis=-1):
    return masked_mean_like(x, mask, axis)


def masked_mean_like(x, mask, axis=-1):
    return jnp.sum(jnp.where(mask, x, 0.0), axis=axis) / jnp.maximum(
        jnp.sum(mask, axis=axis), 1)


D.masked_median = fake_masked_median
timeit("medians -> means",
       lambda: D.flatten_batch(tt, ff, mm, H, bt, sg, niters=3))
D.masked_median = orig_masked_median

# variant: compaction via searchsorted-gather instead of argsort
orig_compact = D._compact


def compact_gather(valid):
    csum = jnp.cumsum(valid.astype(jnp.int32))
    return jnp.searchsorted(csum, jnp.arange(1, valid.shape[0] + 1))


D._compact = compact_gather
timeit("compact -> searchsorted",
       lambda: D.flatten_batch(tt, ff, mm, H, bt, sg, niters=3))
D.masked_median = fake_masked_median
timeit("both variants",
       lambda: D.flatten_batch(tt, ff, mm, H, bt, sg, niters=3))
D._compact = orig_compact
D.masked_median = orig_masked_median
