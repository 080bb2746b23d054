"""Component-level timing inside flatten's one_iter at (512, 8192)."""
import os
import sys
import time as _time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightkurve_tpu.ops.savgol import (savgol_design_matrix,
                                       savgol_filter_interp)
from lightkurve_tpu.ops.interp import interp_linear_ranked
from lightkurve_tpu.ops.masked import masked_median, masked_std

B, N, W = 512, 8192, 101
rng = np.random.default_rng(0)
dtype = jnp.float32
x = jnp.asarray(rng.standard_normal((B, N)), dtype)
t = jnp.broadcast_to(jnp.asarray(np.arange(N) * 0.002, dtype), (B, N))
valid = jnp.asarray(rng.random((B, N)) > 0.01)
H = jnp.asarray(savgol_design_matrix(W, 2), dtype)
lo = jnp.zeros((B, N), jnp.int32)
hi = jnp.full((B, N), N, jnp.int32)


def timeit(name, fn, reps=3):
    jfn = jax.jit(fn)
    r = jfn()
    jax.tree.map(lambda a: a.block_until_ready(), r)
    t0 = _time.time()
    for _ in range(reps):
        r = jfn()
    jax.tree.map(lambda a: np.asarray(a), r)
    print(f"{name:>24}: {(_time.time()-t0)/reps*1e3:8.1f} ms", flush=True)


timeit("argsort compact", lambda: jnp.argsort(~valid, axis=-1, stable=True))
timeit("savgol_filter_interp", lambda: savgol_filter_interp(x, H, lo, hi))
timeit("take_along gather NxW",
       lambda: jnp.take_along_axis(x, jnp.argsort(x, axis=-1), axis=-1))
timeit("masked_median 1x", lambda: masked_median(x, valid))
timeit("masked_median 16seg",
       lambda: masked_median(jnp.broadcast_to(x[:, None, :], (B, 16, N)),
                             jnp.broadcast_to(valid[:, None, :],
                                              (B, 16, N))))
timeit("masked_std", lambda: masked_std(x, valid))
ranks = jnp.cumsum(valid.astype(jnp.int32), axis=-1) - valid.astype(jnp.int32)
timeit("interp_linear_ranked",
       lambda: interp_linear_ranked(t, t, x, ranks, jnp.full((B,), N)))
timeit("scatter .at[order].set",
       lambda: jnp.zeros_like(valid).at[
           jnp.arange(B)[:, None], jnp.argsort(~valid, axis=-1, stable=True)
       ].set(valid))
timeit("cummax+cummin bounds",
       lambda: (jax.lax.cummax(jnp.where(valid, 1, 0), axis=1),
                jnp.flip(jax.lax.cummin(jnp.flip(ranks, 1), axis=1), 1)))

from lightkurve_tpu.ops.masked import masked_median_grouped
gid = jnp.asarray(rng.integers(0, 16, (B, N)), jnp.int32)
timeit("masked_median_grouped16",
       lambda: masked_median_grouped(x, gid, 16, valid))


def compact_scatter(valid):
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), valid.shape)
    cv = jnp.cumsum(valid, axis=-1)
    m = cv[:, -1:]
    target = jnp.where(valid, cv - 1,
                       m + jnp.cumsum(~valid, axis=-1) - 1)
    rows = jnp.arange(B)[:, None]
    return jnp.zeros_like(idx).at[rows, target].set(idx,
                                                    unique_indices=True)


timeit("compact via scatter", lambda: compact_scatter(valid))
timeit("gather x[order]",
       lambda: jnp.take_along_axis(
           x, jnp.argsort(~valid, axis=-1, stable=True), axis=-1))
