"""Why is the SweepRunner 'shared' step ~2x slower per curve-period than
the bare bench kernel?  Times, on the real TPU: (a) the bare
bls_power_shared_batch at P=5000, (b) the same + device-side winner
reduction, (c) the full SweepRunner step via _make_step.
"""
import os
import sys
import time as _time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightkurve_tpu.ops.bls import bls_power_shared_batch
from lightkurve_tpu.batch import LightCurveStack
from lightkurve_tpu.parallel.checkpoint import SweepRunner

B, N, P = 512, 8192, 5000
rng = np.random.default_rng(0)
t = np.arange(N) * (2.0 / 60 / 24) + 0.0011
flux = 1.0 + 2e-4 * rng.standard_normal((B, N))
periods = np.linspace(1.0, float((t[-1] - t[0]) / 3), P)
durations = np.array([0.05, 0.10, 0.15, 0.20, 0.25, 0.33])
dtype = jnp.float32
td = jnp.asarray(t, dtype)
Yd = jnp.asarray(flux, dtype)
dyd = jnp.full((B, N), 2e-4, dtype)
pd = jnp.asarray(periods, dtype)
dd = jnp.asarray(durations, dtype)


def timeit(name, fn, reps=2):
    r = fn()
    jax.tree.map(lambda a: a.block_until_ready(), r)
    t0 = _time.time()
    for _ in range(reps):
        r = fn()
    jax.tree.map(lambda a: np.asarray(a), r)
    dt = (_time.time() - t0) / reps
    print(f"{name:>28}: {dt*1e3:9.1f} ms  ({B*P/dt:.3e} cp/s)", flush=True)
    return dt


@jax.jit
def bare():
    out = bls_power_shared_batch(td, Yd, dyd, pd, dd, oversample=10)
    return out["power"]


FIELDS = ("power", "depth", "depth_err", "depth_snr", "log_likelihood",
          "duration", "transit_time", "period")


@jax.jit
def with_reduce():
    out = bls_power_shared_batch(td, Yd, dyd, pd, dd, oversample=10)
    idx = jnp.argmax(out["power"], axis=1)
    return jnp.stack([jnp.take_along_axis(out[f], idx[:, None],
                                          axis=1)[:, 0] for f in FIELDS])


timeit("bare kernel P=5000", bare)
timeit("kernel + winner reduce", with_reduce)

stack = LightCurveStack(time=jnp.broadcast_to(td, (B, N)), flux=Yd,
                        flux_err=dyd, mask=jnp.ones((B, N), bool))
runner = SweepRunner(stack, periods, durations, "/tmp/prof_sweep.npz",
                     chunk_periods=P, method="shared")
step = runner._make_step()
dy = jnp.where(stack.mask, stack.flux_err, jnp.asarray(np.inf, dtype))
nv = jnp.asarray(P, np.int32)
timeit("SweepRunner step", lambda: step(stack.flux, dy, pd, nv))
os.path.exists("/tmp/prof_sweep.npz") and os.remove("/tmp/prof_sweep.npz")
