"""Rate vs batch size B for the uniform shared-BLS kernel.

Measured on the container's TPU v5e (2026-08-20, P=4096, chunk=8,
N=8192, 6 durations, oversample 10, persistent compile cache warm):

    B=  256 chunk=  8     167.9 ms     6.24M evals/s
    B=  512 chunk=  8     258.9 ms     8.10M evals/s
    B= 1024 chunk=  8     366.3 ms    11.45M evals/s
    B= 2048 chunk=  8     655.5 ms    12.80M evals/s
    B= 1024 chunk=  4     419.8 ms     9.99M evals/s
    B= 2048 chunk=  4     718.7 ms    11.67M evals/s
    B= 2048 chunk=  2     729.6 ms    11.50M evals/s

Follow-up sweep (same day, second session):

    B= 2048 chunk=  8 impl=xla       671.2 ms    12.50M evals/s
    B= 4096 chunk=  8 impl=xla      1453.4 ms    11.54M evals/s
    B= 2048 chunk=  8 impl=pallas   1024.9 ms     8.18M evals/s
    B= 2048 chunk= 16 impl=xla       756.2 ms    11.09M evals/s
    B= 4096 chunk= 16 impl=xla      1932.6 ms     8.68M evals/s

Interpretation: the per-chunk one-hot fold matrix is generated once on
the VPU and reused by every batch row's MXU MACs, so generation cost
amortizes with B — and B=2048/chunk=8 is the measured optimum: B=4096
REGRESSES (11.54M; the (B, nbins) working set stops fitting close to
the MXU), larger chunks regress, and the fused Pallas uniform window
scan still loses to the XLA scan at the big batch (8.18M vs 12.50M,
same verdict as B=512: one shared count column makes the per-element
window work a single fma, so the HBM passes it saves don't pay for
leaving the matmul pipeline).  This sets `bench.py`'s default
LK_BENCH_B and the north-star runner's LK_NS_BATCH.  (The companion
experiment `exp_bf16_hist.py` showed bf16 fold operands are a no-op:
TPU DEFAULT matmul precision already feeds the MXU bf16.)

Usage: python tools/exp_bscale.py    (env: EXP_P overrides the grid)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from lightkurve_tpu.config import enable_persistent_compile_cache
enable_persistent_compile_cache()
from lightkurve_tpu.ops.bls import bls_power_shared_batch

N = 8192
P = int(os.environ.get("EXP_P", 4096))
dtype = jnp.float32
rng = np.random.default_rng(0)
t = np.arange(N) * (2.0 / 60 / 24)
periods = np.linspace(1.0, float(t[-1] / 3), P)
durations = np.array([0.05, 0.10, 0.15, 0.20, 0.25, 0.33])
time_d = jnp.asarray(t, dtype)
periods_d = jnp.asarray(periods, dtype)
durations_d = jnp.asarray(durations, dtype)


def run(B, chunk=8, reps=4):
    flux = 1.0 + 2e-4 * rng.standard_normal((B, N))
    flux_d = jnp.asarray(flux, dtype)
    dy_d = jnp.asarray(np.full((B, N), 2e-4), dtype)

    def step():
        o = bls_power_shared_batch(time_d, flux_d, dy_d, periods_d,
                                   durations_d, oversample=10, chunk=chunk,
                                   uniform_weights=True, bucket=True)
        return o["power"]

    float(jnp.sum(step()))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(jnp.sum(step()))
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"B={B:5d} chunk={chunk:3d}  {dt*1e3:8.1f} ms  "
          f"{B*P/dt/1e6:7.2f}M evals/s  "
          f"reps={[round(r, 3) for r in ts]}", flush=True)


if __name__ == "__main__":
    run(256)
    run(512)
    run(1024)
    run(2048)
    run(1024, chunk=4)
    run(2048, chunk=4)
    run(2048, chunk=2)
