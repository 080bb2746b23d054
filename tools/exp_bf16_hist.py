"""Measure + validate hist_dtype='bfloat16' for the uniform BLS path.

The uniform shared-time kernel is HBM-bound on the materialized fold
one-hot: per period chunk the (C, 128, n) one-hot tiles are written and
re-read by the histogram matmul (~262 MB/chunk at the bench shape) while
the matmul itself needs only ~0.17 ms of MXU at bf16 rate.  Since TPU
DEFAULT f32 matmul precision rounds inputs to bf16 in the MXU anyway,
casting the one-hot (0/1 — exact in bf16) and the mean-shifted flux to
bf16 changes only their HBM representation, not the arithmetic — the
accumulator stays f32.

This script measures both variants at the bench shape on the real chip
and reports the numerical deltas (power, recovered period, depth) so the
default can be flipped on evidence.  Run from the repo root:

    python tools/exp_bf16_hist.py            # bench shape
    LK_EXP_P=4096 python tools/exp_bf16_hist.py
"""
import os
import sys
import time as _time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightkurve_tpu.ops.bls import bls_power_shared_batch


def main():
    B = int(os.environ.get("LK_EXP_B", 512))
    N = int(os.environ.get("LK_EXP_N", 8192))
    P = int(os.environ.get("LK_EXP_P", 16384))

    rng = np.random.default_rng(0)
    t = np.arange(N) * (2.0 / 60 / 24)
    flux = 1.0 + 2e-4 * rng.standard_normal((B, N))
    P_true = 3.3
    ph = np.mod(t - 1.0 + P_true / 2, P_true) - P_true / 2
    flux[:, np.abs(ph) < 0.06] -= 3e-3
    periods = np.linspace(1.0, float(t[-1] / 3), P)
    durations = np.array([0.05, 0.10, 0.15, 0.20, 0.25, 0.33])

    time_d = jnp.asarray(t, jnp.float32)
    flux_d = jnp.asarray(flux, jnp.float32)
    dy_d = jnp.asarray(np.full((B, N), 2e-4), jnp.float32)
    periods_d = jnp.asarray(periods, jnp.float32)
    durations_d = jnp.asarray(durations, jnp.float32)

    def run(hd):
        def step():
            return bls_power_shared_batch(
                time_d, flux_d, dy_d, periods_d, durations_d,
                oversample=10, chunk=8, uniform_weights=True, bucket=True,
                hist_dtype=hd)
        out = step()
        p0 = np.asarray(out["power"])
        d0 = np.asarray(out["depth"])
        t0 = _time.time()
        for _ in range(3):
            out = step()
        np.asarray(out["power"])
        dt = (_time.time() - t0) / 3
        rec = periods[np.argmax(p0, axis=1)]
        return dt, p0, d0, rec

    dt32, p32, d32, rec32 = run(None)
    dtbf, pbf, dbf, recbf = run("bfloat16")

    rate32, ratebf = B * P / dt32, B * P / dtbf
    print(f"f32 : {dt32*1e3:8.1f} ms/step  {rate32/1e6:6.2f}M cp/s")
    print(f"bf16: {dtbf*1e3:8.1f} ms/step  {ratebf/1e6:6.2f}M cp/s "
          f"({ratebf/rate32:.2f}x)")

    rec_ok32 = np.abs(rec32 - P_true) / P_true < 0.01
    rec_okbf = np.abs(recbf - P_true) / P_true < 0.01
    print(f"recovery: f32 {rec_ok32.mean()*100:.1f}%  "
          f"bf16 {rec_okbf.mean()*100:.1f}%")
    same_winner = (np.argmax(p32, axis=1) == np.argmax(pbf, axis=1)).mean()
    print(f"same winning period: {same_winner*100:.1f}%")

    # depth error at each curve's f32 winner
    win = np.argmax(p32, axis=1)
    dw32 = d32[np.arange(B), win]
    dwbf = dbf[np.arange(B), win]
    rel_depth = np.abs(dwbf - dw32) / np.abs(dw32)
    print(f"winner depth rel err: median {np.median(rel_depth):.2e} "
          f"p99 {np.percentile(rel_depth, 99):.2e}")
    relp = np.abs(pbf - p32) / np.maximum(np.abs(p32), 1e-12)
    print(f"power rel err: median {np.median(relp):.2e} "
          f"p99 {np.percentile(relp, 99):.2e} max {relp.max():.2e}")


if __name__ == "__main__":
    main()
