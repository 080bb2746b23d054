"""Transit search over curves that do NOT share one time grid.

Real archive batches mix cadence grids — each TESS sector (or Kepler
quarter) has its own time stamps, and stitched multi-sector curves add
more.  The reference handles this trivially because it searches one star
at a time (astropy BLS per call,
``/root/reference/src/lightkurve/periodogram.py:1161-1169``); a batched
device kernel has to work for it: ``SweepRunner(method="shared")``
groups rows by identical time grid on the host, runs the shared
MXU-matmul kernel once per bucket (zero-padding each bucket to a lane
tile), and scatters the per-bucket winners back to input row order — so
a mixed-sector batch stays within ~2x of the single-grid rate instead
of falling ~2000x to the per-curve fallback (measured on the v5e:
10.76M vs 18.7M curve-period evals/s at B=2048 over 4 grids;
``docs/records/bench_2026-08-20_run1.json``, key
``bls_bucketed_hetero_evals_per_sec``).

    python examples/multi_sector_sweep.py

runs a small synthetic demo (4 epoch-shifted sector grids, injected
planet, recovery check) sized for any backend, including CPU.
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp                                        # noqa: E402

from lightkurve_tpu.batch import LightCurveStack               # noqa: E402
from lightkurve_tpu.parallel.checkpoint import SweepRunner     # noqa: E402


def main():
    B, N, P = 64, 1024, 4096
    rng = np.random.default_rng(42)
    base = np.arange(N) * (10.0 / 60 / 24)       # 10-min cadence, ~7.1 d
    p_true, t0_true, depth = 1.93, 0.4, 3e-3

    # four sectors: same cadence, different epoch (rows interleaved so
    # the bucketing really has to regroup them)
    times = np.empty((B, N), np.float64)
    for g in range(4):
        times[g::4] = base + 13.7 * g
    flux = 1.0 + 2e-4 * rng.standard_normal((B, N))
    ph = np.mod(times - t0_true + p_true / 2, p_true) - p_true / 2
    flux[np.abs(ph) < 0.05] -= depth

    stack = LightCurveStack(
        time=jnp.asarray(times, jnp.float32),
        flux=jnp.asarray(flux, jnp.float32),
        flux_err=jnp.full((B, N), 2e-4, jnp.float32),
        mask=jnp.ones((B, N), bool))

    periods = np.linspace(1.0, 2.4, P)
    durations = np.array([0.05, 0.10, 0.15])
    with tempfile.TemporaryDirectory() as td:
        runner = SweepRunner(stack, periods, durations,
                             os.path.join(td, "sweep.npz"),
                             chunk_periods=P, method="shared",
                             async_save=True)
        best = runner.run()                      # buckets by time grid

    rec = np.abs(best["period"] - p_true) / p_true < 0.01
    print(f"recovered {int(rec.sum())}/{B} "
          f"(median best period {np.median(best['period']):.4f}, "
          f"true {p_true})")
    assert rec.all(), "bucketed sweep failed to recover the injection"
    print("OK")


if __name__ == "__main__":
    main()
