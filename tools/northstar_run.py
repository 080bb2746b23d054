"""Run the north-star shape FOR REAL: 10^4 TESS-like curves x 10^5-period
BLS grid on the chip (BASELINE.json: "10^4 light curves over a
10^5-point period grid per minute on v5p-8").

Resumable: per-batch SweepRunner checkpoints under --state-dir plus a
batch-level manifest, so repeated invocations continue where the last
one stopped (the TPU tunnel can wedge; wrap in `timeout` and re-run).
Writes NORTHSTAR.json at the repo root when complete.

Usage:  python tools/northstar_run.py [--batches N] [--state-dir DIR]
"""
import argparse
import json
import os
import sys
import time as _time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

N_CURVES_TOTAL = 10_240          # 20 batches x 512 (>= 1e4)
BATCH = 512
N = 8192                         # TESS 2-min cadences (~11.4 d)
P_GRID = 100_000
CHUNK_PERIODS = 12_500           # one jit step per (batch, chunk); larger
                                 # chunks amortize per-dispatch overhead
                                 # (20 -> 8 dispatches/batch measured
                                 # ~0.8 s/batch of pure overhead at 5k)
DURATIONS = np.array([0.05, 0.10, 0.15, 0.20, 0.25, 0.33])


def make_batch(ib):
    """Deterministic synthetic batch ``ib``: planet per curve."""
    rng = np.random.default_rng(1000 + ib)
    t = np.arange(N) * (2.0 / 60 / 24)
    t = t + rng.uniform(0.001, 0.0012)   # off bin-boundary knife edge
    flux = 1.0 + 2e-4 * rng.standard_normal((BATCH, N))
    p_inj = rng.uniform(1.2, 3.5, BATCH)
    t0_inj = rng.uniform(0, p_inj)
    for i in range(BATCH):
        ph = np.mod(t - t0_inj[i] + p_inj[i] / 2, p_inj[i]) - p_inj[i] / 2
        flux[i, np.abs(ph) < 0.05] -= 3e-3
    return t, flux, p_inj


def _steady_state_fields(manifest):
    secs = [x for x in manifest.get("batch_seconds", []) if x and x > 0]
    if not secs:
        return {"batch_seconds_median": None,
                "steady_state_evals_per_sec_per_chip": None,
                "steady_state_vs_north_star": None}
    med = float(np.median(secs))
    rate = BATCH * P_GRID / med
    return {"batch_seconds_median": round(med, 2),
            "steady_state_evals_per_sec_per_chip": round(rate, 1),
            "steady_state_vs_north_star": round(
                rate / (1e4 * 1e5 / 60.0 / 8.0), 5)}


def hbm_stats():
    from lightkurve_tpu.diagnostics import hbm_stats as _hbm
    return _hbm()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=N_CURVES_TOTAL // BATCH)
    ap.add_argument("--state-dir", default="/root/northstar_state")
    ap.add_argument("--max-seconds", type=float, default=500.0,
                    help="stop cleanly after this much wall-clock")
    args = ap.parse_args()
    os.makedirs(args.state_dir, exist_ok=True)
    manifest_path = os.path.join(args.state_dir, "manifest.json")
    manifest = {"batches_done": 0, "wall_s": 0.0, "recovered": 0,
                "curves": 0, "batch_seconds": []}
    if os.path.exists(manifest_path):
        manifest = json.load(open(manifest_path))

    import jax
    from lightkurve_tpu.config import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp
    from lightkurve_tpu.batch import LightCurveStack
    from lightkurve_tpu.parallel.checkpoint import SweepRunner

    t0_all = _time.time()
    t_ref, _, _ = make_batch(0)
    baseline = t_ref[-1] - t_ref[0]
    periods = np.linspace(1.0, baseline / 3, P_GRID)
    print(f"grid: {P_GRID} periods in [1.0, {baseline/3:.3f}] d; "
          f"{args.batches} batches x {BATCH} curves x {N} cadences",
          flush=True)

    while manifest["batches_done"] < args.batches:
        if _time.time() - t0_all > args.max_seconds:
            print("max-seconds reached; resumable state saved", flush=True)
            break
        ib = manifest["batches_done"]
        t, flux, p_inj = make_batch(ib)
        dtype = jnp.float32
        stack = LightCurveStack(
            time=jnp.asarray(np.broadcast_to(t, flux.shape), dtype),
            flux=jnp.asarray(flux, dtype),
            flux_err=jnp.asarray(np.full(flux.shape, 2e-4), dtype),
            mask=jnp.ones(flux.shape, bool))
        ckpt = os.path.join(args.state_dir, f"batch{ib:03d}.npz")
        runner = SweepRunner(stack, periods, DURATIONS, ckpt,
                             chunk_periods=CHUNK_PERIODS, method="shared")
        resumed_mid_batch = runner.next_chunk > 0
        tb = _time.time()
        best = None
        while not runner.done:
            if _time.time() - t0_all > args.max_seconds:
                print(f"batch {ib}: paused at chunk {runner.next_chunk}/"
                      f"{runner.n_chunks}", flush=True)
                json.dump(manifest, open(manifest_path, "w"))
                return
            best = runner.run(max_chunks=4)
        dt_b = _time.time() - tb
        rec = np.abs(best["period"] - p_inj) / p_inj < 0.01
        # count period harmonics/aliases as recoveries too? No — strict.
        manifest["batches_done"] += 1
        manifest["wall_s"] += dt_b
        if not resumed_mid_batch:
            # resumed batches only time their REMAINING chunks; including
            # them would bias the steady-state median low
            manifest.setdefault("batch_seconds", []).append(round(dt_b, 2))
        manifest["recovered"] += int(rec.sum())
        manifest["curves"] += BATCH
        json.dump(manifest, open(manifest_path, "w"))
        rate = BATCH * P_GRID / dt_b
        print(f"batch {ib}: {dt_b:.1f}s  {rate:.3e} curve-period/s  "
              f"recovered {rec.sum()}/{BATCH}  hbm={hbm_stats()}",
              flush=True)

    if manifest["batches_done"] >= args.batches:
        wall = manifest["wall_s"]
        total_cp = manifest["curves"] * P_GRID
        result = {
            "curves": manifest["curves"],
            "period_grid": P_GRID,
            "cadences": N,
            "wall_clock_s": round(wall, 1),
            "curve_period_evals_per_sec_per_chip": round(total_cp / wall, 1),
            "vs_north_star_per_chip": round(
                (total_cp / wall) / (1e4 * 1e5 / 60.0 / 8.0), 5),
            "recovery_rate": round(manifest["recovered"]
                                   / manifest["curves"], 4),
            # wall-clock includes the one-time XLA compile and any remote
            # tunnel stalls; the steady-state median is the per-chip rate
            # once the program is resident (what a production sweep runs
            # at).  Only COMPLETE (non-resumed) batches contribute; a
            # pre-existing manifest without timings yields None fields.
            **_steady_state_fields(manifest),
            "hbm": hbm_stats(),
            "device": str(jax.devices()[0]),
            "note": ("measured end-to-end via SweepRunner (method="
                     "'shared', device-side winner reduction, per-chunk "
                     "host checkpointing); north-star = 1e4 curves x "
                     "1e5 periods per minute on 8 chips"),
        }
        out = os.path.join(ROOT, "NORTHSTAR.json")
        json.dump(result, open(out, "w"), indent=1)
        print(json.dumps(result), flush=True)
        print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
