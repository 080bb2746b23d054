"""On-hardware numerics smoke test — run after any kernel change.

The pytest suite forces the CPU backend (fast, float64 oracles), so it
CANNOT catch TPU-only numerics bugs — e.g. the MXU's bf16 input
truncation under DEFAULT matmul precision, which silently destroyed
~1e-3 signals in every histogram/trig matmul while all CPU tests stayed
green (fixed in ops/bls.py by mean-shifting and elsewhere with
precision=HIGHEST; see docs/api.md "TPU numerics").

This script drives each device-kernel family end-to-end on the default
backend and checks MAGNITUDES, not just argmax positions:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_smoke.py

Exit code 0 = all checks pass.  Each check prints one line.
"""
import os
import sys
import time

import numpy as np

FAIL = 0


def check(name, ok, detail=""):
    global FAIL
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    if not ok:
        FAIL += 1


def main():
    import jax
    import jax.numpy as jnp
    print(f"backend: {jax.default_backend()}  {jax.devices()[0]}")

    rng = np.random.default_rng(3)

    # --- shared-batch BLS: power magnitude vs CPU-derived expectation ---
    from lightkurve_tpu.ops.bls import bls_power_shared_batch
    n = 400
    t = np.arange(n) * 0.002
    f = 1.0 + 1e-3 * np.sin(2 * np.pi * t / 0.11) \
        + 2e-4 * rng.standard_normal(n)
    periods = np.linspace(0.08, 0.2, 64)
    out = bls_power_shared_batch(
        jnp.asarray(t, jnp.float32), jnp.asarray(f[None], jnp.float32),
        jnp.asarray(np.full((1, n), 2e-4), jnp.float32),
        jnp.asarray(periods, jnp.float32),
        jnp.asarray([0.01, 0.02], jnp.float32))
    pw = np.asarray(out["power"])[0]
    i = int(np.argmax(pw))
    # CPU float32 reference value for this exact configuration: 1.297e3
    check("bls.period", abs(periods[i] - 0.1105) < 1e-3,
          f"best={periods[i]:.4f}")
    check("bls.magnitude", 1.1e3 < pw[i] < 1.5e3,
          f"power={pw[i]:.3e} (expect ~1.30e3; bf16-input bug gives ~2)")

    # --- fast LS: peak frequency + standard-normalization scale ---
    from lightkurve_tpu.ops.lombscargle import lombscargle_fast
    N2 = 2048
    t2 = np.arange(N2) * 0.01
    y2 = 1.0 + 5e-4 * np.sin(2 * np.pi * t2 / 1.7) \
        + 1e-4 * rng.standard_normal(N2)
    p = np.asarray(lombscargle_fast(
        t2, jnp.asarray(y2[None], jnp.float32), 0.05, 0.005, 512,
        dy=jnp.asarray(np.full((1, N2), 1e-4), jnp.float32)))[0]
    ib = int(np.argmax(p))
    check("ls.freq", abs(0.05 + 0.005 * ib - 1 / 1.7) < 0.006,
          f"f={0.05 + 0.005 * ib:.4f}")
    check("ls.scale", 0.8 < p[ib] <= 1.0 + 1e-6, f"peak={p[ib]:.4f}")

    # --- flatten + CDPP ---
    import lightkurve_tpu as lk
    n3 = 3000
    t3 = np.arange(n3) * 0.0007
    f3 = (1.0 + 3e-3 * np.sin(2 * np.pi * t3 / 1.3)
          + 1e-4 * rng.standard_normal(n3))
    lc = lk.LightCurve(time=t3, flux=f3, flux_err=np.full(n3, 1e-4))
    cdpp = float(lc.flatten().estimate_cdpp().value)
    check("flatten.cdpp", 0 < cdpp < 300, f"cdpp={cdpp:.0f} ppm")

    # --- regression corrector: removes systematics to the noise floor ---
    from lightkurve_tpu.correctors import DesignMatrix, RegressionCorrector
    f4 = 1.0 + 5e-3 * np.sin(2 * np.pi * t3 / 0.9) \
        + 2e-4 * rng.standard_normal(n3)
    lc4 = lk.LightCurve(time=t3, flux=f4, flux_err=np.full(n3, 2e-4))
    dm = DesignMatrix({"s": np.sin(2 * np.pi * t3 / 0.9)},
                      name="sys").append_constant()
    resid = float(np.std(np.asarray(
        RegressionCorrector(lc4).correct(dm).flux.value) - 1.0))
    check("corrector.solve", resid < 4e-4, f"residual={resid:.2e}")

    # --- pixel layer ---
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
    from synthetic import make_synthetic_tpf
    tpf = make_synthetic_tpf(n_cadences=32, seed=1)
    lc5 = tpf.to_lightcurve(aperture_mask="threshold")
    check("photometry", np.isfinite(np.asarray(lc5.flux.value)).all(),
          f"n={len(lc5)}")

    print(f"\n{'ALL PASS' if FAIL == 0 else f'{FAIL} FAILURES'}")
    return 1 if FAIL else 0


if __name__ == "__main__":
    t0 = time.time()
    code = main()
    print(f"({time.time() - t0:.0f}s)")
    raise SystemExit(code)
