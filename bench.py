"""End-of-round benchmark: BLS curve-period evaluations per second per chip.

Runs the flagship batched BLS transit search (the reference's hot loop:
astropy's Cython ``bls.power``, reference ``periodogram.py:1169``) on the
real TPU and prints ONE JSON line.

``vs_baseline`` is the fraction of the driver-defined north-star rate
(BASELINE.json: 10^4 TESS curves × 10^5-period grid per minute on a
v5p-8 → 2.083e6 curve-period evaluations/sec/chip).

Env overrides: LK_BENCH_B, LK_BENCH_N, LK_BENCH_P (batch, cadences,
periods).
"""
import json
import os
import signal
import sys
import time as _time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

NORTH_STAR_RATE = 1e4 * 1e5 / 60.0 / 8.0   # curve-period evals /s /chip
WATCHDOG_S = int(os.environ.get("LK_BENCH_TIMEOUT", 540))


_measured = None
_deadline = [None]   # wall-clock time after which the thread watchdog fires
_STATE_PATH = [None]


def _failure_line():
    # ``last_measured`` documents the most recent successful run of this
    # same benchmark (same code, same chip class) for context; the
    # metric value itself stays 0 because nothing was measured NOW.
    return json.dumps({
        "metric": "bls_curve_period_evals_per_sec_per_chip",
        "value": 0.0, "unit": "curve-period/s/chip", "vs_baseline": 0.0,
        "detail": {"error": f"watchdog timeout after {WATCHDOG_S}s "
                            "(device unreachable or compile hang; the "
                            "axon tunnel is known to wedge for 0.5-2h)",
                   "last_measured": {
                       "value": 13655461.6, "vs_baseline": 6.55462,
                       "date": "2026-08-20",
                       "device": "TPU v5 lite0",
                       "timing": "device_scalar_sync",
                       "config": {"B": 2048, "N": 8192, "P": 16384}}}})


def _watchdog(signum, frame):
    # The TPU tunnel can wedge (worker crash) and hang device calls
    # indefinitely — emit a well-formed failure line rather than hang.
    # If the PRIMARY metric was already measured (a companion benchmark
    # hung), report it instead of discarding a successful measurement.
    if _measured is not None:
        print(json.dumps(_measured))
        sys.stdout.flush()
        os._exit(0)
    print(_failure_line())
    sys.stdout.flush()
    os._exit(2)


def _write_state(**kw):
    if _STATE_PATH[0] is None:
        return
    tmp = _STATE_PATH[0] + ".tmp"
    with open(tmp, "w") as f:
        json.dump(kw, f)
    os.replace(tmp, _STATE_PATH[0])


def _thread_watchdog():
    """Backup watchdog on a daemon thread: SIGALRM handlers only run on
    the main thread between Python bytecodes, so a device RPC wedged
    inside a C call can block the signal path forever.  The thread wakes
    independently (the GIL is released during device calls), polls the
    shared deadline (which main() extends when the primary metric lands),
    and emits the failure/partial line if it passes."""
    import threading

    _deadline[0] = _time.time() + WATCHDOG_S + 10

    def poll():
        while True:
            _time.sleep(5)
            dl = _deadline[0]
            if dl is None:          # disarmed: bench finished
                return
            if _time.time() >= dl:
                _watchdog(None, None)

    t = threading.Thread(target=poll, daemon=True)
    t.start()


def _fork_watchdog():
    """Last-resort watchdog in a forked SUBPROCESS.

    Both the SIGALRM handler and the daemon thread need the parent
    interpreter to regain control — but a remote-compile RPC can hold
    the GIL for many minutes (observed: a 540 s thread watchdog never
    fired while XLA compiled for 9+ minutes through the tunnel).  A
    separate process shares the parent's stdout, polls a state file the
    parent updates, and on deadline prints the partial/failure line
    itself and SIGKILLs the parent."""
    _STATE_PATH[0] = f"/tmp/lk_bench_watchdog_{os.getpid()}.json"
    _write_state(deadline=_time.time() + WATCHDOG_S + 20, measured=None,
                 done=False)
    ppid = os.getpid()
    pid = os.fork()
    if pid:                                     # parent
        return
    while True:                                 # child
        _time.sleep(5)
        try:
            st = json.load(open(_STATE_PATH[0]))
        except Exception:
            st = {}
        if st.get("done"):
            os._exit(0)
        try:
            os.kill(ppid, 0)                    # parent still alive?
        except OSError:
            os._exit(0)
        dl = st.get("deadline")
        if dl and _time.time() >= dl:
            m = st.get("measured")
            print(json.dumps(m) if m else _failure_line())
            sys.stdout.flush()
            try:
                os.kill(ppid, signal.SIGKILL)
            except OSError:
                pass
            os._exit(2 if m is None else 0)


def _wait_for_device():
    """Bounded pre-flight: probe the device in a SUBPROCESS and wait for
    the tunnel to come back before arming the bench watchdogs.

    The axon tunnel is observed to wedge for 0.5–2 h; a bench launched
    into an outage would otherwise burn its whole watchdog budget on the
    first device call and report a 0-valued line.  A subprocess probe
    can't poison this process's TPU client, and an outage spent waiting
    here costs nothing (the watchdog starts after).  Bounded by
    LK_BENCH_TUNNEL_WAIT seconds (default 2400); CPU runs skip it.
    """
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    import subprocess
    budget = float(os.environ.get("LK_BENCH_TUNNEL_WAIT", 2400))
    t_end = _time.time() + budget
    probe = ("import jax, jax.numpy as jnp; "
             "print(float(jnp.arange(4.0).sum()))")
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", probe], timeout=120,
                               capture_output=True, text=True)
            if r.returncode == 0 and "6.0" in r.stdout:
                if attempt > 1:
                    print(f"# device probe ok after {attempt} attempts",
                          file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass
        if _time.time() >= t_end:
            print("# device probe still failing after "
                  f"{budget:.0f}s; proceeding (watchdog will bound the "
                  "run)", file=sys.stderr)
            return
        _time.sleep(60)


def main():
    _wait_for_device()   # before the watchdogs: outages don't eat budget
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(WATCHDOG_S)
    _fork_watchdog()     # fork FIRST: before any threads exist
    _thread_watchdog()
    import jax
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # the axon sitecustomize imports jax at interpreter start and
        # freezes JAX_PLATFORMS=axon; CPU smoke runs must override via
        # config (same recipe as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    from lightkurve_tpu.config import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp
    from lightkurve_tpu.ops.bls import bls_power_shared_batch

    # B-scaling on the v5e (2026-08-20, P=4096/chunk=8): 256→6.24M,
    # 512→8.10M, 1024→11.45M, 2048→12.80M evals/s — the one-hot fold
    # matrix is generated once per period chunk on the VPU and reused by
    # every batch row's MXU MACs, so larger B amortizes the generation
    # (bf16 fold operands were measured as a no-op: TPU DEFAULT matmul
    # precision already feeds the MXU bf16).  2048 is the measured
    # optimum: B=4096 regresses to 11.54M (see tools/exp_bscale.py).
    B = int(os.environ.get("LK_BENCH_B", 2048))
    N = int(os.environ.get("LK_BENCH_N", 8192))
    # dispatch-sized period slab; the north-star grid is 10^5 points, so a
    # large per-dispatch P is the realistic shape (SweepRunner chunks
    # likewise) and amortizes per-dispatch overhead (measured 3.88x at
    # P=4096 vs 4.20x at P=16384 on a v5e)
    P = int(os.environ.get("LK_BENCH_P", 16384))
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    t = np.arange(N) * (2.0 / 60 / 24)          # TESS 2-min cadence
    flux = 1.0 + 2e-4 * rng.standard_normal((B, N))
    # inject a transit inside the searched range [1, baseline/3]
    P_true = float(np.clip(3.3, 1.1, t[-1] / 3 * 0.9))
    ph = np.mod(t - 1.0 + P_true / 2, P_true) - P_true / 2
    flux[:, np.abs(ph) < 0.06] -= 3e-3
    periods = np.linspace(1.0, float(t[-1] / 3), P)
    durations = np.array([0.05, 0.10, 0.15, 0.20, 0.25, 0.33])

    time_d = jnp.asarray(t, dtype)
    flux_d = jnp.asarray(flux, dtype)
    dy_d = jnp.asarray(np.full((B, N), 2e-4), dtype)
    periods_d = jnp.asarray(periods, dtype)
    durations_d = jnp.asarray(durations, dtype)

    # shared-time batched kernel: the fold matrix is shared across the
    # batch, so the histogram is one fat MXU matmul per period chunk.
    # uniform_weights=True: dy is per-curve constant, which the wrapper
    # auto-detects on host arrays; the bench pre-stages dy on device for
    # timing purity, so the (host-side) detection result is passed
    # explicitly — exactly what SweepRunner does once per runner.
    def step(time, flux, dy):
        out = bls_power_shared_batch(time, flux, dy, periods_d,
                                     durations_d, oversample=10, chunk=8,
                                     uniform_weights=True, bucket=True)
        return out["power"], out["period"]

    # ---- tier 0: smallest honest measurement FIRST (VERDICT r4 item 1) --
    # The round-4 driver run produced a 0.0: the full-shape compile through
    # the tunnel outran the 540 s watchdog before anything was measured.
    # A small period slab (same B/N, P/8) compiles in a fraction of the
    # time (and loads from the persistent cache in seconds), so a REAL
    # measured rate lands in `_measured` within the first minutes; a later
    # watchdog fire then reports this number — honestly labeled with its
    # own config — instead of discarding the run.
    global _measured
    P0 = max(P // 8, 1024)
    p0_d = jnp.asarray(periods[:P0], dtype)

    def step0(time, flux, dy):
        out = bls_power_shared_batch(time, flux, dy, p0_d,
                                     durations_d, oversample=10, chunk=8,
                                     uniform_weights=True, bucket=True)
        return out["power"], out["period"]

    try:
        pw0, _ = step0(time_d, flux_d, dy_d)
        float(jnp.sum(pw0))
        reps0 = []
        for _ in range(3):
            t0 = _time.time()
            pw0, _ = step0(time_d, flux_d, dy_d)
            float(jnp.sum(pw0))
            reps0.append(_time.time() - t0)
        rate0 = B * P0 / min(reps0)
        _measured = {
            "metric": "bls_curve_period_evals_per_sec_per_chip",
            "value": round(rate0, 1), "unit": "curve-period/s/chip",
            "vs_baseline": round(rate0 / NORTH_STAR_RATE, 5),
            "detail": {"B": B, "N": N, "P": P0,
                       "tier": "tier0_small_slab",
                       "note": "fallback measurement; the full-shape "
                               "run did not complete before a watchdog",
                       "step_times_all_reps": [round(r, 3) for r in reps0],
                       "timing": "device_scalar_sync",
                       "device": str(jax.devices()[0])},
        }
        # a real number is now safe — grant the full-shape compile a
        # fresh full watchdog window (bounded: probe + 2x WATCHDOG total)
        signal.alarm(WATCHDOG_S)
        _deadline[0] = _time.time() + WATCHDOG_S + 10
        _write_state(deadline=_time.time() + WATCHDOG_S + 20,
                     measured=_measured, done=False)
    except Exception as exc:  # tier-0 failure must not kill the real run
        print(f"# tier-0 measurement failed: {exc}", file=sys.stderr)

    # warmup/compile (full shape)
    power, _ = step(time_d, flux_d, dy_d)
    float(jnp.sum(power))
    # Best-of-N: the tunnel adds stochastic multi-hundred-ms stalls that
    # grow over a run (measured 1.36 -> 3.18 s/step across 5 back-to-back
    # reps on an otherwise idle chip); the minimum is the reproducible
    # on-chip rate, and all reps are published alongside for honesty.
    # Each rep syncs via a device-side scalar reduction pulled to host
    # (float(jnp.sum(...))): through the remote tunnel,
    # block_until_ready() is observed to return immediately on occasion
    # (a lying sync), while np.asarray of the full (B, P) power matrix
    # would measure the ~30 MB/s tunnel (~1.2 s) instead of the chip.
    # The production SweepRunner likewise pulls only O(B) winner scalars
    # after a device-side reduction.
    reps = []
    for _ in range(5):
        t0 = _time.time()
        power, periods_out = step(time_d, flux_d, dy_d)
        float(jnp.sum(power))
        reps.append(_time.time() - t0)
    dt = min(reps)

    # sanity: recover the injected planet
    ib = int(np.argmax(np.asarray(power)[0]))
    rec = periods[ib]
    ok = abs(rec - P_true) / P_true < 0.05

    rate = B * P / dt
    # timing: 'block_until_ready' since r3 (values before 2026-08-18 used
    # np.asarray, which added ~1.2 s of host transfer per step — see the
    # methodology note in docs/performance.md before comparing rounds)
    detail = {"B": B, "N": N, "P": P, "seconds_per_step": round(dt, 3),
              "step_times_all_reps": [round(r, 3) for r in reps],
              "timing": "device_scalar_sync",
              "recovered_period_ok": bool(ok),
              "device": str(jax.devices()[0])}
    try:
        from lightkurve_tpu.diagnostics import hbm_stats
        detail["hbm"] = hbm_stats()
    except Exception:
        pass

    # analytic roofline for the primary kernel (lightkurve_tpu.roofline):
    # mfu = analytic FLOPs / (dt x published bf16 peak), membw_frac =
    # minimum HBM bytes / (dt x published HBM bandwidth)
    def _roof(name, cost, seconds):
        try:
            from lightkurve_tpu.roofline import fractions_of_peak
            fr = fractions_of_peak(cost, seconds, jax.devices()[0])
            detail[f"{name}_mfu"] = fr["mfu"]
            detail[f"{name}_membw_frac"] = fr["membw_frac"]
            detail[f"{name}_flops"] = float(f"{fr['flops']:.3e}")
        except Exception as exc:     # pragma: no cover
            detail[f"{name}_roofline_error"] = str(exc)[:80]

    try:
        from lightkurve_tpu.roofline import bls_shared_uniform_cost
        _roof("bls", bls_shared_uniform_cost(N, B, periods, durations,
                                             oversample=10, bucket=True),
              dt)
    except Exception as exc:         # pragma: no cover
        detail["bls_roofline_error"] = str(exc)[:80]

    # the primary metric is measured: if a companion bench hangs/compiles
    # past the watchdog, report THIS result instead of a 0-valued timeout
    # line, and give the companions a fresh (shorter) alarm window
    # share the LIVE detail dict: companions that complete before a later
    # one hangs still appear in the watchdog's partial line
    detail["companion_error"] = ("watchdog fired during companion "
                                 "benchmarks")
    _measured = {
        "metric": "bls_curve_period_evals_per_sec_per_chip",
        "value": round(rate, 1), "unit": "curve-period/s/chip",
        "vs_baseline": round(rate / NORTH_STAR_RATE, 5),
        "detail": detail,
    }
    extra = max(WATCHDOG_S // 2, 120)
    signal.alarm(extra)
    _deadline[0] = _time.time() + extra + 10
    _write_state(deadline=_time.time() + extra + 20, measured=_measured,
                 done=False)

    # total companion budget: per-companion watchdog refreshes would
    # otherwise let worst-case wall time grow to WATCHDOG_S + 7·extra
    # (~30 extra minutes), risking an outer-harness SIGKILL before the
    # measured primary line prints.  Once the cumulative companion time
    # passes 2·WATCHDOG_S, the remaining companions are skipped.
    companion_t_end = _time.time() + 2 * WATCHDOG_S

    def _companion_checkpoint():
        # refresh ALL watchdogs between companions: each companion gets a
        # fresh `extra`-second window (the primary metric is already safe
        # in _measured), so one slow remote compile can't starve the
        # companions behind it — bounded by the total budget above
        signal.alarm(extra)
        _deadline[0] = _time.time() + extra + 10
        _write_state(deadline=_time.time() + extra + 20,
                     measured=_measured, done=False)
        if _time.time() >= companion_t_end:
            detail["companions_skipped"] = (
                "total companion budget (2x watchdog) exhausted")
            return False
        return True

    # companion kernel rates (best-effort; failures never break the
    # primary metric).  Each companion is a closure run by the loop at
    # the bottom: the loop refreshes the watchdogs between companions
    # and stops once the total companion budget is exhausted.
    def _c_flatten():
        from lightkurve_tpu.ops.detrend import flatten_batch
        from lightkurve_tpu.ops.savgol import savgol_design_matrix
        from lightkurve_tpu.roofline import flatten_cost
        H = jnp.asarray(savgol_design_matrix(101, 2), dtype)
        tt = jnp.broadcast_to(time_d, (B, N))
        m = jnp.ones((B, N), bool)
        tr, _ = flatten_batch(tt, flux_d, m, H, jnp.asarray(5.0, dtype),
                              jnp.asarray(3.0, dtype), niters=3)
        float(jnp.sum(tr))     # scalar pull: asarray of (B, N) times the
                               # ~0.4 GB/s tunnel, not the kernel
        # best-of-2 timed loops: a single tunnel stall inside one loop
        # otherwise pollutes the whole reading (r5: a ~13 s stall read
        # as 434 curves/s where isolation measures 5,142)
        dts = []
        for _ in range(2):
            t0 = _time.time()
            for _ in range(3):
                tr, _ = flatten_batch(tt, flux_d, m, H,
                                      jnp.asarray(5.0, dtype),
                                      jnp.asarray(3.0, dtype), niters=3)
            float(jnp.sum(tr))
            dts.append((_time.time() - t0) / 3)
        dt_fl = min(dts)
        detail["flatten_curves_per_sec"] = round(B / dt_fl, 1)
        _roof("flatten", flatten_cost(N, B, 101, niters=3), dt_fl)

    def _c_photometry_pld():
        # BASELINE config 5: aperture photometry + batched PLD over 10^3
        # targets (reference hot loop targetpixelfile.py:868-932 +
        # pldcorrector.py:125-287), all on device
        from lightkurve_tpu.batch import TPFStack
        from lightkurve_tpu.roofline import pld_photometry_cost
        Bt, Tt, Hh, Ww = 1000, 1000, 6, 6
        key = jax.random.PRNGKey(0)
        cube = 1.0 + 0.01 * jax.random.normal(key, (Bt, Tt, Hh, Ww),
                                              dtype)
        trend = 1.0 + 0.02 * jnp.sin(jnp.arange(Tt, dtype=dtype) * 0.06)
        cube = cube.at[:, :, 2:4, 2:4].add(
            50.0 * trend[None, :, None, None])
        ap = jnp.zeros((Bt, Hh, Ww), bool).at[:, 2:4, 2:4].set(True)
        tstack = TPFStack(
            flux=cube, flux_err=jnp.full(cube.shape, 0.01, dtype),
            time=jnp.broadcast_to(jnp.arange(Tt, dtype=dtype) * 0.02,
                                  (Bt, Tt)), aperture=ap)

        def phot_pld():
            out = tstack.pld_correct(n_pca_terms=3)
            return out.flux

        phot_pld().block_until_ready()
        t0 = _time.time()
        f_out = phot_pld()
        float(jnp.sum(f_out))
        dt_pld = _time.time() - t0
        detail["photometry_pld_targets_per_sec"] = round(Bt / dt_pld, 1)
        _roof("photometry_pld", pld_photometry_cost(Bt, Tt, Hh, Ww, 3),
              dt_pld)

    def _c_prf():
        # Batched MAP PRF photometry: B=10^3 cadence-fits of a two-star
        # scene in one vmapped LM loop (replaces the reference's
        # multiprocessing pool, prf/tpfmodel.py:738-795)
        from lightkurve_tpu.prf import PRFPhotometry, TPFModel
        from lightkurve_tpu.prf.prfmodel import GaussianPRF
        from lightkurve_tpu.prf.tpfmodel import (StarPrior, GaussianPrior,
                                                 UniformPrior,
                                                 BackgroundPrior)
        prf = GaussianPRF(shape=(9, 9), column=0, row=0)
        stars = [StarPrior(col=GaussianPrior(2.8, 0.5),
                           row=GaussianPrior(3.1, 0.5),
                           flux=UniformPrior(0.0, 2e4)),
                 StarPrior(col=GaussianPrior(6.2, 0.5),
                           row=GaussianPrior(5.9, 0.5),
                           flux=UniformPrior(0.0, 2e4))]
        model = TPFModel(star_priors=stars, prfmodel=prf,
                         background_prior=BackgroundPrior(
                             flux=UniformPrior(0.0, 100.0)))
        truth = np.array([2.83, 3.12, 5000.0, 6.17, 5.88, 3000.0, 40.0])
        img = model.predict(truth)
        Bc = 1000
        cubes = img[None] + 2.0 * np.asarray(
            jax.random.normal(jax.random.PRNGKey(1), (Bc,) + img.shape))
        phot = PRFPhotometry(model)
        phot.run(cubes, n_iter=20)              # full-shape compile
        t0 = _time.time()
        fitted = phot.run(cubes, n_iter=20)
        np.asarray(fitted)
        dt_prf = _time.time() - t0
        detail["prf_fit_targets_per_sec"] = round(Bc / dt_prf, 1)
        med = np.median(fitted, axis=0)
        detail["prf_two_star_flux_ok"] = bool(
            abs(med[2] - truth[2]) / truth[2] < 0.05
            and abs(med[5] - truth[5]) / truth[5] < 0.05)

    def _c_ls():
        from lightkurve_tpu.ops.lombscargle import lombscargle_fast
        from lightkurve_tpu.roofline import ls_fast_cost
        Nf = 16384
        f0, df_ = 0.05, 60.0 / Nf / float(t[-1] - t[0] + 1)
        pw = lombscargle_fast(t, flux_d, f0, df_, Nf, dy=dy_d)
        float(jnp.sum(pw))
        dts = []
        for _ in range(2):                    # best-of-2: stall immunity
            t0 = _time.time()
            for _ in range(3):
                pw = lombscargle_fast(t, flux_d, f0, df_, Nf, dy=dy_d)
            float(jnp.sum(pw))
            dts.append((_time.time() - t0) / 3)
        dt_ls = min(dts)
        detail["ls_freq_evals_per_sec"] = round(B * Nf / dt_ls, 1)
        _roof("ls", ls_fast_cost(N, B, Nf), dt_ls)

    def _c_seismo_acf():
        # seismology 2D-ACF: the reference loops np.correlate over ~300
        # window centers per star (numax_estimators.py:175-182); here one
        # vmapped batched-FFT autocorrelation covers a whole target batch
        from lightkurve_tpu.ops.acf import autocorrelate_windows
        from lightkurve_tpu.roofline import acf_windows_cost
        Bs, m, c, win = 64, 50_000, 256, 2048
        rng2 = np.random.default_rng(7)
        spectra = jnp.asarray(
            rng2.standard_normal((Bs, m)).astype(np.float32) ** 2)
        starts = jnp.asarray(
            np.linspace(0, m - win, c).astype(np.int32))
        run_acf = jax.jit(jax.vmap(
            lambda p: autocorrelate_windows(p, starts, win)[0]))
        acf = run_acf(spectra)
        float(jnp.sum(acf))
        dts = []
        for _ in range(2):                    # best-of-2: stall immunity
            t0 = _time.time()
            for _ in range(3):
                acf = run_acf(spectra)
            float(jnp.sum(acf))
            dts.append((_time.time() - t0) / 3)
        dt_acf = min(dts)
        detail["seismo_acf_windows_per_sec"] = round(Bs * c / dt_acf, 1)
        _roof("seismo_acf", acf_windows_cost(Bs, c, win), dt_acf)

    def _c_bls_cliff():
        # the fused-kernel cliff (VERDICT r3 weak #6): the same shape run
        # through (a) the uniform count-histogram path the primary metric
        # uses, (b) the general weighted kernel (per-sample weights —
        # 2x the fold FLOPs, Pallas window scan), and (c) a ragged batch
        # (B not a multiple of 128), which the kernel now pads with
        # zero-weight rows to stay on the fused window path.  P is
        # reduced 4x to keep the companion cheap; rates scale linearly.
        Pc = max(P // 4, 1024)
        pc_d = jnp.asarray(periods[:Pc], dtype)
        dy_var = jnp.asarray(
            np.full((B, N), 2e-4) * (1.0 + 0.1 * rng.random((B, N))),
            dtype)

        def run_case(name, Yc, dyc, uniform):
            def stepc():
                o = bls_power_shared_batch(
                    time_d, Yc, dyc, pc_d, durations_d, oversample=10,
                    chunk=8, uniform_weights=uniform,
                    bucket=bool(uniform))
                return o["power"]
            float(jnp.sum(stepc()))
            t0 = _time.time()
            float(jnp.sum(stepc()))
            dt_c = _time.time() - t0
            detail[f"bls_{name}_evals_per_sec"] = round(
                Yc.shape[0] * Pc / dt_c, 1)
            return dt_c

        dt_u = run_case("uniform", flux_d, dy_d, True)
        dt_g = run_case("weighted_fallback", flux_d, dy_var, False)
        detail["bls_weighted_fallback_slowdown"] = round(dt_g / dt_u, 2)
        # ragged batch: 500 rows (not %128); auto-padded to 512 inside
        dt_r = run_case("ragged_b500", flux_d[:500], dy_var[:500], False)
        detail["bls_ragged_slowdown_vs_uniform"] = round(
            (dt_r / 500) / (dt_u / B), 2)

    def _c_bls_bucketed():
        # heterogeneous-grid BLS (VERDICT r4 item 4): the same B=512
        # batch split across 4 distinct time grids (multi-sector case),
        # swept through SweepRunner's bucketed shared path.  The rate
        # must be within an order of magnitude of the shared kernel's.
        import tempfile

        from lightkurve_tpu.batch import LightCurveStack
        from lightkurve_tpu.parallel.checkpoint import SweepRunner
        Pb = max(P // 4, 1024)
        t_np = np.asarray(t)
        times = np.empty((B, N), np.float32)
        for g in range(4):
            times[g::4] = t_np + g * 13.7       # 4 epoch-shifted sectors
        stack = LightCurveStack(
            time=jnp.asarray(times, dtype), flux=flux_d,
            flux_err=dy_d, mask=jnp.ones((B, N), bool))
        with tempfile.TemporaryDirectory() as td:
            runner = SweepRunner(stack, periods[:Pb], durations,
                                 os.path.join(td, "b.npz"),
                                 chunk_periods=Pb, oversample=10,
                                 method="shared")
            runner.run()                        # compile + first sweep
            runner.next_chunk = 0               # re-run the same chunk
            t0 = _time.time()
            runner.run()
            dt_b = _time.time() - t0
        detail["bls_bucketed_hetero_evals_per_sec"] = round(
            B * Pb / dt_b, 1)
        if "bls_uniform_evals_per_sec" in detail:
            detail["bls_bucketed_slowdown_vs_uniform"] = round(
                detail["bls_uniform_evals_per_sec"]
                / (B * Pb / dt_b), 2)

    def _c_fastchi2():
        # fastchi2 vs direct chi2 (nterms=3) — the reference dispatches
        # nterms>1 to astropy's FFT-accelerated fastchi2
        # (periodogram.py:930-958); ours must beat the direct
        # normal-equation solve by >=100x per frequency at Nf=1e5
        from lightkurve_tpu.ops.lombscargle import (lombscargle_chi2,
                                                    lombscargle_fastchi2)
        from lightkurve_tpu.roofline import fastchi2_cost
        Nf_fast, Nf_direct = 100_000, 2048
        f0 = 0.05
        df_ = 2.0 / float(t[-1] - t[0]) / 50.0   # ~50x oversampled grid
        y1 = flux_d[0]
        pw = lombscargle_fastchi2(t, y1, f0, df_, Nf_fast, nterms=3)
        float(jnp.sum(pw))
        K = 8      # amortized back-to-back dispatches, one scalar sync
        dts = []
        for _ in range(2):                    # best-of-2: stall immunity
            t0 = _time.time()
            for _ in range(K):
                pw = lombscargle_fastchi2(t, y1, f0, df_, Nf_fast,
                                          nterms=3)
            float(jnp.sum(pw))
            dts.append((_time.time() - t0) / K)
        dt_fast = min(dts)
        freqs_d = jnp.asarray(f0 + df_ * np.arange(Nf_direct), dtype)
        pw2 = lombscargle_chi2(jnp.asarray(t, dtype), y1, freqs_d, nterms=3)
        float(jnp.sum(pw2))
        t0 = _time.time()
        for _ in range(3):
            pw2 = lombscargle_chi2(jnp.asarray(t, dtype), y1, freqs_d,
                                   nterms=3)
        float(jnp.sum(pw2))
        dt_direct = (_time.time() - t0) / 3
        detail["fastchi2_freq_evals_per_sec"] = round(Nf_fast / dt_fast, 1)
        detail["fastchi2_speedup_vs_chi2_per_freq"] = round(
            (dt_direct / Nf_direct) / (dt_fast / Nf_fast), 1)
        _roof("fastchi2", fastchi2_cost(N, 1, Nf_fast, 3), dt_fast)

    for name, fn in [("flatten", _c_flatten),
                     ("photometry_pld", _c_photometry_pld),
                     ("prf", _c_prf),
                     ("ls", _c_ls),
                     ("seismo_acf", _c_seismo_acf),
                     ("bls_cliff", _c_bls_cliff),
                     ("bls_bucketed", _c_bls_bucketed),
                     ("fastchi2", _c_fastchi2)]:
        if not _companion_checkpoint():
            break
        try:
            fn()
        except Exception as exc:   # pragma: no cover
            detail[f"{name}_error"] = str(exc)[:120]

    detail.pop("companion_error", None)   # all companions done
    _deadline[0] = None      # disarm the thread watchdog
    signal.alarm(0)
    _write_state(done=True)  # disarm the fork watchdog
    print(json.dumps({
        "metric": "bls_curve_period_evals_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "curve-period/s/chip",
        "vs_baseline": round(rate / NORTH_STAR_RATE, 5),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
