"""Parity tests: JAX BLS kernel vs numpy brute-force oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from lightkurve_tpu.ops.bls import bls_power, bls_objective_single
from oracles import bls_slow, bls_point


def _transit_data(rng, n=800, baseline=20.0, period=3.1, duration=0.2,
                  depth=0.01, t0=1.3):
    t = np.sort(rng.uniform(0, baseline, n))
    y = 1.0 + 0.001 * rng.normal(size=n)
    hp = period / 2
    y[np.abs(np.mod(t - t0 + hp, period) - hp) < duration / 2] -= depth
    dy = np.full(n, 0.001)
    return t, y, dy


@pytest.mark.parametrize("objective", ["likelihood", "snr"])
def test_bls_matches_bruteforce(rng, objective):
    t, y, dy = _transit_data(rng)
    periods = np.linspace(2.8, 3.4, 25)
    durations = np.array([0.1, 0.2])
    oversample = 5
    got = {k: np.asarray(v) for k, v in bls_power(
        jnp.asarray(t), jnp.asarray(y), jnp.asarray(dy),
        jnp.asarray(periods), jnp.asarray(durations),
        oversample=oversample, objective=objective).items()}
    w = 1.0 / dy ** 2
    d_phase = durations.min() / oversample
    want = bls_slow(t, y, w, periods, durations, d_phase,
                    use_likelihood=objective == "likelihood")
    np.testing.assert_allclose(got["power"], want["power"], rtol=1e-8)
    np.testing.assert_allclose(got["depth"], want["depth"], rtol=1e-8)
    np.testing.assert_allclose(got["transit_time"], want["transit_time"],
                               rtol=1e-10)
    np.testing.assert_allclose(got["duration"], want["duration"], rtol=1e-12)


def test_bls_recovers_injection(rng):
    t, y, dy = _transit_data(rng, n=3000, period=3.1, depth=0.01)
    periods = np.linspace(2.0, 5.0, 800)
    durations = np.array([0.1, 0.2, 0.3])
    out = bls_power(jnp.asarray(t), jnp.asarray(y), jnp.asarray(dy),
                    jnp.asarray(periods), jnp.asarray(durations))
    ib = int(np.argmax(np.asarray(out["power"])))
    # reference accuracy bar: period within 5% (test_synthetic_data.py:99-116)
    assert abs(periods[ib] - 3.1) / 3.1 < 0.05
    assert 0.005 < float(out["depth"][ib]) < 0.02


def test_bls_uniform_weights(rng):
    t, y, _ = _transit_data(rng, n=500)
    periods = np.linspace(2.9, 3.3, 10)
    durations = np.array([0.2])
    out = bls_power(jnp.asarray(t), jnp.asarray(y), None,
                    jnp.asarray(periods), jnp.asarray(durations))
    want = bls_slow(t, y, np.ones_like(y), periods, durations,
                    durations.min() / 10)
    np.testing.assert_allclose(np.asarray(out["power"]), want["power"],
                               rtol=1e-8)


def test_bls_objective_single(rng):
    t, y, dy = _transit_data(rng, n=600)
    w = 1.0 / dy ** 2
    got = bls_objective_single(jnp.asarray(t), jnp.asarray(y),
                               jnp.asarray(dy), 3.1, 0.2, 1.3)
    want = bls_point(t, y, w, 3.1, 0.2, 1.3)
    assert np.isclose(float(got["depth"]), want["depth"], rtol=1e-10)
    assert np.isclose(float(got["log_likelihood"]), want["loglike"],
                      rtol=1e-10)


def test_binned_bls_approximates_exact(rng):
    from lightkurve_tpu.ops.bls import bls_power_binned
    t, y, dy = _transit_data(rng, n=1500)
    periods = np.linspace(2.8, 3.4, 60)
    durations = np.array([0.1, 0.2])
    exact = bls_power(jnp.asarray(t), jnp.asarray(y), jnp.asarray(dy),
                      jnp.asarray(periods), jnp.asarray(durations))
    binned = bls_power_binned(jnp.asarray(t), jnp.asarray(y),
                              jnp.asarray(dy), jnp.asarray(periods),
                              jnp.asarray(durations))
    pe = np.asarray(exact["power"])
    pb = np.asarray(binned["power"])
    assert np.argmax(pe) == np.argmax(pb)
    assert np.max(np.abs(pe - pb)) / pe.max() < 0.01
    # same best-fit parameters at the peak
    i = np.argmax(pe)
    assert abs(float(binned["depth"][i]) - float(exact["depth"][i])) < 1e-3
    assert abs(float(binned["transit_time"][i])
               - float(exact["transit_time"][i])) < 0.05


def test_detect_uniform_weights():
    from lightkurve_tpu.ops.bls import _detect_uniform_weights as det
    B, N = 3, 40
    assert det(None)
    assert det(np.full((B, N), 1e-3))                      # shared constant
    assert det(np.tile(np.array([[1e-3], [2e-3], [5e-4]]), (1, N)))
    # inf rows (batch padding) keep per-row constancy with weight 0
    dy = np.full((B, N), 1e-3)
    dy[-1] = np.inf
    assert det(dy)
    rng = np.random.default_rng(0)
    assert not det(rng.uniform(1e-4, 1e-3, (B, N)))        # heteroscedastic
    dy = np.full((B, N), 1e-3)
    dy[0, 5] = np.inf                                      # masked cadence
    assert not det(dy)
    assert not det(np.full(N, 1e-3))                       # wrong ndim
    import jax.numpy as jnp_
    assert not det(jnp_.full((B, N), 1e-3))                # device arrays
    assert not det(-np.full((B, N), 1e-3))                 # non-positive


@pytest.mark.parametrize("dy_case", ["none", "percurve"])
def test_uniform_path_matches_general(rng, dy_case):
    """Count-histogram kernel ≡ general weighted kernel for per-curve
    constant weights (both window impls), 1e-9 in float64."""
    from lightkurve_tpu.ops.bls import bls_power_shared_batch
    B, n = 3, 700
    t = np.sort(rng.uniform(0, 15, n))
    Y = 1.0 + 5e-4 * rng.normal(size=(B, n))
    ph = np.mod(t - 2.0 + 2.77 / 2, 2.77) - 2.77 / 2
    Y[:, np.abs(ph) < 0.08] -= 4e-3
    dy = (None if dy_case == "none"
          else np.tile(rng.uniform(4e-4, 9e-4, (B, 1)), (1, n)))
    periods = np.linspace(1.2, 4.0, 33)
    durations = np.array([0.1, 0.2])
    gen = bls_power_shared_batch(t, Y, dy, periods, durations,
                                 uniform_weights=False)
    uni = bls_power_shared_batch(t, Y, dy, periods, durations)  # auto
    for k in ("power", "depth", "depth_err", "depth_snr",
              "log_likelihood", "duration", "transit_time"):
        a, b = np.asarray(gen[k]), np.asarray(uni[k])
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-15,
                                   err_msg=f"{dy_case}/{k}")


def test_general_path_ragged_batch_padding(rng):
    """On TPU the general weighted kernel pads ragged batches (B not a
    multiple of 128) with zero-weight rows to stay on the fused window
    path; outputs must be identical to the unpadded run and keep the
    caller's B.  Forced on here via platform='tpu' (window_impl pinned
    to xla since Pallas needs a real TPU; padding is what this checks)."""
    from lightkurve_tpu.ops import bls as bls_mod
    B, n = 5, 300
    t = np.sort(rng.uniform(0, 10, n))
    Y = 1.0 + 5e-4 * rng.normal(size=(B, n))
    dy = rng.uniform(4e-4, 9e-4, (B, n))       # heteroscedastic → general
    periods = np.linspace(1.2, 3.0, 17)
    durations = np.array([0.1, 0.2])
    ref = bls_mod.bls_power_shared_batch(t, Y, dy, periods, durations,
                                         uniform_weights=False)
    padded = bls_mod.bls_power_shared_batch(
        t, Y, dy, periods, durations, uniform_weights=False,
        window_impl="xla", platform="tpu")
    for k in ("power", "depth", "depth_err", "depth_snr",
              "log_likelihood", "duration", "transit_time", "period"):
        a, b = np.asarray(ref[k]), np.asarray(padded[k])
        assert b.shape[0] == B, f"{k} kept padding rows"
        np.testing.assert_allclose(a, b, rtol=1e-6, err_msg=k)


@pytest.mark.mosaic_interpret
def test_uniform_pallas_window_matches_xla(rng):
    """The uniform-path Pallas window kernel (interpret mode on CPU)
    agrees with the XLA windowing form."""
    from lightkurve_tpu.ops.bls import bls_power_shared_batch
    B, n = 128, 400
    t = np.sort(rng.uniform(0, 12, n))
    Y = 1.0 + 5e-4 * rng.normal(size=(B, n))
    periods = np.linspace(1.2, 4.0, 17)
    durations = np.array([0.1, 0.2])
    x = bls_power_shared_batch(t, Y, None, periods, durations,
                               window_impl="xla")
    p = bls_power_shared_batch(t, Y, None, periods, durations,
                               window_impl="pallas_interpret")
    for k in ("power", "depth", "depth_err", "transit_time", "duration"):
        np.testing.assert_allclose(np.asarray(x[k]), np.asarray(p[k]),
                                   rtol=1e-9, err_msg=k)


def test_uniform_kernel_padding_rows_sort_last():
    """All-inf-dy rows (batch padding) must report power=-inf from the
    uniform-weights kernel, like the general kernel — not power 0
    (review finding: padded rows could win an argmax over power)."""
    import jax.numpy as jnp
    from lightkurve_tpu.ops.bls import bls_power_shared_batch
    rng = np.random.default_rng(0)
    n = 512
    t = np.arange(n) * 0.02
    flux = 1 + 0.001 * rng.standard_normal((2, n))
    flux[0, (t % 2.0) < 0.1] -= 0.05        # real transit in row 0
    dy = np.ones((2, n))
    dy[1] = np.inf                          # row 1 is padding
    periods = np.linspace(1.5, 2.5, 64)
    out = bls_power_shared_batch(
        jnp.asarray(t), jnp.asarray(flux), np.asarray(dy),
        jnp.asarray(periods), jnp.asarray([0.1]))
    power = np.asarray(out["power"])
    assert np.all(np.isneginf(power[1]))
    assert np.isfinite(power[0]).all()
    # argmax over the batch never selects the padding row
    assert int(np.argmax(power.max(axis=1))) == 0


@pytest.fixture
def fresh_jax_caches():
    """Release compiled executables before Pallas-interpret tests.

    The Mosaic interpreter has been observed to SEGFAULT when invoked
    late in a long single-process pytest run (after ~450 tests'
    accumulated compilation state; reproducibly at
    test_fused_pallas_matches_xla in a full `pytest tests/` run, never
    when the module runs alone).  Clearing jax's compilation caches
    before entering interpret mode removes the accumulated state the
    crash depends on."""
    import gc

    import jax
    jax.clear_caches()
    gc.collect()
    yield


@pytest.mark.mosaic_interpret
@pytest.mark.parametrize("edge_mode", ["wrap", "astropy"])
@pytest.mark.parametrize("objective", ["likelihood", "snr"])
def test_fused_pallas_matches_xla(rng, edge_mode, objective,
                                  fresh_jax_caches):
    """The fully-fused Pallas BLS pipeline (interpret mode on CPU)
    matches the XLA staged path on every output, both edge conventions
    and objectives, including lane-tile 256 and inf-padding rows."""
    from lightkurve_tpu.ops.bls import bls_power_shared_batch
    n, B, P = 256, 128, 37
    t = np.arange(n) * 0.02
    Y = 1.0 + 2e-4 * rng.standard_normal((B, n))
    ph = np.mod(t - 0.3 + 0.45, 0.9) - 0.45
    Y[:, np.abs(ph) < 0.05] -= 3e-3
    periods = np.linspace(0.5, 1.7, P)
    durs = np.array([0.05, 0.1, 0.15])
    kw = dict(objective=objective, edge_mode=edge_mode, chunk=8)
    a = bls_power_shared_batch(t, Y, None, periods, durs,
                               fold_impl="xla", **kw)
    b = bls_power_shared_batch(t, Y, None, periods, durs,
                               fold_impl="fused_interpret", **kw)
    for k in a:
        aa, bb = np.asarray(a[k]), np.asarray(b[k])
        m = np.isfinite(aa)
        np.testing.assert_allclose(aa[m], bb[m], rtol=1e-9, atol=1e-12,
                                   err_msg=k)
        np.testing.assert_array_equal(np.isfinite(aa), np.isfinite(bb),
                                      err_msg=k)


@pytest.mark.mosaic_interpret
def test_fused_pallas_lane_tile_256_and_padding(rng, fresh_jax_caches):
    """B=256 engages the 256-lane tile; all-inf dy rows (batch padding)
    sort last exactly as the XLA uniform kernel's."""
    from lightkurve_tpu.ops.bls import bls_power_shared_batch
    n, B, P = 256, 256, 23
    t = np.arange(n) * 0.02
    Y = 1.0 + 2e-4 * rng.standard_normal((B, n))
    dy = np.tile(rng.uniform(2e-4, 6e-4, (B, 1)), (1, n))
    dy[-5:] = np.inf
    periods = np.linspace(0.5, 1.7, P)
    durs = np.array([0.05, 0.1])
    a = bls_power_shared_batch(t, Y, dy, periods, durs, chunk=8,
                               uniform_weights=True, fold_impl="xla")
    b = bls_power_shared_batch(t, Y, dy, periods, durs, chunk=8,
                               uniform_weights=True,
                               fold_impl="fused_interpret")
    for k in a:
        aa, bb = np.asarray(a[k]), np.asarray(b[k])
        m = np.isfinite(aa)
        np.testing.assert_allclose(aa[m], bb[m], rtol=1e-9, atol=1e-12,
                                   err_msg=k)
        np.testing.assert_array_equal(np.isfinite(aa), np.isfinite(bb),
                                      err_msg=k)
    assert np.all(np.isneginf(np.asarray(b["power"])[-5:]))


def test_bucket_matches_unbucketed(rng):
    """bucket=True must be BIT-identical to the plain scan for both the
    uniform count-histogram kernel and the general weighted kernel —
    the bucket quantization only changes tile padding, never per-period
    validity (``_bucket_periods``, ``_bls_shared_scan_uniform``)."""
    from lightkurve_tpu.ops.bls import bls_power_shared_batch
    B, n = 6, 512
    t = np.arange(n) * 0.01
    Y = 1.0 + 1e-3 * rng.normal(size=(B, n))
    periods = np.linspace(0.3, 2.5, 120)   # spans several 128-row tiles
    durs = np.array([0.05, 0.1])
    for dy in (None, np.full((B, n), 2e-3),
               1e-3 * (1 + rng.random((B, n)))):
        a = bls_power_shared_batch(t, Y, dy, periods, durs, chunk=4)
        b = bls_power_shared_batch(t, Y, dy, periods, durs, chunk=4,
                                   bucket=True)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=k)


def test_uniform_degenerate_all_durations_too_long(rng):
    """Every duration window longer than the shortest trial period's bin
    count (the reference forbids this upstream; the kernel must stay
    NaN-free and never let such periods win).  Pins that the round-3
    out-of-loop winner reconstruction reproduces the guarded defaults
    the in-loop pick used when no window is valid."""
    from lightkurve_tpu.ops.bls import bls_power_shared_batch
    B, n = 3, 256
    t = np.arange(n) * 0.01
    Y = 1.0 + 1e-3 * rng.normal(size=(B, n))
    p_true = 1.95
    hp = p_true / 2
    Y[:, np.abs(np.mod(t + hp, p_true) - hp) < 0.15] -= 0.01
    # period 0.11 with duration 0.3: k*d_phase > period => no valid bin
    periods = np.array([0.11, 0.12, 1.9, 1.95, 2.0])
    durs = np.array([0.3])
    out = bls_power_shared_batch(t, Y, None, periods, durs, chunk=5,
                                 uniform_weights=True)
    power = np.asarray(out["power"])
    for k in ("power", "depth", "transit_time", "duration"):
        assert not np.any(np.isnan(np.asarray(out[k]))), k
    # degenerate periods must lose to any real transit window
    assert np.all(np.argmax(power, axis=1) >= 2), power
