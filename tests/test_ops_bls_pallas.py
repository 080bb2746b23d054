"""Pallas BLS kernel vs the XLA binned kernel (interpreter mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from lightkurve_tpu.ops.bls import bls_power_binned
from lightkurve_tpu.ops.bls_pallas import bls_power_pallas


def test_pallas_matches_binned(rng):
    n = 512
    t = np.sort(rng.uniform(0, 10.0, n)).astype(np.float32)
    P_true = 2.345
    ph = np.mod(t - 0.7 + P_true / 2, P_true) - P_true / 2
    y = (1.0 + 0.002 * rng.standard_normal(n)).astype(np.float32)
    y[np.abs(ph) < 0.06] -= 0.01
    dy = np.full(n, 0.002, np.float32)
    periods = np.linspace(1.8, 3.0, 16).astype(np.float32)
    durations = np.array([0.1, 0.15], np.float32)

    ref = {k: np.asarray(v) for k, v in bls_power_binned(
        jnp.asarray(t), jnp.asarray(y), jnp.asarray(dy),
        jnp.asarray(periods), jnp.asarray(durations)).items()}
    got = {k: np.asarray(v) for k, v in bls_power_pallas(
        t, y, dy, periods, durations, interpret=True).items()}

    assert np.argmax(got["power"]) == np.argmax(ref["power"])
    # the pallas kernel scans the UNION of two t0 grids (fold + half-period
    # shifted fold), so its optimum is >= the XLA binned optimum up to f32
    # noise, and within bin-quantization of it
    assert (got["power"] >= ref["power"] - 2e-3 * ref["power"].max()).all()
    np.testing.assert_allclose(got["power"], ref["power"], rtol=0.05)
    np.testing.assert_allclose(got["depth"], ref["depth"], atol=2e-3)
    # transit time within one phase bin (d_phase = 0.01)
    assert np.max(np.abs(got["transit_time"] - ref["transit_time"])) <= 0.011


def test_pallas_snr_objective(rng):
    n = 256
    t = np.sort(rng.uniform(0, 8.0, n)).astype(np.float32)
    y = (1.0 + 0.005 * rng.standard_normal(n)).astype(np.float32)
    periods = np.linspace(1.0, 2.0, 8).astype(np.float32)
    durations = np.array([0.1], np.float32)
    got = bls_power_pallas(t, y, None, periods, durations,
                           objective="snr", interpret=True)
    ref = bls_power_binned(jnp.asarray(t), jnp.asarray(y), None,
                           jnp.asarray(periods), jnp.asarray(durations),
                           objective="snr")
    gp = np.asarray(got["power"])
    rp = np.asarray(ref["power"])
    # pure-noise data: the optima are chance fluctuations; both kernels'
    # grids differ only by bin-edge placement for wrap windows, so the
    # best SNRs agree to within a few percent
    np.testing.assert_allclose(gp, rp, rtol=0.1)
