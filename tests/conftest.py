"""Test configuration: CPU backend, 8 virtual devices, float64.

Parity tests (SURVEY.md §4 implication) run on the CPU backend with x64 so
kernels can be compared against numpy/scipy oracles at ~1e-9; multi-device
sharding tests use the virtual 8-device mesh.  TPU-specific behavior is
exercised separately by `bench.py` / `__graft_entry__.py` on real hardware.
"""
import os
import sys

# Must happen before jax is imported anywhere.  The environment presets
# JAX_PLATFORMS=axon (the TPU tunnel), so we must OVERRIDE, not setdefault:
# parity tests need CPU + float64.  Set LK_TEST_TPU=1 to test on hardware.
if not os.environ.get("LK_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The axon TPU plugin (living on PYTHONPATH at /root/.axon_site) spawns
    # tunnel threads at import time that can deadlock CPU-only runs — strip
    # it entirely so the plugin is never discovered.
    os.environ["PYTHONPATH"] = ":".join(
        p for p in os.environ.get("PYTHONPATH", "").split(":")
        if p and "axon" not in p)
    sys.path[:] = [p for p in sys.path if "axon" not in p]
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TESTS_DIR))   # repo root
sys.path.insert(0, _TESTS_DIR)                    # helper modules (oracles…)

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter start (before this
# conftest), freezing JAX_PLATFORMS=axon — override via jax.config.
if not os.environ.get("LK_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert os.environ.get("LK_TEST_TPU") or jax.default_backend() == "cpu", \
    "tests must run on the CPU backend (got %s)" % jax.default_backend()

import matplotlib  # noqa: E402

matplotlib.use("Agg")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


def pytest_collection_modifyitems(config, items):
    """Skip memory-stress tests unless explicitly selected with
    ``-m memtest`` (mirrors reference conftest.py:28-43)."""
    if "memtest" in (config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(reason="memtest skipped (run with -m memtest)")
    for item in items:
        if "memtest" in item.keywords:
            item.add_marker(skip)
