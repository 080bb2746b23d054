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


_CLEAR_EVERY = int(os.environ.get("LK_TEST_CLEAR_EVERY", 100))
_test_count = {"n": 0}


@pytest.fixture(autouse=True)
def _bounded_compile_state():
    """Release accumulated XLA executables every ``_CLEAR_EVERY`` tests.

    Root cause (measured via LK_TEST_MAPLOG): every compiled CPU
    executable mmaps JIT code pages, and a full single-process run
    (x64, 8 virtual devices) drives the process map count toward the
    kernel's default ``vm.max_map_count`` of 65,530 — the corrector
    tests alone allocate ~22k maps per 50 tests.  When mmap fails, the
    next ``backend_compile_and_load`` SEGFAULTS on an unrelated program
    (observed twice at 45%/49% of the r5 suite; each victim test passes
    alone).  Periodic ``jax.clear_caches()`` releases the executables
    (telemetry: 43,510 maps → 10,319 across one clear) at the cost of
    recompiling shared helpers a handful of times per run; every-100
    keeps the observed peak under ~30k.  Set LK_TEST_CLEAR_EVERY=0 to
    disable, LK_TEST_MAPLOG=<path> to re-record the telemetry."""
    yield
    _test_count["n"] += 1
    maplog = os.environ.get("LK_TEST_MAPLOG")
    if maplog and _test_count["n"] % 50 == 0:
        try:
            with open("/proc/self/maps") as f:
                nmaps = sum(1 for _ in f)
            with open(maplog, "a") as f:
                f.write(f"{_test_count['n']} maps={nmaps}\n")
        except OSError:
            pass
    if _CLEAR_EVERY and _test_count["n"] % _CLEAR_EVERY == 0:
        import gc
        jax.clear_caches()
        gc.collect()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "mosaic_interpret: test drives the Pallas Mosaic interpreter "
        "(reordered to the end of the suite — see "
        "pytest_collection_modifyitems)")


def pytest_collection_modifyitems(config, items):
    """Skip memory-stress tests unless explicitly selected with
    ``-m memtest`` (mirrors reference conftest.py:28-43), and run every
    Mosaic-interpret test LAST.

    The Mosaic interpreter corrupts in-process state in a way that can
    SEGFAULT a *later* XLA CPU compile: observed r2 at
    test_fused_pallas_matches_xla itself (mitigated by the fresh-caches
    fixture there), then r5 as a crash in an unrelated `lax.scan`
    compile ~30 files after the oracle-parity interpret tests ran.
    Moving interpret tests to the end leaves no downstream compiles for
    the corruption to kill; the tests themselves still pass (they always
    have — the victim was whatever compiled next)."""
    if "memtest" not in (config.getoption("-m") or ""):
        skip = pytest.mark.skip(
            reason="memtest skipped (run with -m memtest)")
        for item in items:
            if "memtest" in item.keywords:
                item.add_marker(skip)
    items.sort(key=lambda item: "mosaic_interpret" in item.keywords)
