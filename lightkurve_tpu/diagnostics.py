"""Tracing & profiling subsystem.

The reference has no profiling infrastructure beyond stdlib logging
(SURVEY.md §5: "jax.profiler traces + per-kernel wall-clock counters become
a real subsystem" in the TPU build).  This module provides:

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace directory;
- :class:`KernelTimer` / :func:`timed` — lightweight wall-clock counters
  per kernel (blocking on device completion), aggregated in a global
  registry inspectable via :func:`report`;
- :func:`annotate` — name a region so it shows up in device traces.
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from functools import wraps

log = logging.getLogger(__name__)

__all__ = ["trace", "timed", "annotate", "report", "reset",
           "KernelTimer", "hbm_stats"]

_REGISTRY = defaultdict(lambda: {"calls": 0, "total_s": 0.0, "max_s": 0.0})


@contextlib.contextmanager
def trace(logdir="/tmp/lightkurve_tpu_trace", create_perfetto_link=False):
    """Capture a device profile around a block (TensorBoard/Perfetto)."""
    import jax
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        log.info("Profile trace written to %s", logdir)


@contextlib.contextmanager
def annotate(name):
    """Named region that appears in device traces."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class KernelTimer:
    """Wall-clock timer that blocks until device work completes."""

    def __init__(self, name):
        self.name = name

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        import jax
        try:
            jax.block_until_ready(
                jax.device_put(0.0))  # fence: cheap sync point
        except Exception:
            pass
        dt = time.perf_counter() - self._t0
        entry = _REGISTRY[self.name]
        entry["calls"] += 1
        entry["total_s"] += dt
        entry["max_s"] = max(entry["max_s"], dt)


def timed(name=None):
    """Decorator: time a function (including device sync on its outputs)."""
    def deco(fn):
        label = name or fn.__qualname__

        @wraps(fn)
        def wrapper(*args, **kwargs):
            import jax
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            try:
                jax.block_until_ready(out)
            except Exception:
                pass
            dt = time.perf_counter() - t0
            entry = _REGISTRY[label]
            entry["calls"] += 1
            entry["total_s"] += dt
            entry["max_s"] = max(entry["max_s"], dt)
            return out

        return wrapper

    return deco


def report(sort_by="total_s"):
    """Return (and log) the kernel-timing table."""
    rows = sorted(_REGISTRY.items(), key=lambda kv: -kv[1][sort_by])
    lines = [f"{'kernel':<40s} {'calls':>6s} {'total[s]':>10s} "
             f"{'mean[ms]':>10s} {'max[ms]':>10s}"]
    for name, e in rows:
        mean_ms = 1e3 * e["total_s"] / max(e["calls"], 1)
        lines.append(f"{name:<40s} {e['calls']:>6d} {e['total_s']:>10.3f} "
                     f"{mean_ms:>10.2f} {1e3 * e['max_s']:>10.2f}")
    text = "\n".join(lines)
    log.info("Kernel timing report:\n%s", text)
    return dict(_REGISTRY)


def reset():
    _REGISTRY.clear()


def hbm_stats(device=None):
    """Device-memory telemetry: current live-allocation bytes (and peak,
    where the backend reports one).

    Prefers the PJRT ``memory_stats()`` counters; the axon TPU tunnel
    returns ``None`` there, so the fallback sums ``jax.live_arrays()``
    committed to the device — the live-buffer high-water mark as seen
    from Python (kernel-internal scratch is excluded either way).
    Returns a dict (possibly with only ``live_bytes``); never raises.
    """
    import jax
    try:
        dev = device if device is not None else jax.local_devices()[0]
        s = dev.memory_stats() or {}
        out = {k: int(v) for k, v in s.items()
               if "bytes" in k and isinstance(v, (int, float))}
        if out:
            return out
        live = 0
        for a in jax.live_arrays():
            try:
                if any(d == dev for d in a.devices()):
                    live += int(a.size) * a.dtype.itemsize
            except Exception:
                continue
        return {"live_bytes": live}
    except Exception:
        return {}
