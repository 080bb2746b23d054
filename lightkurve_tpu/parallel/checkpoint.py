"""Checkpointed period-grid sweeps.

The reference has no compute checkpointing (SURVEY.md §5: "long BLS sweeps
over 10⁴+ targets should checkpoint per-shard best-so-far arrays to
host").  :class:`SweepRunner` walks a large period grid in chunks, keeps
per-target best-so-far candidate arrays on host, and persists them (npz)
after every chunk — an interrupted sweep resumes from the last finished
chunk.
"""
from __future__ import annotations

import logging
import os

import numpy as np

log = logging.getLogger(__name__)

__all__ = ["SweepRunner"]

_FIELDS = ("power", "depth", "depth_err", "depth_snr", "log_likelihood",
           "duration", "transit_time", "period")


class SweepRunner:
    """Chunked, resumable BLS sweep over a huge period grid.

    Parameters
    ----------
    stack : `~lightkurve_tpu.batch.LightCurveStack`
    periods : (P,) full period grid (float64 host array).
    durations : (D,) durations.
    checkpoint_path : str — npz file updated after each chunk.
    chunk_periods : int — grid points per device step.
    """

    def __init__(self, stack, periods, durations, checkpoint_path,
                 chunk_periods=4096, oversample=10, objective="likelihood",
                 method="fast"):
        self.stack = stack
        self.periods = np.asarray(periods, dtype=np.float64)
        self.durations = np.asarray(durations, dtype=np.float64)
        self.checkpoint_path = checkpoint_path
        self.chunk_periods = int(chunk_periods)
        self.oversample = oversample
        self.objective = objective
        self.method = method
        B = len(stack)
        self.state = {f: np.full(B, np.nan) for f in _FIELDS}
        self.state["power"] = np.full(B, -np.inf)
        self.next_chunk = 0
        if os.path.exists(checkpoint_path):
            self._load()

    @property
    def n_chunks(self):
        return -(-len(self.periods) // self.chunk_periods)

    @property
    def done(self):
        return self.next_chunk >= self.n_chunks

    def _load(self):
        data = np.load(self.checkpoint_path)
        if len(data["periods"]) != len(self.periods) or not np.allclose(
                data["periods"], self.periods):
            log.warning("Checkpoint grid differs; starting fresh.")
            return
        for f in _FIELDS:
            self.state[f] = data[f]
        self.next_chunk = int(data["next_chunk"])
        log.info("Resumed sweep at chunk %d/%d", self.next_chunk,
                 self.n_chunks)

    def _save(self):
        tmp = self.checkpoint_path + ".tmp.npz"   # .npz suffix: savez
        np.savez(tmp, periods=self.periods,        # won't append another
                 next_chunk=self.next_chunk, **self.state)
        os.replace(tmp, self.checkpoint_path)

    def run(self, max_chunks=None):
        """Process up to ``max_chunks`` chunks (all remaining by default),
        checkpointing after each.  Returns the best-so-far dict."""
        import jax.numpy as jnp
        from ..ops.bls import bls_power, bls_power_binned
        kernel = bls_power_binned if self.method == "fast" else bls_power
        import jax
        done = 0
        d_phase = float(self.durations.min()) / self.oversample
        size_kw = ("nbins" if self.method == "fast" else "t0_count")
        size_val = int(np.ceil(self.periods.max() / d_phase)) + (
            0 if self.method == "fast" else 1)
        dy = jnp.where(self.stack.mask, self.stack.flux_err,
                       jnp.asarray(np.inf, self.stack.flux.dtype))
        fn = jax.jit(jax.vmap(
            lambda t, y, d, p: kernel(
                t, y, d, p, jnp.asarray(self.durations,
                                        self.stack.flux.dtype),
                oversample=self.oversample, objective=self.objective,
                d_phase=d_phase, **{size_kw: size_val}),
            in_axes=(0, 0, 0, None)))
        while not self.done and (max_chunks is None or done < max_chunks):
            i = self.next_chunk
            lo = i * self.chunk_periods
            hi = min(lo + self.chunk_periods, len(self.periods))
            pchunk = self.periods[lo:hi]
            # pad the final chunk so compiled shapes stay constant
            pad = self.chunk_periods - len(pchunk)
            pvals = np.pad(pchunk, (0, pad), constant_values=pchunk[-1])
            out = fn(self.stack.time, self.stack.flux, dy,
                     jnp.asarray(pvals, self.stack.flux.dtype))
            out = {k: np.asarray(v)[:, : len(pchunk)]
                   for k, v in out.items()}
            best_idx = np.argmax(out["power"], axis=1)
            rows = np.arange(out["power"].shape[0])
            better = out["power"][rows, best_idx] > self.state["power"]
            for f in _FIELDS:
                vals = out[f][rows, best_idx]
                self.state[f] = np.where(better, vals, self.state[f])
            self.next_chunk += 1
            done += 1
            self._save()
            log.info("Sweep chunk %d/%d done (best power so far: %.3g)",
                     self.next_chunk, self.n_chunks,
                     float(np.nanmax(self.state["power"])))
        return dict(self.state)
