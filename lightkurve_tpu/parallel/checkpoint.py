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
from functools import lru_cache

import numpy as np

log = logging.getLogger(__name__)

__all__ = ["SweepRunner"]

_FIELDS = ("power", "depth", "depth_err", "depth_snr", "log_likelihood",
           "duration", "transit_time", "period")


_SAVE_POOL = [None]

#: (step-cache key, (B, N)) pairs whose XLA program was built by
#: :func:`prewarm_shared_sweep`.  The step wrapper consults this on its
#: first execution of a shape so an in-line compile (a prewarm MISS —
#: the stall pathology ADVICE r4 flagged in the north-star record) is
#: logged and attributable, instead of silently inflating one batch.
_PREWARMED = set()


def _save_pool():
    """One shared checkpoint-writer thread per process (a per-runner
    executor would leak an idle thread per batch in streaming sweeps)."""
    if _SAVE_POOL[0] is None:
        from concurrent.futures import ThreadPoolExecutor
        _SAVE_POOL[0] = ThreadPoolExecutor(
            1, thread_name_prefix="lk-sweep-ckpt")
    return _SAVE_POOL[0]


def _reduce_winner(out, n_valid):
    """Device-side winner reduction: ONE stacked (F, B) array so the
    host pulls a single small buffer instead of 8 (B, P_chunk) grids."""
    import jax.numpy as jnp
    power = out["power"]
    cols = jnp.arange(power.shape[1])
    power = jnp.where(cols[None, :] < n_valid, power, -jnp.inf)
    idx = jnp.argmax(power, axis=1)
    return jnp.stack([jnp.take_along_axis(
        out[f], idx[:, None], axis=1)[:, 0] for f in _FIELDS])


@lru_cache(maxsize=16)
def _shared_step_cached(durs_key, oversample, objective, d_phase, nbins,
                        dtype_name, uniform_weights=False):
    import jax
    import jax.numpy as jnp
    from ..ops.bls import bls_power_shared_batch
    durs = jnp.asarray(durs_key, dtype=np.dtype(dtype_name))
    key = (durs_key, oversample, objective, d_phase, nbins, dtype_name,
           uniform_weights)

    @jax.jit
    def step(t_row, flux, dy, pvals, n_valid):
        out = bls_power_shared_batch(
            t_row, flux, dy, pvals, durs, oversample=oversample,
            objective=objective, d_phase=d_phase, nbins=nbins,
            chunk=8, uniform_weights=uniform_weights)
        return _reduce_winner(out, n_valid)

    seen_shapes = set()

    def wrapped(t_row, flux, dy, pvals, n_valid):
        shape = tuple(flux.shape)
        if shape not in seen_shapes:
            seen_shapes.add(shape)
            if (key, shape) not in _PREWARMED:
                log.info(
                    "chunk program nbins=%d B=%d compiled in-line "
                    "(prewarm miss)", nbins, shape[0])
        return step(t_row, flux, dy, pvals, n_valid)

    return wrapped


@lru_cache(maxsize=16)
def _percurve_step_cached(method, durs_key, oversample, objective,
                          d_phase, size_val, dtype_name):
    import jax
    import jax.numpy as jnp
    from ..ops.bls import bls_power, bls_power_binned
    kernel = bls_power_binned if method == "fast" else bls_power
    size_kw = "nbins" if method == "fast" else "t0_count"
    durs = jnp.asarray(durs_key, dtype=np.dtype(dtype_name))

    @jax.jit
    def step(time, flux, dy, pvals, n_valid):
        out = jax.vmap(
            lambda t, y, d: kernel(
                t, y, d, pvals, durs, oversample=oversample,
                objective=objective, d_phase=d_phase,
                **{size_kw: size_val}))(time, flux, dy)
        out["period"] = jnp.broadcast_to(out["period"][0][None, :],
                                         out["power"].shape)
        return _reduce_winner(out, n_valid)

    return step


_PREWARM_POOL = [None]


def _prewarm_pool():
    if _PREWARM_POOL[0] is None:
        from concurrent.futures import ThreadPoolExecutor
        _PREWARM_POOL[0] = ThreadPoolExecutor(
            8, thread_name_prefix="lk-sweep-prewarm")
    return _PREWARM_POOL[0]


def shared_sweep_geometries(periods, durations, chunk_periods,
                            oversample=10):
    """The distinct static (d_phase, nb_q) program geometries a shared
    sweep over ``periods`` will use, in grid (= execution) order.

    The shared-method step sizes its fold histogram per chunk (quantized
    to a 128-row tile), so a sweep compiles one XLA program per distinct
    quantized size — knowable up front from the grid alone.
    """
    periods = np.asarray(periods, dtype=np.float64)
    durations = np.asarray(durations, dtype=np.float64)
    d_phase = float(durations.min()) / oversample
    k_max = max(int(max(int(d / d_phase + 0.5), 1)) for d in durations)
    geoms, seen = [], set()
    for lo in range(0, len(periods), chunk_periods):
        chunk = periods[lo:lo + chunk_periods]
        nb = int(np.ceil(float(np.max(chunk)) / d_phase))
        tiles = max((nb + k_max - 1 + 127) // 128, 1)
        nb_q = tiles * 128 - (k_max - 1)
        if nb_q not in seen:
            seen.add(nb_q)
            geoms.append((d_phase, nb_q, chunk[: min(len(chunk),
                                                     chunk_periods)]))
    return geoms


def prewarm_shared_sweep(n_targets, n_cadences, periods, durations,
                         chunk_periods, oversample=10,
                         objective="likelihood", dtype="float32",
                         uniform_weights=True, wait=False):
    """Compile every distinct chunk program of a shared-method sweep
    CONCURRENTLY on background threads, before (or while) the data
    arrives.

    A production sector sweep streams many (B, N) batches through one
    grid; all batches share the same handful of chunk programs.  The
    big fused-BLS programs take ~1 min each to build through a remote
    compile tunnel, and a cold process otherwise pays them serially,
    in-line with the first batch.  Firing them on threads overlaps the
    compiles with each other and with the host-side FITS parse of the
    first batch; the persistent compile cache
    (:func:`~lightkurve_tpu.config.enable_persistent_compile_cache`)
    then makes later processes skip them entirely.

    Returns the list of futures (each resolves when its program has
    compiled and executed once on dummy data).  ``wait=True`` blocks.

    No reference equivalent: the reference recompiles nothing (its BLS
    is a one-shot Cython call, /root/reference/src/lightkurve/
    periodogram.py:1161-1192) but pays the full objective in Python
    serially per target instead.
    """
    import jax.numpy as jnp
    durs_key = tuple(float(d) for d in np.asarray(durations, np.float64))
    dtype_name = str(np.dtype(dtype))
    geoms = shared_sweep_geometries(periods, durations, chunk_periods,
                                    oversample)
    jdt = jnp.dtype(dtype_name)
    t_row = jnp.zeros((n_cadences,), jdt)
    flux = jnp.ones((n_targets, n_cadences), jdt)
    dy = jnp.ones((n_targets, n_cadences), jdt)
    n_valid = jnp.asarray(1, np.int32)

    def _one(d_phase, nb_q, chunk):
        key = (durs_key, oversample, objective, d_phase, nb_q, dtype_name,
               uniform_weights)
        _PREWARMED.add((key, (n_targets, n_cadences)))   # before step():
        # the step wrapper's first-call miss check must see it registered
        step = _shared_step_cached(durs_key, oversample, objective,
                                   d_phase, nb_q, dtype_name,
                                   uniform_weights=uniform_weights)
        pvals = np.full(chunk_periods, chunk[-1], np.dtype(dtype_name))
        pvals[:len(chunk)] = chunk
        step(t_row, flux, dy, jnp.asarray(pvals), n_valid)[0]\
            .block_until_ready()
        return nb_q

    futures = [_prewarm_pool().submit(_one, *g) for g in geoms]
    if wait:
        for f in futures:
            f.result()
    return futures


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
                 method="fast", save_every=1, mesh=None, async_save=False):
        self.stack = stack
        self.mesh = mesh
        self.periods = np.asarray(periods, dtype=np.float64)
        self.durations = np.asarray(durations, dtype=np.float64)
        self.checkpoint_path = checkpoint_path
        self.chunk_periods = int(chunk_periods)
        self.oversample = oversample
        self.objective = objective
        self.method = method
        self.save_every = max(int(save_every), 1)
        #: async_save=True moves the npz write off the sweep thread (one
        #: writer, one write in flight) so checkpoint IO overlaps device
        #: compute; the atomic os.replace keeps kill-resume safe (a write
        #: lost mid-flight just replays its chunk).
        self.async_save = bool(async_save)
        self._save_pool = None
        self._pending_save = None
        B = len(stack)
        self.state = {f: np.full(B, np.nan) for f in _FIELDS}
        self.state["power"] = np.full(B, -np.inf)
        self.next_chunk = 0
        if os.path.exists(checkpoint_path):
            self._load()

    def prewarm(self, wait=False):
        """Start compiling this sweep's distinct chunk programs on
        background threads (shared method only; see
        :func:`prewarm_shared_sweep`).  Safe to call at any point; the
        sweep's own chunk steps block only on the program they need."""
        if self.method != "shared" or self.mesh is not None:
            return []
        import jax.numpy as jnp
        err = self.stack.flux_err
        uniform = bool(jnp.all(self.stack.mask)) and bool(
            jnp.all(err == err[:, :1]))
        B, N = self.stack.flux.shape
        # bucketed batches compile one program per distinct padded bucket
        # size — prewarm each (they share everything but the batch dim)
        time_np = np.asarray(self.stack.time)
        sizes = {B}
        if not (time_np == time_np[0:1]).all():
            counts = {}
            for i in range(B):
                key = time_np[i].tobytes()
                counts[key] = counts.get(key, 0) + 1
            sizes = {-(-c // 64) * 64 for c in counts.values()}
        futures = []
        for Bs in sorted(sizes, reverse=True):
            futures += prewarm_shared_sweep(
                Bs, N, self.periods, self.durations, self.chunk_periods,
                oversample=self.oversample, objective=self.objective,
                dtype=str(np.dtype(self.stack.flux.dtype)),
                uniform_weights=uniform, wait=wait)
        return futures

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
        # next_chunk is a chunk INDEX, meaningful only under the chunking
        # it was written with: resuming a mid-sweep checkpoint under a
        # different chunk_periods would silently skip (or redo) part of
        # the grid.  Legacy checkpoints without the field restart fresh.
        ckpt_cp = int(data["chunk_periods"]) if "chunk_periods" in data \
            else -1
        if ckpt_cp != self.chunk_periods:
            log.warning(
                "Checkpoint chunk_periods %s differs from configured %d; "
                "starting fresh to keep grid coverage exact.", ckpt_cp,
                self.chunk_periods)
            return
        for f in _FIELDS:
            self.state[f] = data[f]
        self.next_chunk = int(data["next_chunk"])
        log.info("Resumed sweep at chunk %d/%d", self.next_chunk,
                 self.n_chunks)

    def _write_npz(self, payload):
        tmp = self.checkpoint_path + ".tmp.npz"   # .npz suffix: savez
        np.savez(tmp, **payload)                   # won't append another
        os.replace(tmp, self.checkpoint_path)

    def _save(self):
        # snapshot by reference: _merge REPLACES state arrays (np.where
        # allocates), so a captured dict stays internally consistent
        payload = dict(periods=self.periods, next_chunk=self.next_chunk,
                       chunk_periods=self.chunk_periods, **self.state)
        if not self.async_save:
            self._write_npz(payload)
            return
        if self._save_pool is None:
            self._save_pool = _save_pool()
        if self._pending_save is not None:
            self._pending_save.result()            # one write in flight
        self._pending_save = self._save_pool.submit(self._write_npz,
                                                    payload)

    def flush_saves(self):
        """Block until any in-flight async checkpoint write lands."""
        if self._pending_save is not None:
            self._pending_save.result()
            self._pending_save = None

    def _make_step(self):
        """One jitted step: kernel over a period chunk + DEVICE-side
        winner reduction, so only (B,) winner fields cross the (slow)
        host link instead of the full (B, P_chunk) grids.

        The jitted function is built by a module-level ``lru_cache``d
        factory keyed on the STATIC parameters only — successive
        SweepRunners over new target batches (the sector-scale streaming
        pattern) reuse one compiled program instead of re-tracing and
        re-compiling per batch (measured ~25 s/batch of host overhead
        on the north-star run before this fix)."""
        import jax.numpy as jnp
        import functools
        d_phase = float(self.durations.min()) / self.oversample
        durs_key = tuple(float(d) for d in self.durations)
        dtype_name = str(np.dtype(self.stack.flux.dtype))
        # per-curve-constant weights (all cadences valid + row-constant
        # flux_err) enable the half-FLOP count-histogram BLS kernel;
        # two device reductions once per runner, not per chunk
        err = self.stack.flux_err
        uniform = bool(jnp.all(self.stack.mask)) and bool(
            jnp.all(err == err[:, :1]))
        if self.mesh is not None:
            # multi-chip: targets data-parallel, the period chunk
            # sharded over the mesh's grid axis (sharded_bls), with the
            # winner reduction on the gathered (B, P_chunk) output
            from .grid import sharded_bls
            import jax
            mesh = self.mesh
            durations = self.durations
            oversample = self.oversample
            objective = self.objective
            time = self.stack.time

            # one jit wrapper for the whole sweep: a fresh jax.jit per
            # chunk would re-trace the winner reduction every step
            reduce_jit = jax.jit(_reduce_winner)

            def step(flux, dy, pvals, n_valid):
                # durations stay a HOST float64 array: sharded_bls derives
                # the static grid geometry (d_phase, nbins) from them, and
                # an f32 round-trip would quantize d_phase differently
                # than the unsharded runner's f64 geometry (measured ~10%
                # power deltas from the shifted bin boundaries)
                out = sharded_bls(time, flux, dy, pvals, durations,
                                  oversample=oversample,
                                  objective=objective, mesh=mesh,
                                  uniform_weights=uniform)
                return reduce_jit(out, n_valid)
            return step
        if self.method == "shared":
            time_np = np.asarray(self.stack.time)
            if not (time_np == time_np[0:1]).all():
                return self._make_bucketed_step(uniform, d_phase, durs_key,
                                                dtype_name)
            t_row = jnp.asarray(time_np[0], self.stack.flux.dtype)
            # per-chunk histogram size: the sweep walks a SORTED grid, so
            # each chunk's max period is far below the grid max early on —
            # sizing nbins per chunk (quantized to a 128-row tile boundary,
            # so distinct compiles stay bounded by the tile count) removes
            # the same wasted fold rows period-bucketing removes for
            # one-shot calls.  Mirrors the kernel's k quantization.
            k_max = max(int(max(int(d / d_phase + 0.5), 1))
                        for d in self.durations)
            oversample, objective = self.oversample, self.objective
            dtype = self.stack.flux.dtype

            def step(flux, dy, pvals, n_valid):
                nb = int(np.ceil(float(np.max(np.asarray(pvals)))
                                 / d_phase))
                tiles = max((nb + k_max - 1 + 127) // 128, 1)
                nb_q = tiles * 128 - (k_max - 1)
                s = _shared_step_cached(durs_key, oversample, objective,
                                        d_phase, nb_q, dtype_name,
                                        uniform_weights=uniform)
                return s(t_row, flux, dy, jnp.asarray(pvals, dtype),
                         n_valid)
            return step
        size_val = int(np.ceil(self.periods.max() / d_phase)) + (
            0 if self.method == "fast" else 1)
        step = _percurve_step_cached(self.method, durs_key,
                                     self.oversample, self.objective,
                                     d_phase, size_val, dtype_name)
        return functools.partial(step, self.stack.time)

    def _make_bucketed_step(self, uniform, d_phase, durs_key, dtype_name):
        """Sector-bucketed shared sweep for batches whose curves do NOT all
        share one time grid (VERDICT r4 item 4).

        Real archive workloads mix a handful of cadence grids (one per
        sector/quarter); within a grid the MXU-matmul shared kernel still
        applies.  Rows are grouped by identical time rows on host, each
        bucket runs the shared kernel on its padded slice, and the
        per-bucket winner summaries are concatenated and permuted back to
        original row order on device — one stacked (F, B) output, so the
        runner's two-deep pipelining and checkpointing are unchanged.
        Fully heterogeneous batches (every curve its own grid) degrade to
        B buckets and are better served by the per-curve methods; a
        warning is emitted past 32 buckets.
        """
        import jax.numpy as jnp
        time_np = np.asarray(self.stack.time)
        B, N = time_np.shape
        dtype = self.stack.flux.dtype
        # bucket rows by grid identity (exact bytes); order-stable
        key_to_bucket, buckets = {}, []
        for i in range(B):
            key = time_np[i].tobytes()
            b = key_to_bucket.get(key)
            if b is None:
                key_to_bucket[key] = b = len(buckets)
                buckets.append([])
            buckets[b].append(i)
        if len(buckets) > 32:
            log.warning(
                "Bucketed sweep over %d distinct time grids for %d curves;"
                " per-curve methods (method='fast'/'exact') may be faster "
                "for fully heterogeneous batches.", len(buckets), B)
        segments = []          # (t_row_dev, idx_dev, B_pad)
        gather_src = np.empty(B, np.int64)
        offset = 0
        for rows in buckets:
            idx = np.asarray(rows, np.int64)
            Bb = len(idx)
            B_pad = -(-Bb // 64) * 64
            segments.append((jnp.asarray(time_np[idx[0]], dtype),
                             jnp.asarray(idx), Bb, B_pad))
            gather_src[idx] = offset + np.arange(Bb)
            offset += B_pad
        gather_d = jnp.asarray(gather_src)
        k_max = max(int(max(int(d / d_phase + 0.5), 1))
                    for d in self.durations)
        oversample, objective = self.oversample, self.objective
        log.info("Bucketed shared sweep: %d buckets (sizes %s)",
                 len(buckets), [len(b) for b in buckets])

        def step(flux, dy, pvals, n_valid):
            nb = int(np.ceil(float(np.max(np.asarray(pvals))) / d_phase))
            tiles = max((nb + k_max - 1 + 127) // 128, 1)
            nb_q = tiles * 128 - (k_max - 1)
            s = _shared_step_cached(durs_key, oversample, objective,
                                    d_phase, nb_q, dtype_name,
                                    uniform_weights=uniform)
            pv = jnp.asarray(pvals, dtype)
            outs = []
            for t_row, idx_d, Bb, B_pad in segments:
                fb = flux[idx_d]
                db = dy[idx_d]
                if B_pad > Bb:
                    fb = jnp.pad(fb, ((0, B_pad - Bb), (0, 0)))
                    db = jnp.pad(db, ((0, B_pad - Bb), (0, 0)),
                                 constant_values=1.0)
                outs.append(s(t_row, fb, db, pv, n_valid))
            return jnp.concatenate(outs, axis=1)[:, gather_d]

        return step

    def _merge(self, stacked):
        out = {f: stacked[i] for i, f in enumerate(_FIELDS)}
        better = out["power"] > self.state["power"]
        for f in _FIELDS:
            self.state[f] = np.where(better, out[f], self.state[f])
        self.next_chunk += 1
        if (self.next_chunk % self.save_every == 0
                or self.next_chunk >= self.n_chunks):
            self._save()
        log.info("Sweep chunk %d/%d done (best power so far: %.3g)",
                 self.next_chunk, self.n_chunks,
                 float(np.nanmax(self.state["power"])))

    def run(self, max_chunks=None):
        """Process up to ``max_chunks`` chunks (all remaining by default),
        checkpointing every ``save_every`` merged chunks.  Device steps
        are pipelined two-deep: chunk i+1 is dispatched before chunk i's
        (B,)-sized winner summary is pulled to host, so the host link
        and checkpoint IO overlap the TPU compute.  Returns the
        best-so-far dict."""
        import jax.numpy as jnp
        dy = jnp.where(self.stack.mask, self.stack.flux_err,
                       jnp.asarray(np.inf, self.stack.flux.dtype))
        step = self._make_step()
        n_do = self.n_chunks - self.next_chunk
        if max_chunks is not None:
            n_do = min(n_do, max_chunks)
        idxs = list(range(self.next_chunk, self.next_chunk + n_do))
        pending = None
        for i in idxs:
            lo = i * self.chunk_periods
            hi = min(lo + self.chunk_periods, len(self.periods))
            pchunk = self.periods[lo:hi]
            # pad the final chunk so compiled shapes stay constant
            pad = self.chunk_periods - len(pchunk)
            # pvals stays a HOST array: the shared-method step reads its
            # max on host to size the chunk's histogram (a device array
            # would force a blocking tunnel round-trip per chunk)
            pvals = np.pad(pchunk, (0, pad),
                           constant_values=pchunk[-1]).astype(
                np.dtype(self.stack.flux.dtype))
            out_dev = step(self.stack.flux, dy, pvals,
                           jnp.asarray(len(pchunk), np.int32))
            if pending is not None:
                self._merge(np.asarray(pending))
            pending = out_dev
        if pending is not None:
            self._merge(np.asarray(pending))
        self.flush_saves()
        return dict(self.state)
