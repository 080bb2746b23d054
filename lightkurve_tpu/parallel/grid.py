"""Mesh construction and sharded periodogram searches.

Design (SURVEY.md §7): the device mesh has two axes —

- ``targets``: data parallelism over light curves (each shard holds a
  slice of the (B, N) stack);
- ``grid``: the period/frequency axis of the search, sharded so each chip
  scans its slice of trial periods against its local targets.

Within-shard compute is the single-chip kernel (``ops.bls.bls_power`` /
``ops.lombscargle``) under ``vmap``; across shards there are no
collectives until the final per-target argmax, which gathers only
O(B · n_grid_shards) scalars over ICI.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["make_mesh", "sharded_bls", "sharded_lombscargle",
           "sharded_flatten", "sharded_pld_photometry",
           "best_candidates"]


def make_mesh(n_targets_axis=None, n_grid_axis=None, devices=None):
    """Create a (targets, grid) mesh over the available devices.

    Defaults: all devices on the ``grid`` axis (period sharding), since a
    single chip already batches thousands of targets.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_targets_axis is None and n_grid_axis is None:
        n_targets_axis, n_grid_axis = 1, n
    elif n_targets_axis is None:
        n_targets_axis = n // n_grid_axis
    elif n_grid_axis is None:
        n_grid_axis = n // n_targets_axis
    if n_targets_axis * n_grid_axis != n:
        raise ValueError(f"mesh {n_targets_axis}x{n_grid_axis} != {n} "
                         "devices")
    dev_array = np.asarray(devices).reshape(n_targets_axis, n_grid_axis)
    return Mesh(dev_array, axis_names=("targets", "grid"))


def _pad_to(arr, size, axis, pad_value):
    pad = size - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths, constant_values=pad_value)


def sharded_bls(time, flux, dy, periods, durations, oversample=10,
                objective="likelihood", mesh=None, chunk=16,
                shared_time=None, uniform_weights=None):
    """BLS over (B, N) stacks × (P,) periods, sharded over the mesh.

    Targets shard over the ``targets`` axis, the period grid over the
    ``grid`` axis.  Returns the same dict as ``ops.bls.bls_power`` with
    (B, P) arrays (padded periods trimmed).  When the batch shares one
    time grid each shard runs the MXU-matmul kernel.
    """
    from ..ops.bls import (bls_power, bls_power_shared_batch,
                           _detect_uniform_weights)
    if mesh is None:
        mesh = make_mesh()
    nt = mesh.shape["targets"]
    ng = mesh.shape["grid"]
    B, N = flux.shape
    Pn = periods.shape[0]
    B_pad = -(-B // nt) * nt
    P_pad = -(-Pn // ng) * ng
    # uniform-weight detection must happen BEFORE shard_map (dy is traced
    # inside); only host arrays are inspected — pass uniform_weights=True
    # explicitly for device-resident constant-weight stacks
    if uniform_weights is None:
        uniform_weights = (_detect_uniform_weights(dy)
                           if dy is None or isinstance(dy, np.ndarray)
                           else False)
    # shared-time detection must run BEFORE padding: constant-filled
    # padding rows would make the check false and silently drop the
    # MXU fast path whenever B is not a multiple of the targets axis
    if shared_time is None:
        shared_time = bool(jnp.all(time == time[0:1]))
    # pad time by REPEATING the first row so the padded array still
    # satisfies the shared-time property the kernels rely on
    time = jnp.concatenate(
        [time, jnp.broadcast_to(time[0:1], (B_pad - B, N))], axis=0) \
        if B_pad > B else time
    flux = _pad_to(flux, B_pad, 0, 0.0)
    dy = _pad_to(dy, B_pad, 0, np.inf)
    periods_p = _pad_to(periods, P_pad, 0, float(periods[-1]))

    # grid geometry must be static under tracing: compute globally here
    d_phase = float(np.min(np.asarray(durations))) / oversample
    nbins = int(np.ceil(float(np.max(np.asarray(periods))) / d_phase))
    t0_count = nbins + 1

    # inside shard_map the arrays are tracers, so the kernel cannot see
    # which platform its shard runs on — pin it from the mesh devices
    # (the axon plugin makes default_backend() say 'tpu' even for CPU
    # meshes, which would auto-select the Pallas window kernel there)
    platform = mesh.devices.flat[0].platform

    def local(t, y, d, p):
        if shared_time:
            return bls_power_shared_batch(
                t[0], y, d, p, durations, oversample=oversample,
                objective=objective, nbins=nbins, d_phase=d_phase,
                uniform_weights=uniform_weights, platform=platform)
        fn = jax.vmap(lambda tt, yy, dd: bls_power(
            tt, yy, dd, p, durations, oversample=oversample,
            objective=objective, chunk=chunk, t0_count=t0_count,
            d_phase=d_phase))
        return fn(t, y, d)

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("targets", None), P("targets", None),
                  P("targets", None), P("grid")),
        out_specs={k: P("targets", "grid") for k in
                   ("power", "depth", "depth_err", "depth_snr",
                    "log_likelihood", "duration", "transit_time",
                    "period")},
    )
    out = shard(time, flux, dy, periods_p)
    return {k: v[:B, :Pn] for k, v in out.items()}


def sharded_lombscargle(time_row, flux, dy, f0, df, Nf, mesh=None,
                        normalization="psd"):
    """Batched fast LS with targets sharded over ALL devices.

    The frequency grid is replicated (the extirpolation FFT is global over
    the grid); each shard transforms its slice of the target batch.
    """
    from ..ops.lombscargle import lombscargle_fast
    if mesh is None:
        mesh = make_mesh(n_targets_axis=len(jax.devices()), n_grid_axis=1)
    nt = mesh.shape["targets"]
    B = flux.shape[0]
    B_pad = -(-B // nt) * nt
    flux = _pad_to(flux, B_pad, 0, 0.0)
    dy = _pad_to(dy, B_pad, 0, np.inf)

    t_host = np.asarray(time_row, dtype=np.float64)

    def local(y, d):
        return lombscargle_fast(t_host, y, f0, df, Nf, dy=d,
                                normalization=normalization)

    shard = jax.shard_map(local, mesh=mesh,
                          in_specs=(P("targets", None), P("targets", None)),
                          out_specs=P("targets", None))
    return shard(flux, dy)[:B]


def sharded_flatten(time, flux, mask, window_length=101, polyorder=2,
                    break_tolerance=5, niters=3, sigma=3, mesh=None):
    """Batched SG flatten with targets sharded over ALL devices.

    Purely data-parallel (no collectives): each shard runs the
    one-program batched flatten on its slice of the (B, N) stack.
    Returns (trend, valid) as (B, N) arrays.
    """
    from ..ops.detrend import flatten_batch
    from ..ops.savgol import savgol_design_matrix
    if mesh is None:
        mesh = make_mesh(n_targets_axis=len(jax.devices()), n_grid_axis=1)
    nt = mesh.shape["targets"]
    B = flux.shape[0]
    B_pad = -(-B // nt) * nt
    time = _pad_to(time, B_pad, 0, 1.0)
    flux_p = _pad_to(flux, B_pad, 0, 1.0)
    mask_p = _pad_to(mask, B_pad, 0, True)
    H = jnp.asarray(savgol_design_matrix(
        window_length, min(polyorder, window_length - 1)), flux.dtype)
    bt = jnp.asarray(np.nan if break_tolerance is None
                     else float(break_tolerance), flux.dtype)
    sg = jnp.asarray(float(sigma), flux.dtype)

    def local(t, y, m):
        return flatten_batch(t, y, m, H, bt, sg, niters=int(niters))

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("targets"), P("targets"), P("targets")),
        out_specs=(P("targets"), P("targets")))
    trend, valid = shard(time, flux_p, mask_p)
    return trend[:B], valid[:B]


def sharded_pld_photometry(tpf_stack, pld_order=1, n_pca_terms=3,
                           sigma=5.0, niters=5, mesh=None):
    """Aperture photometry + batched PLD, targets sharded over ALL
    devices (BASELINE config 5 at sector scale).

    Each shard runs the fully-vmapped single-chip pipeline
    (``TPFStack.extract_aperture_photometry`` + ``pld_correct``) on its
    slice of targets; there are no cross-shard collectives — target
    batches are embarrassingly parallel.  Returns (corrected flux,
    flux_err, mask) as (B, T) arrays.
    """
    from ..batch import TPFStack
    if mesh is None:
        mesh = make_mesh(n_targets_axis=len(jax.devices()), n_grid_axis=1)
    nt = mesh.shape["targets"]
    B = tpf_stack.flux.shape[0]
    B_pad = -(-B // nt) * nt
    flux = _pad_to(tpf_stack.flux, B_pad, 0, 1.0)
    err = _pad_to(tpf_stack.flux_err, B_pad, 0, 1.0)
    time = _pad_to(tpf_stack.time, B_pad, 0, 1.0)
    ap = _pad_to(tpf_stack.aperture, B_pad, 0, True)

    def local(f, e, t, a):
        shard = TPFStack(flux=f, flux_err=e, time=t, aperture=a)
        out = shard.pld_correct(pld_order=pld_order,
                                n_pca_terms=n_pca_terms, sigma=sigma,
                                niters=niters)
        return out.flux, out.flux_err, out.mask

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("targets"), P("targets"), P("targets"), P("targets")),
        out_specs=(P("targets"), P("targets"), P("targets")))
    f, e, m = shard(flux, err, time, ap)
    return f[:B], e[:B], m[:B]


def best_candidates(power, periods, k=1):
    """Per-target top-k periods from a (B, P) power array (host-side)."""
    power = np.asarray(power)
    idx = np.argsort(power, axis=1)[:, ::-1][:, :k]
    return np.asarray(periods)[idx], np.take_along_axis(power, idx, axis=1)
