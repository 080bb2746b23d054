"""Analytic roofline accounting for the hot kernels.

The reference ships no performance accounting at all (SURVEY.md §6: "no
benchmark numbers"); this module makes the TPU build's throughput
auditable.  Each ``*_cost`` function returns the kernel's analytic
algorithmic work — FLOPs actually required by the algorithm (not FLOPs
the compiler may or may not emit) and a LOWER BOUND on HBM bytes (each
logical operand streamed the minimum number of times; intermediates the
algorithm must materialize counted once for write + once per re-read).
``fractions_of_peak`` converts (cost, seconds, device) into

- ``mfu``        — model-FLOP utilization: flops / (dt × peak FLOP/s)
- ``membw_frac`` — bytes_min / (dt × peak HBM bytes/s)

Both are fractions of the chip's *published* peaks (see ``PEAKS``), so a
kernel near 1.0 on either axis is at the hardware roof for that axis;
small values on both indicate latency/overhead-bound dispatches.

Matmul FLOPs are compared against the bf16 MXU peak: jax's DEFAULT
matmul precision on TPU feeds the MXU one bf16 pass per operand, so the
f32-accumulate histogram matmuls run at the bf16 rate.
"""
from __future__ import annotations

import math

import numpy as np

__all__ = ["PEAKS", "device_peaks", "fractions_of_peak",
           "bls_shared_uniform_cost", "bls_shared_general_cost",
           "ls_fast_cost", "flatten_cost", "acf_windows_cost",
           "fastchi2_cost", "pld_photometry_cost"]

#: published per-chip peaks: bf16 MXU FLOP/s, f32 VPU-ish FLOP/s
#: (MXU f32 ≈ half the bf16 rate), HBM bytes/s
PEAKS = {
    # TPU v5e ("v5 lite"): 394 bf16 TFLOP/s, 819 GB/s HBM
    "v5e": {"bf16": 394e12, "f32": 197e12, "hbm": 819e9},
    # TPU v5p: 459 bf16 TFLOP/s, 2765 GB/s HBM
    "v5p": {"bf16": 459e12, "f32": 229e12, "hbm": 2765e9},
    # TPU v4: 275 bf16 TFLOP/s, 1228 GB/s
    "v4": {"bf16": 275e12, "f32": 137e12, "hbm": 1228e9},
    # TPU v6e (Trillium): 918 bf16 TFLOP/s, 1640 GB/s
    "v6e": {"bf16": 918e12, "f32": 459e12, "hbm": 1640e9},
    # host CPU fallback so CPU smoke runs emit well-formed (tiny) fracs
    "cpu": {"bf16": 1e12, "f32": 5e11, "hbm": 100e9},
}


def device_peaks(device=None):
    """Map a jax device (or its ``device_kind`` string) to a PEAKS row."""
    if device is None:
        import jax
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", str(device)).lower()
    for tag, key in (("v5 lite", "v5e"), ("v5e", "v5e"), ("v5p", "v5p"),
                     ("v5", "v5p"), ("v6", "v6e"), ("v4", "v4")):
        if tag in kind:
            return dict(PEAKS[key], kind=key)
    return dict(PEAKS["cpu"], kind="cpu")


def fractions_of_peak(cost, seconds, device=None, matmul_peak="bf16"):
    """{'mfu', 'membw_frac', ...} for an analytic ``cost`` dict run in
    ``seconds`` on ``device``."""
    peaks = device_peaks(device)
    out = {"flops": float(cost["flops"]),
           "hbm_bytes_min": float(cost["hbm_bytes"]),
           "mfu": round(cost["flops"] / (seconds * peaks[matmul_peak]), 4),
           "membw_frac": round(
               cost["hbm_bytes"] / (seconds * peaks["hbm"]), 4),
           "peak_basis": f"{peaks['kind']}:{matmul_peak}"}
    return out


def _bls_geometry(periods, durations, oversample):
    """Histogram geometry exactly as ``ops/bls.py`` computes it."""
    durations = np.asarray(durations, dtype=np.float64)
    d_phase = float(durations.min()) / oversample
    k_durs = [max(int(d / d_phase + 0.5), 1) for d in durations]
    k_max = max(k_durs)
    nb = np.ceil(np.asarray(periods, np.float64) / d_phase)
    tiles = np.maximum((nb + k_max - 1 + 127) // 128, 1).astype(np.int64)
    return d_phase, k_durs, tiles


def bls_shared_uniform_cost(n, B, periods, durations, oversample=10,
                            bucket=True, dtype_bytes=4):
    """Cost of ``bls_power_shared_batch`` on the uniform-weights
    count-histogram path (``ops/bls.py::_bls_shared_scan_uniform``).

    Dominant term: the fold matmul ``onehot(P, rows, n) @ Y(n, B)`` —
    2·n·B MACs per histogram row.  Rows per period follow the 128-row
    tile quantization (per-period tiles when ``bucket=True``, the max
    period's tiles otherwise).  Secondary terms: the count prefix
    reduction (2 passes of compare+add over the same rows, width 1) and
    the duration window scan (~8 flops per (row, curve, duration)).
    """
    _, k_durs, tiles = _bls_geometry(periods, durations, oversample)
    if not bucket:
        tiles = np.full_like(tiles, tiles.max())
    rows_total = float(tiles.sum() * 128)
    D = len(k_durs)
    fold = 2.0 * n * B * rows_total
    count = 2.0 * 2.0 * n * rows_total          # compare+add, wrap copy
    window = 8.0 * rows_total * B * D
    # HBM floor: Y streamed once per tile-row-block matmul is the
    # optimistic bound (stays resident) — count one full read of Y per
    # PERIOD CHUNK is implementation detail; the floor is one read of Y,
    # ids (P, n) int32 materialized once, csum (rows, B) written once and
    # re-read (D+1)× by the window scan, winner outputs negligible.
    P = len(np.asarray(periods))
    bytes_min = (n * B * dtype_bytes                 # Y read
                 + P * n * 4                         # fold ids
                 + rows_total * B * dtype_bytes * (1 + (D + 1)))
    return {"flops": fold + count + window, "hbm_bytes": bytes_min,
            "detail": {"fold_flops": fold, "window_flops": window,
                       "rows_total": rows_total}}


def bls_shared_general_cost(n, B, periods, durations, oversample=10,
                            bucket=False, dtype_bytes=4):
    """General weighted path (``_bls_shared_scan``): the fold matmul
    contracts ``(n, 2B)`` (w and w·y columns) — twice the uniform FLOPs —
    and the window scan reads B weight columns instead of one."""
    base = bls_shared_uniform_cost(n, B, periods, durations, oversample,
                                   bucket, dtype_bytes)
    rows_total = base["detail"]["rows_total"]
    D = len(np.asarray(durations))
    fold = 2.0 * base["detail"]["fold_flops"]
    window = 2.0 * base["detail"]["window_flops"]
    P = len(np.asarray(periods))
    bytes_min = (2 * n * B * dtype_bytes + P * n * 4
                 + rows_total * 2 * B * dtype_bytes * (1 + (D + 1)))
    return {"flops": fold + window, "hbm_bytes": bytes_min,
            "detail": {"fold_flops": fold, "window_flops": window,
                       "rows_total": rows_total}}


def _fft_flops(batch, length):
    """Complex-FFT flop count, the standard 5·N·log2(N) per transform."""
    return 5.0 * batch * length * math.log2(length)


def ls_fast_cost(n, B, Nf, oversampling=5, Mfft=4, fit_mean=True,
                 dtype_bytes=4):
    """Press-Rybicki fast LS (``ops/lombscargle.py::lombscargle_fast``):
    per trig_sum = extirpolation scatter ((M+1) segment-sums of ~6 flops
    per sample) + one complex FFT of the packed pair; 3 trig sums when
    fit_mean (h = wy, w on grid 1; w on grid 2) + O(Nf) postprocessing."""
    Nfft = 1 << int(Nf * oversampling - 1).bit_length()
    n_tsum = 3 if fit_mean else 2
    extirp = n_tsum * 2 * B * n * (Mfft + 1) * 6.0
    fft = n_tsum * _fft_flops(B, Nfft)
    post = 30.0 * B * Nf
    # grids written+read around each FFT (complex), power out
    bytes_min = (n_tsum * B * Nfft * 2 * dtype_bytes * 2
                 + B * Nf * dtype_bytes)
    return {"flops": extirp + fft + post, "hbm_bytes": bytes_min,
            "detail": {"Nfft": Nfft, "fft_flops": fft}}


def fastchi2_cost(n, B, Nf, nterms, oversampling=5, Mfft=4, fit_mean=True,
                  dtype_bytes=4):
    """FFT multi-term LS (``lombscargle_fastchi2``): 3k harmonic trig
    sums (each an extirpolation + FFT) + the per-frequency unrolled
    Cholesky quadform over M = 2k+fit_mean columns (~M³/3 + M² flops per
    frequency, all elementwise over Nf)."""
    k = nterms
    Nfft = 1 << int(Nf * oversampling - 1).bit_length()
    n_tsum = 3 * k
    extirp = n_tsum * 2 * B * n * (Mfft + 1) * 6.0
    fft = n_tsum * _fft_flops(B, Nfft)
    M = 2 * k + (1 if fit_mean else 0)
    chol = B * Nf * (M ** 3 / 3.0 + 3.0 * M ** 2)
    bytes_min = (n_tsum * B * Nfft * 2 * dtype_bytes * 2
                 + (M * (M + 1) / 2 + M) * B * Nf * dtype_bytes
                 + B * Nf * dtype_bytes)
    return {"flops": extirp + fft + chol, "hbm_bytes": bytes_min,
            "detail": {"Nfft": Nfft, "chol_flops": chol}}


def flatten_cost(n, B, window, niters=3, dtype_bytes=4):
    """SG flatten (``ops/detrend.py::flatten_batch``): per iteration one
    width-``window`` convolution (2·window flops/sample) plus the clip
    pass (~12 flops/sample)."""
    conv = niters * 2.0 * window * B * n
    clip = niters * 12.0 * B * n
    bytes_min = niters * 4 * B * n * dtype_bytes
    return {"flops": conv + clip, "hbm_bytes": bytes_min, "detail": {}}


def acf_windows_cost(B, n_centers, win, dtype_bytes=4):
    """Batched windowed autocorrelation (``ops/acf.py``): per (target,
    center) one forward + one inverse complex FFT at 2·win padding."""
    L = 1 << int(2 * win - 1).bit_length()
    fft = 2.0 * _fft_flops(B * n_centers, L)
    bytes_min = B * n_centers * L * 2 * dtype_bytes * 2
    return {"flops": fft, "hbm_bytes": bytes_min, "detail": {"L": L}}


def pld_photometry_cost(B, T, H, W, n_pca, dtype_bytes=4):
    """Aperture photometry + PLD correct per TPF stack: masked reductions
    over the cube (~4 flops/voxel), PCA via randomized range finding
    (~6·T·p·(p+q) matmul flops with p pixels, q=n_pca+8), and the
    regression solve (T·k² + k³ per target, k = n_pca+2)."""
    p = H * W
    vox = 4.0 * B * T * p
    q = n_pca + 8
    pca = 6.0 * B * T * p * q
    k = n_pca + 2
    solve = B * (2.0 * T * k * k + k ** 3 / 3.0)
    bytes_min = B * T * p * dtype_bytes * 3
    return {"flops": vox + pca + solve, "hbm_bytes": bytes_min,
            "detail": {}}
