"""Synthetic data generators shared across tests (mirrors the role of the
reference's tests/data/synthetic fixtures, test_synthetic_data.py)."""
import numpy as np

from lightkurve_tpu.io.fits import (BinTableHDU, Header, HDUList, ImageHDU,
                                    PrimaryHDU)
from lightkurve_tpu.targetpixelfile import KeplerTargetPixelFile, \
    TessTargetPixelFile


def gaussian_star(shape, col, row, flux, sigma=1.2):
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    img = np.exp(-((xx - col) ** 2 + (yy - row) ** 2) / (2 * sigma ** 2))
    return flux * img / (2 * np.pi * sigma ** 2)


def make_synthetic_tpf(n_cadences=200, shape=(9, 9), mission="TESS",
                       signal=None, motion=None, noise=1.0,
                       star_flux=5000.0, background=10.0, seed=0):
    """Build a TPF with an injected signal and/or centroid motion.

    ``signal(t)`` multiplies the star flux; ``motion(t)`` returns
    (dcol, drow) arrays.  Ground truth is stored in ``meta``.
    """
    rng = np.random.default_rng(seed)
    h, w = shape
    t = (1500.0 if mission == "TESS" else 500.0) + \
        np.arange(n_cadences) * 0.02
    sig = signal(t) if signal is not None else np.ones(n_cadences)
    if motion is not None:
        dcol, drow = motion(t)
    else:
        dcol = np.zeros(n_cadences)
        drow = np.zeros(n_cadences)
    c0, r0 = (w - 1) / 2, (h - 1) / 2
    flux = np.empty((n_cadences, h, w), dtype=np.float64)
    for i in range(n_cadences):
        img = gaussian_star(shape, c0 + dcol[i], r0 + drow[i],
                            star_flux * sig[i])
        img += background
        img += noise * rng.standard_normal((h, w))
        flux[i] = img
    flux_err = np.full_like(flux, noise)

    columns = {
        "TIME": t,
        "CADENCENO": np.arange(n_cadences, dtype=np.int32),
        "FLUX": flux.astype(np.float32),
        "FLUX_ERR": flux_err.astype(np.float32),
        "QUALITY": np.zeros(n_cadences, dtype=np.int32),
        "POS_CORR1": dcol.astype(np.float32),
        "POS_CORR2": drow.astype(np.float32),
    }
    meta = {
        "OBJECT": "synthetic", "TARGETID": 999,
        "MISSION": mission, "TELESCOP": mission,
        "RA_OBJ": 80.0, "DEC_OBJ": -70.0,
        "TRUE_STAR_COL": c0, "TRUE_STAR_ROW": r0,
        "TRUE_FLUX": star_flux,
    }
    if mission == "K2":
        meta["MISSION"] = "K2"
        meta["CHANNEL"] = 42
        meta["CAMPAIGN"] = 4
    ext_header = {"1CRV5P": 100, "2CRV5P": 200,
                  "BJDREFI": 2457000 if mission == "TESS" else 2454833,
                  "1CRPX5": (w + 1) / 2, "2CRPX5": (h + 1) / 2,
                  "1CRVL5": 80.0, "2CRVL5": -70.0,
                  "1CDLT5": -21.0 / 3600, "2CDLT5": 21.0 / 3600,
                  "11PC5": 1.0, "12PC5": 0.0, "21PC5": 0.0, "22PC5": 1.0}
    cls = TessTargetPixelFile if mission == "TESS" else KeplerTargetPixelFile
    tpf = cls._from_arrays(columns, meta, ext_header=ext_header,
                           quality_bitmask="none")
    # pipeline aperture: central 3x3
    ap = np.zeros(shape, dtype=np.int32)
    ap[int(r0) - 1: int(r0) + 2, int(c0) - 1: int(c0) + 2] = 3
    tpf._aperture = ap
    return tpf


def transit_signal(period, t0, duration, depth):
    def f(t):
        hp = period / 2
        in_t = np.abs(np.mod(t - t0 + hp, period) - hp) < duration / 2
        return np.where(in_t, 1.0 - depth, 1.0)
    return f


def sine_signal(period, amplitude):
    def f(t):
        return 1.0 + amplitude * np.sin(2 * np.pi * t / period)
    return f


def sawtooth_motion(period=0.25, amp_col=0.4, amp_row=0.2):
    def f(t):
        saw = 2 * ((t / period) % 1.0) - 1.0
        return amp_col * saw, amp_row * saw
    return f
