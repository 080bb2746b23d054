"""Generate a synthetic TESS sector ON DISK for the north-star run.

Writes SPOC-style light-curve FITS files (TIME/PDCSAP_FLUX/
PDCSAP_FLUX_ERR/QUALITY binary table) so the flagship sweep exercises
the real host pipeline: C++ threaded FITS parsing → padded host stacks →
double-buffered device transfer (``io/pipeline.py``) — the path the
reference walks one file at a time through astropy
(reference ``search.py:279-518`` + ``io/read.py``).

Signals are bit-identical to the in-memory generator previously used by
``tools/northstar_run.py``: batch ``ib`` derives from
``default_rng(1000 + ib)``, so recovery bookkeeping needs no headers.

Usage: python tools/make_sector.py [--dir DIR] [--batches N]
"""
import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N = 8192                     # TESS 2-min cadences (~11.4 d)
BATCH = 512
SECTOR = 99
NOISE = 2e-4
DEPTH = 3e-3
#: one shared time grid for the whole sector (a real sector's 2-min
#: targets share cadence midtimes); offset keeps bins off knife edges
T_OFFSET = 0.0011


def time_grid():
    return np.arange(N) * (2.0 / 60 / 24) + T_OFFSET


def batch_truth(ib):
    """(p_inj, t0_inj) for batch ``ib`` — MUST match generation."""
    rng = np.random.default_rng(1000 + ib)
    rng.standard_normal((BATCH, N))          # burn the noise draws
    p_inj = rng.uniform(1.2, 3.5, BATCH)
    t0_inj = rng.uniform(0, p_inj)
    return p_inj, t0_inj


def batch_flux(ib, t):
    rng = np.random.default_rng(1000 + ib)
    flux = 1.0 + NOISE * rng.standard_normal((BATCH, N))
    p_inj = rng.uniform(1.2, 3.5, BATCH)
    t0_inj = rng.uniform(0, p_inj)
    for i in range(BATCH):
        ph = np.mod(t - t0_inj[i] + p_inj[i] / 2, p_inj[i]) - p_inj[i] / 2
        flux[i, np.abs(ph) < 0.05] -= DEPTH
    return flux, p_inj


def file_path(directory, g):
    return os.path.join(
        directory, f"tess-synth-s{SECTOR:04d}-{g:016d}-s_lc.fits")


def ensure_sector(directory, batches, verbose=True):
    """Write any missing files; returns the ordered path list."""
    from lightkurve_tpu.io.fits import (BinTableHDU, HDUList, Header,
                                        PrimaryHDU, write_fits)
    os.makedirs(directory, exist_ok=True)
    t = time_grid()
    quality = np.zeros(N, dtype=np.int32)
    paths = []
    for ib in range(batches):
        batch_paths = [file_path(directory, ib * BATCH + i)
                       for i in range(BATCH)]
        paths += batch_paths
        if all(os.path.exists(p) for p in batch_paths):
            continue
        flux, p_inj = batch_flux(ib, t)
        for i, p in enumerate(batch_paths):
            g = ib * BATCH + i
            ph = Header({"TELESCOP": "TESS", "ORIGIN": "lightkurve_tpu",
                         "CREATOR": "make_sector.py",
                         "OBJECT": f"SYNTH {g}", "TICID": g,
                         "SECTOR": SECTOR, "MISSION": "TESS",
                         "TRUTHP": float(p_inj[i])})
            table = BinTableHDU(data={
                "TIME": t,
                "PDCSAP_FLUX": flux[i].astype(np.float32),
                "PDCSAP_FLUX_ERR": np.full(N, NOISE, dtype=np.float32),
                "QUALITY": quality,
            }, header=Header({"EXTNAME": "LIGHTCURVE",
                              "BJDREFI": 2457000, "BJDREFF": 0.0,
                              "TIMESYS": "TDB", "TUNIT2": "e-/s",
                              "TUNIT3": "e-/s"}))
            write_fits(HDUList([PrimaryHDU(header=ph), table]), p,
                       overwrite=True)
        if verbose:
            print(f"sector batch {ib}: wrote {BATCH} files", flush=True)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/northstar_sector")
    ap.add_argument("--batches", type=int, default=20)
    args = ap.parse_args()
    paths = ensure_sector(args.dir, args.batches)
    size = sum(os.path.getsize(p) for p in paths[:BATCH]) * args.batches
    print(f"{len(paths)} files in {args.dir} (~{size/1e9:.2f} GB)")


if __name__ == "__main__":
    main()
