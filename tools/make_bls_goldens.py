"""Generate the committed golden arrays for the BLS oracle parity tests.

Run from the repo root:  python tools/make_bls_goldens.py
Writes tests/golden/bls_golden.npz with the numpy oracle's outputs on
the five parity configs (both edge modes).  Commit the result; the test
``test_oracle_matches_committed_goldens`` pins the oracle to it.
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np  # noqa: E402

from oracles import bls_binned_reference  # noqa: E402
from test_astropy_oracle_parity import CFGS, KEYS  # noqa: E402


def main():
    out = {}
    for name, c in CFGS.items():
        for wrap in (True, False):
            ref = bls_binned_reference(
                c["t"], c["y"], c["dy"], c["periods"], c["durations"],
                oversample=c["oversample"], wrap=wrap)
            tag = f"{name}_{'wrap' if wrap else 'astropy'}"
            for k in KEYS + ("transit_time",):
                out[f"{tag}_{k}"] = np.asarray(ref[k], dtype=np.float64)
    path = os.path.join(ROOT, "tests", "golden", "bls_golden.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {len(out)} arrays")


if __name__ == "__main__":
    main()
