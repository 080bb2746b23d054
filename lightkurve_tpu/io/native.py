"""ctypes bindings for the C++ bulk FITS column loader (csrc/fits_reader.cpp).

The shared library is compiled on first use with g++ (cached next to the
package); if no compiler is available the pure-Python reader in
``lightkurve_tpu.io.fits`` is used instead — ``available()`` reports which
path is active.  The batch entry point fans nfiles across a native thread
pool, the host-side analogue of the reference's reliance on astropy's C
parser, feeding ``LightCurveStack`` construction.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

__all__ = ["available", "read_column", "read_batch", "table_rows"]

_LIB = None
_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc", "fits_reader.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "_fits_native.so")

_ERRORS = {
    -1: "cannot open file", -2: "out of memory", -3: "short read",
    -4: "truncated header", -5: "unsupported TFORM", -6: "row overflow",
    -7: "no matching BINTABLE", -8: "data out of bounds",
    -9: "unsupported column type", -10: "not a FITS file",
    -11: "column not found",
}


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    log.info("Building native FITS loader: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        try:
            if not os.path.exists(_SO) or (
                    os.path.exists(_SRC)
                    and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
                _build()
            lib = ctypes.CDLL(_SO)
        except Exception as e:  # no compiler / load failure → fallback
            log.warning("Native FITS loader unavailable (%s); using the "
                        "pure-Python reader.", e)
            _LIB = False
            return False
        lib.lk_read_column_f64.restype = ctypes.c_int
        lib.lk_read_column_f64.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long]
        lib.lk_read_batch_f64.restype = None
        lib.lk_read_batch_f64.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.lk_table_rows.restype = ctypes.c_long
        lib.lk_table_rows.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        _LIB = lib
        return lib


def available():
    return bool(_load())


def table_rows(path, extname=""):
    lib = _load()
    if not lib:
        raise RuntimeError("native loader unavailable")
    return int(lib.lk_table_rows(os.fspath(path).encode(),
                                 extname.encode()))


def read_column(path, column, extname="", max_rows=None):
    """Read one numeric column as float64 via the native parser."""
    lib = _load()
    if not lib:
        raise RuntimeError("native loader unavailable")
    if max_rows is None:
        max_rows = table_rows(path, extname)
        if max_rows < 0:
            raise IOError(f"{path}: {_ERRORS.get(max_rows, max_rows)}")
    out = np.empty(max_rows, dtype=np.float64)
    n = lib.lk_read_column_f64(
        os.fspath(path).encode(), extname.encode(), column.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_rows)
    if n < 0:
        raise IOError(f"{path}:{column}: {_ERRORS.get(n, n)}")
    return out[:n]


def read_batch(paths, column, stride=None, nthreads=None):
    """Parallel-load one column from many files → (nfiles, stride) f64
    (NaN-padded) plus per-file row counts."""
    lib = _load()
    if not lib:
        raise RuntimeError("native loader unavailable")
    paths = [os.fspath(p) for p in paths]
    if stride is None:
        stride = max(table_rows(p) for p in paths)
    if nthreads is None:
        nthreads = min(os.cpu_count() or 4, 16)
    n = len(paths)
    out = np.empty((n, stride), dtype=np.float64)
    nrows = np.empty(n, dtype=np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.lk_read_batch_f64(
        c_paths, n, column.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        stride, nrows.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        nthreads)
    return out, nrows
