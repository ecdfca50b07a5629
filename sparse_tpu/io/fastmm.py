"""ctypes binding for the native MatrixMarket body parser (_fastmm.cpp).

Compiled lazily with the ambient g++ and cached next to the source; every
entry point degrades to the NumPy path if the toolchain or the shared object
is unavailable, so the library never hard-depends on native code.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "_fastmm.cpp"
_SO = _HERE / "_fastmm.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(str(_SO))
            lib.parse_mm_coordinate.restype = ctypes.c_int64
            lib.parse_mm_array.restype = ctypes.c_int64
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def parse_coordinate(body: bytes, nnz: int, pattern: bool):
    """Parse a coordinate body natively; returns (rows, cols, vals) 0-based
    or None when the native parser is unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows = np.empty(nnz, np.int64)
    cols = np.empty(nnz, np.int64)
    vals = np.empty(nnz, np.float64)
    buf = np.frombuffer(body, np.uint8)
    got = lib.parse_mm_coordinate(
        ctypes.c_void_p(buf.ctypes.data),
        ctypes.c_int64(len(body)),
        ctypes.c_int64(nnz),
        ctypes.c_void_p(rows.ctypes.data),
        ctypes.c_void_p(cols.ctypes.data),
        ctypes.c_void_p(vals.ctypes.data),
        ctypes.c_int(1 if pattern else 0),
    )
    if got != nnz:
        raise ValueError(
            f"MatrixMarket body malformed: parsed {got} of {nnz} entries"
        )
    return rows, cols, vals


def parse_array(body: bytes, count: int):
    """Parse an array body natively; returns values or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    vals = np.empty(count, np.float64)
    buf = np.frombuffer(body, np.uint8)
    got = lib.parse_mm_array(
        ctypes.c_void_p(buf.ctypes.data),
        ctypes.c_int64(len(body)),
        ctypes.c_int64(count),
        ctypes.c_void_p(vals.ctypes.data),
    )
    if got != count:
        raise ValueError(
            f"MatrixMarket array body malformed: parsed {got} of {count}"
        )
    return vals
