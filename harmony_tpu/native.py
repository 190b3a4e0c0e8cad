"""Loader for the native host-side kernels (``native/scale_csc.cpp``).

Builds the shared library with the system C++ toolchain on first use and
binds it via ctypes (no pybind11 in this environment). Falls back to the
NumPy implementations transparently when no toolchain is available, so the
package stays pure-Python-functional.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "scale_csc.cpp",
)


def _build_dir() -> str:
    d = os.environ.get(
        "HARMONY_TPU_NATIVE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "harmony_tpu"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None on failure."""
    global _LIB
    if _LIB is not None:
        return _LIB if _LIB is not False else None
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB if _LIB is not False else None
        if os.environ.get("HARMONY_TPU_NO_NATIVE") or not os.path.exists(_SRC):
            _LIB = False
            return None
        so_path = os.path.join(_build_dir(), "libharmony_native.so")
        try:
            if not os.path.exists(so_path) or os.path.getmtime(
                so_path
            ) < os.path.getmtime(_SRC):
                cmd = [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    _SRC, "-o", so_path,
                ]
                subprocess.run(
                    cmd, check=True, capture_output=True, timeout=120
                )
            lib = ctypes.CDLL(so_path)
            i64p = ctypes.POINTER(ctypes.c_int64)
            f64p = ctypes.POINTER(ctypes.c_double)
            lib.csc_scale_rows.argtypes = [
                f64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_double, f64p,
            ]
            lib.csc_row_stats.argtypes = [
                f64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64, f64p, f64p,
            ]
            lib.csc_log_normalize.argtypes = [
                f64p, i64p, ctypes.c_int64, ctypes.c_double,
            ]
            _LIB = lib
            return lib
        except Exception:
            _LIB = False
            return None


def available() -> bool:
    return _load() is not None


def _as_c(arr, dtype):
    out = np.ascontiguousarray(arr, dtype=dtype)
    return out, out.ctypes.data_as(
        ctypes.POINTER(
            ctypes.c_double if dtype == np.float64 else ctypes.c_int64
        )
    )


def csc_scale_rows(
    data: np.ndarray,
    indices: np.ndarray,
    indptr: np.ndarray,
    nrow: int,
    ncol: int,
    thresh: float,
) -> Optional[np.ndarray]:
    """Native scaleRows_dgc; returns None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    x, xp = _as_c(data, np.float64)
    i, ip = _as_c(indices, np.int64)
    p, pp = _as_c(indptr, np.int64)
    res = np.empty((nrow, ncol), dtype=np.float64)
    lib.csc_scale_rows(
        xp, ip, pp, nrow, ncol, float(thresh),
        res.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return res


def csc_row_stats(data, indices, indptr, nrow, ncol):
    lib = _load()
    if lib is None:
        return None
    x, xp = _as_c(data, np.float64)
    i, ip = _as_c(indices, np.int64)
    p, pp = _as_c(indptr, np.int64)
    mean = np.empty(nrow, dtype=np.float64)
    sd = np.empty(nrow, dtype=np.float64)
    lib.csc_row_stats(
        xp, ip, pp, nrow, ncol,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        sd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return mean, sd


def csc_log_normalize(data, indptr, ncol, scale=1e4):
    """In-place library-size log1p normalisation; returns the (possibly
    copied) data array, or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    x, xp = _as_c(data, np.float64)
    p, pp = _as_c(indptr, np.int64)
    lib.csc_log_normalize(xp, pp, ncol, float(scale))
    return x
