"""Native (C++) host-side tools, loaded via ctypes.

The compute path is JAX/XLA/Pallas; these are the host-side artifact
builders where numpy is the bottleneck (banded DTW over all node
pairs). Libraries are compiled lazily with g++ and cached next to the
sources; every entry point has a pure-numpy fallback so the framework
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict = {}


def _build(name: str) -> str | None:
    src = os.path.join(_DIR, f"{name}.cpp")
    lib = os.path.join(_DIR, f"lib{name}.so")
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    for flags in (["-O3", "-fopenmp"], ["-O3"]):
        try:
            subprocess.run(
                ["g++", *flags, "-shared", "-fPIC", src, "-o", lib],
                check=True, capture_output=True, timeout=120)
            return lib
        except (subprocess.SubprocessError, FileNotFoundError):
            continue
    return None


def load(name: str) -> ctypes.CDLL | None:
    """Build-and-load libname.so; None when no toolchain is available."""
    with _LOCK:
        if name not in _LIBS:
            path = _build(name)
            _LIBS[name] = ctypes.CDLL(path) if path else None
        return _LIBS[name]


def native_banded_dtw_pairs(x: np.ndarray, ii: np.ndarray, jj: np.ndarray,
                            radius: int, order: int = 1) -> np.ndarray | None:
    """C++ all-pairs banded DTW; x: (days, T, N) float32 normalized.

    Returns (npairs,) costs, or None if the native library is
    unavailable (callers fall back to numpy).
    """
    lib = load("dtw")
    if lib is None:
        return None
    fn = lib.banded_dtw_pairs
    fn.restype = None
    x = np.ascontiguousarray(x, np.float32)
    ii = np.ascontiguousarray(ii, np.int32)
    jj = np.ascontiguousarray(jj, np.int32)
    out = np.zeros(ii.size, np.float64)
    days, t, n = x.shape
    fn(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       ctypes.c_int64(days), ctypes.c_int64(t), ctypes.c_int64(n),
       ii.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
       jj.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
       ctypes.c_int64(ii.size), ctypes.c_int64(radius),
       ctypes.c_int64(order),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
