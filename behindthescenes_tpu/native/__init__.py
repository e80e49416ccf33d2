"""Native (C++) host-side kernels with ctypes bindings.

The TPU compute path is JAX/XLA/Pallas; these cover host-side data-loading
hot loops. Libraries build lazily with g++ on first use and are cached next
to the sources; a numpy fallback always exists.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _load():
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        so_path = os.path.join(_DIR, "libbts_native.so")
        src = os.path.join(_DIR, "velodyne_depth.cpp")
        try:
            if (not os.path.exists(so_path)
                    or os.path.getmtime(so_path) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so_path, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so_path)
            lib.project_velodyne_depth.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
            _LIB = lib
        except Exception:
            _BUILD_FAILED = True
            _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def project_velodyne_depth(points: np.ndarray, p_mat: np.ndarray,
                           size) -> np.ndarray:
    """Sparse depth map from velodyne points (per-pixel min depth).

    points: (n, 4) float32 [x, y, z, *]; p_mat: (3, 4); size: (h, w).
    Returns (h, w) float32. Raises RuntimeError if the native lib is
    unavailable (callers fall back to the numpy path).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points, dtype=np.float32)
    pm = np.ascontiguousarray(p_mat, dtype=np.float32)
    h, w = size
    out = np.zeros((h, w), dtype=np.float32)
    lib.project_velodyne_depth(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pts.shape[0],
        pm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
