"""Native runtime bindings (C++ PLY codec + Morton kNN) via ctypes.

The library is optional: every entry point has a pure-Python fallback
(data/ply.py, ops/knn.py). Build with ``make -C skelsplat_tpu/native`` —
the loader also builds on first use when a compiler is available.

API:
  read_xyz(path)                 → (N,3) float32 (native or fallback)
  read_xyz_batch(paths, max_pts) → (F, max_pts, 3), (F,) counts
  knn_mean3_sq(points)           → (N,) mean of squared 3-NN distances
  available()                    → bool
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libskelsplat_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.skel_read_ply_xyz.restype = ctypes.c_int64
    lib.skel_read_ply_xyz.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.skel_read_ply_xyz_batch.restype = None
    lib.skel_read_ply_xyz_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
    lib.skel_knn_mean3_sq.restype = None
    lib.skel_knn_mean3_sq.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def read_xyz(path: str, max_pts: int = 4096) -> np.ndarray:
    lib = _load()
    if lib is None:
        from skelsplat_tpu.data import ply
        return ply.read_xyz(path)
    out = np.empty((max_pts, 3), np.float32)
    n = lib.skel_read_ply_xyz(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_pts)
    if n < 0:
        from skelsplat_tpu.data import ply
        return ply.read_xyz(path)   # fallback handles exotic headers
    return out[:n].copy()


def read_xyz_batch(paths: list[str], max_pts: int = 64,
                   n_threads: int = 0):
    """Threaded bulk read — the eval sweep's hot path (thousands of
    ~20-point clouds). Returns ((F, max_pts, 3) xyz, (F,) counts)."""
    lib = _load()
    if lib is None:
        from skelsplat_tpu.data import ply
        out = np.zeros((len(paths), max_pts, 3), np.float32)
        counts = np.zeros(len(paths), np.int64)
        for i, p in enumerate(paths):
            xyz = ply.read_xyz(p)
            counts[i] = xyz.shape[0]
            out[i, :xyz.shape[0]] = xyz
        return out, counts
    blob = b"".join(p.encode() + b"\x00" for p in paths)
    out = np.zeros((len(paths), max_pts, 3), np.float32)
    counts = np.zeros(len(paths), np.int64)
    lib.skel_read_ply_xyz_batch(
        blob, len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_pts,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_threads)
    return out, counts


def knn_mean3_sq(points: np.ndarray) -> np.ndarray:
    """simple-knn distCUDA2 parity (Morton-boxed exact 3-NN)."""
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    if lib is None:
        from skelsplat_tpu.ops.knn import dist2_mean3nn
        return np.asarray(dist2_mean3nn(pts))
    out = np.empty(pts.shape[0], np.float32)
    lib.skel_knn_mean3_sq(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pts.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
