"""ctypes loader for the native C++ reference ops (native/knn_cpu.cpp).

Builds the shared library on demand with g++ and caches the .so next to the
source. Used as the golden oracle in tests (and as a host-side fallback); the
production path is the Pallas/XLA implementation in ops/knn.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRCS = [os.path.join(_NATIVE_DIR, "knn_cpu.cpp"),
         os.path.join(_NATIVE_DIR, "pointcloud_cpu.cpp")]
_SO = os.path.join(_NATIVE_DIR, "libautopose_native.so")

_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *_SRCS, "-o", _SO],
        check=True,
    )


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or any(os.path.getmtime(_SO) < os.path.getmtime(s)
                       for s in _SRCS)):
            _build()
        lib = ctypes.CDLL(_SO)
    except (OSError, subprocess.CalledProcessError):
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.knn_search.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), i32p, f32p,
    ]
    lib.knn_search.restype = None
    lib.voxel_downsample.argtypes = [f32p, ctypes.c_int64, ctypes.c_float,
                                     f32p]
    lib.voxel_downsample.restype = ctypes.c_int64
    lib.radius_neighbor_counts.argtypes = [f32p, ctypes.c_int64,
                                           ctypes.c_float, i32p]
    lib.radius_neighbor_counts.restype = None
    lib.mean_knn_dists.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32, f32p]
    lib.mean_knn_dists.restype = None
    _lib = lib
    return _lib


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    """Exact CPU voxel-grid means (ordered by voxel id)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    points = np.ascontiguousarray(points, np.float32)
    out = np.empty_like(points)
    k = lib.voxel_downsample(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(points),
        voxel, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[:k]


def radius_neighbor_counts(points: np.ndarray, radius: float) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    points = np.ascontiguousarray(points, np.float32)
    out = np.empty(len(points), np.int32)
    lib.radius_neighbor_counts(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(points),
        radius, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def mean_knn_dists(points: np.ndarray, k: int) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    points = np.ascontiguousarray(points, np.float32)
    out = np.empty(len(points), np.float32)
    lib.mean_knn_dists(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(points),
        k, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def knn_search(query: np.ndarray, ref: np.ndarray, k: int = 1,
               ref_valid: Optional[np.ndarray] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact CPU knn: (indices (N, k), squared distances (N, k))."""
    lib = load()
    if lib is None:
        raise RuntimeError("native knn library unavailable")
    query = np.ascontiguousarray(query, np.float32)
    ref = np.ascontiguousarray(ref, np.float32)
    n, m = len(query), len(ref)
    idx = np.empty((n, k), np.int32)
    d2 = np.empty((n, k), np.float32)
    valid_ptr = None
    if ref_valid is not None:
        ref_valid = np.ascontiguousarray(ref_valid, np.uint8)
        valid_ptr = ref_valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    lib.knn_search(
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m,
        k, valid_ptr,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        d2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return idx, d2
