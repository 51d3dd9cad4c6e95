"""ctypes binding for the native ESDF builder (runtime/esdf_builder.cpp),
compiled on demand with g++ and cached next to the source.

Produces the obstacle_distance grid layout the reference consumes
(distances [m] + nearest-obstacle flat index x + y*W,
obstacle_distance_interface.hpp / optimizer.cpp:702): the host-side
data-loading layer for scenario generation. Falls back to a NumPy
brute-force transform when no compiler is available.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "esdf_builder.cpp")
_LIB = os.path.join(_HERE, "libesdf.so")
_lock = threading.Lock()
_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.esdf_build.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.esdf_build.restype = None
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _load_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def build_esdf(occupancy: np.ndarray, resolution: float, empty_value: float = 1e3):
    """Exact EDT from an occupancy grid (nonzero == obstacle).

    Returns (distances (H, W) float32 [m], indexes (H, W) int32 flat
    x + y*W). Uses the native O(HW) builder when available, else the NumPy
    brute force (O(HW * n_obstacles))."""
    occ = np.ascontiguousarray(occupancy != 0, dtype=np.uint8)
    h, w = occ.shape
    lib = _load()
    if lib is not None:
        dist = np.empty((h, w), np.float32)
        idx = np.empty((h, w), np.int32)
        lib.esdf_build(
            occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            np.int32(h),
            np.int32(w),
            np.float32(resolution),
            np.float32(empty_value),
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return dist, idx
    return brute_force_esdf(occ, resolution, empty_value)


def brute_force_esdf(occupancy: np.ndarray, resolution: float, empty_value: float = 1e3):
    """Reference NumPy implementation (also the test oracle for the native
    builder)."""
    occ = occupancy != 0
    h, w = occ.shape
    ys, xs = np.nonzero(occ)
    if len(xs) == 0:
        return np.full((h, w), empty_value, np.float32), np.zeros((h, w), np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    d2 = (xx[..., None] - xs[None, None, :]) ** 2 + (yy[..., None] - ys[None, None, :]) ** 2
    nearest = np.argmin(d2, axis=-1)
    dist = (np.sqrt(np.take_along_axis(d2, nearest[..., None], -1)[..., 0]) * resolution).astype(
        np.float32
    )
    idx = (xs[nearest] + ys[nearest] * w).astype(np.int32)
    return dist, idx
