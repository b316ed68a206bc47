"""JIT-built native (C++) host kernels with ctypes bindings.

Mirrors the reference's JIT-extension pattern (gridencoder/backend.py:43-55:
compile on first import, cache the artifact) with g++ instead of nvcc. If no
toolchain is available the callers fall back to the numpy implementations, so
the native layer is an accelerator, never a hard dependency.
"""

import ctypes
import os
import subprocess
import hashlib

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rangeview.cpp")
_lib = None
_tried = False


def _build_and_load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha1(f.read()).hexdigest()[:12]
        so_path = os.path.join(_DIR, f"_rangeview_{tag}.so")
        if not os.path.exists(so_path):
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-o", so_path, _SRC,
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        lib.lidar_to_pano_with_intensities.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        lib.pano_to_lidar_with_intensities.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.pano_to_lidar_with_intensities.restype = ctypes.c_int64
        _lib = lib
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        _lib = None
    return _lib


def available() -> bool:
    return _build_and_load() is not None


def lidar_to_pano_with_intensities(points, lidar_H, lidar_W, lidar_K, max_depth=80):
    """Native scatter-min projection; same contract as convert.py's version."""
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native rangeview library unavailable")
    pts = np.ascontiguousarray(points, dtype=np.float32)
    pano = np.zeros((lidar_H, lidar_W), np.float64)
    inten = np.zeros((lidar_H, lidar_W), np.float64)
    fov_up, fov = lidar_K
    lib.lidar_to_pano_with_intensities(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(pts)),
        lidar_H, lidar_W,
        ctypes.c_double(fov_up), ctypes.c_double(fov), ctypes.c_double(max_depth),
        pano.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        inten.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return pano, inten


def pano_to_lidar_with_intensities(pano, intensities, lidar_K):
    """Native inverse projection with compaction; returns [N, 4] float32."""
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native rangeview library unavailable")
    pano = np.ascontiguousarray(pano, dtype=np.float64)
    inten = np.ascontiguousarray(intensities, dtype=np.float64)
    H, W = pano.shape
    out = np.empty((H * W, 4), np.float32)
    fov_up, fov = lidar_K
    n = lib.pano_to_lidar_with_intensities(
        pano.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        inten.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        H, W, ctypes.c_double(fov_up), ctypes.c_double(fov),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out[:n].copy()
