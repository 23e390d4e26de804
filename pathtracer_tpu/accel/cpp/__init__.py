"""ctypes binding for the native SAH BVH builder (lazy g++ compile)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_LIB = os.path.join(_DIR, "libbvh_builder.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB],
            check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.pt_build_bvh.restype = ctypes.c_int
    lib.pt_build_bvh.argtypes = [
        f32p, f32p, f32p, ctypes.c_int, ctypes.c_int,
        f32p, f32p, i32p, i32p, i32p, i32p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def build(p0: np.ndarray, p1: np.ndarray, p2: np.ndarray, max_leaf: int = 4):
    """Native SAH build. Returns (bounds_min, bounds_max, offset, n_prims,
    axis, order) numpy arrays (node arrays truncated to the real count)."""
    lib = _load()
    n = len(p0)
    cap = max(2 * n, 16)
    out_min = np.empty((cap, 3), np.float32)
    out_max = np.empty((cap, 3), np.float32)
    out_offset = np.empty(cap, np.int32)
    out_nprims = np.empty(cap, np.int32)
    out_axis = np.empty(cap, np.int32)
    out_order = np.empty(n, np.int32)
    m = lib.pt_build_bvh(
        np.ascontiguousarray(p0, np.float32),
        np.ascontiguousarray(p1, np.float32),
        np.ascontiguousarray(p2, np.float32),
        n, max_leaf, out_min, out_max, out_offset, out_nprims, out_axis,
        out_order)
    return (out_min[:m].copy(), out_max[:m].copy(), out_offset[:m].copy(),
            out_nprims[:m].copy(), out_axis[:m].copy(), out_order)
