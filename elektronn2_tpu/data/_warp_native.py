"""ctypes loader/builder for the C++ warp gather core.

Reference: the reference's ``map_coordinates_{linear,nearest}`` are numba
``@jit(nopython=True)`` inner loops (native machine code at runtime). Same
policy here as ``malis/native.py``: compile ``warp_core.cpp`` with g++ on
first use (cached .so next to the source), fall back to the vectorised
numpy implementation when no compiler is available. The numpy path remains
the semantics oracle (tests assert exact agreement).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np


_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "warp_core.cpp")
_SO = os.path.join(_HERE, "_warp_core.so")

_lib = None


def _build():
    from elektronn2_tpu.utils.native_build import build_shared
    build_shared(_SRC, _SO, extra_flags=("-pthread",))


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    i64 = ctypes.c_int64
    lib.warp_map_linear_f32.restype = None
    lib.warp_map_linear_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), i64, i64, i64, i64,
        ctypes.POINTER(ctypes.c_double), i64,
        ctypes.POINTER(ctypes.c_float)]
    lib.warp_map_nearest_i32.restype = None
    lib.warp_map_nearest_i32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), i64, i64, i64, i64,
        ctypes.POINTER(ctypes.c_double), i64,
        ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def map_linear_f32(src, coords):
    """src (F, Z, X, Y) float32, coords (3, N) → (F, N) float32."""
    lib = get_lib()
    src = np.ascontiguousarray(src, np.float32)
    coords = np.ascontiguousarray(coords, np.float64)
    F, Z, X, Y = src.shape
    N = coords.shape[1]
    out = np.empty((F, N), np.float32)
    lib.warp_map_linear_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        F, Z, X, Y,
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), N,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def map_nearest_i32(src, coords):
    """src (F, Z, X, Y) int32, coords (3, N) → (F, N) int32."""
    lib = get_lib()
    src = np.ascontiguousarray(src, np.int32)
    coords = np.ascontiguousarray(coords, np.float64)
    F, Z, X, Y = src.shape
    N = coords.shape[1]
    out = np.empty((F, N), np.int32)
    lib.warp_map_nearest_i32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        F, Z, X, Y,
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), N,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
