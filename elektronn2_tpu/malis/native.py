"""ctypes loader/builder for the C++ MALIS core.

Reference: the reference builds ``_malis`` as an optional Cython/C++
extension in setup.py with graceful degradation; we compile
``malis_core.cpp`` on demand with g++ (cached .so next to the source) and
fall back to the numpy implementation if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np


_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "malis_core.cpp")
_SO = os.path.join(_HERE, "_malis_core.so")

_lib = None


def _build():
    from elektronn2_tpu.utils.native_build import build_shared
    build_shared(_SRC, _SO)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.malis_pass.restype = None
    lib.malis_pass.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def malis_pass(aff, seg, nhood, count_pos):
    """Native maximin pass: aff (E, Z, X, Y) float32, seg (Z, X, Y) int32,
    nhood (E, 3) int32 → per-edge pair-count weights, same shape as aff."""
    lib = get_lib()
    aff = np.ascontiguousarray(aff, np.float32)
    seg = np.ascontiguousarray(seg, np.int32)
    nhood = np.ascontiguousarray(nhood, np.int32)
    E = aff.shape[0]
    Z, X, Y = seg.shape
    out = np.zeros_like(aff)
    lib.malis_pass(
        aff.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        seg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nhood.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        E, Z, X, Y, int(bool(count_pos)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
