#!/usr/bin/env python
"""Build the C++ MALIS core with ASan+UBSan and run the numpy cross-check
under the sanitizers (SURVEY.md §6 'race detection/sanitizers' row: the
reference has no native sanitizer story; here the native ext is validated
with -fsanitize=address,undefined in CI / pre-release).

Runs the check in a SUBPROCESS with the ASan runtime preloaded (the parent
process can't load an ASan .so into a non-ASan interpreter otherwise).
Exit 0 = built + cross-check passed with no sanitizer reports.
"""

import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SRC = os.path.join(REPO, "elektronn2_tpu", "malis", "malis_core.cpp")

CHILD = r"""
import ctypes, sys
import numpy as np
sys.path.insert(0, {repo!r})
lib = ctypes.CDLL({so!r})
lib.malis_pass.restype = None
lib.malis_pass.argtypes = [
    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
    ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_float)]

from elektronn2_tpu.malis import _malis_pass_np, default_nhood
rng = np.random.RandomState(0)
Z, X, Y = 6, 10, 10
nhood = default_nhood()
aff = rng.rand(nhood.shape[0], Z, X, Y).astype(np.float32)
seg = (rng.rand(Z, X, Y) * 4).astype(np.int32) + 1
for count_pos in (0, 1):
    out = np.zeros_like(aff)
    a = np.ascontiguousarray(aff); s = np.ascontiguousarray(seg)
    n = np.ascontiguousarray(nhood.astype(np.int32))
    lib.malis_pass(a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                   s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                   n.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                   nhood.shape[0], Z, X, Y, count_pos,
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    want = _malis_pass_np(aff, seg, nhood, bool(count_pos))
    assert np.allclose(out, want), "native != numpy under sanitizers"
print("sanitized cross-check OK")
"""


def main():
    with tempfile.TemporaryDirectory() as td:
        so = os.path.join(td, "_malis_asan.so")
        cmd = ["g++", "-O1", "-g", "-std=c++17", "-shared", "-fPIC",
               "-fsanitize=address,undefined",
               "-fno-sanitize-recover=undefined",
               "-fno-omit-frame-pointer",
               SRC, "-o", so]
        print("+", " ".join(cmd))
        subprocess.run(cmd, check=True)
        asan_rt = subprocess.run(
            ["g++", "-print-file-name=libasan.so"],
            capture_output=True, text=True).stdout.strip()
        env = dict(os.environ,
                   LD_PRELOAD=asan_rt,
                   ASAN_OPTIONS="detect_leaks=0",  # CPython itself 'leaks'
                   )
        child = CHILD.format(repo=REPO, so=so)
        r = subprocess.run([sys.executable, "-c", child], env=env)
        sys.exit(r.returncode)


if __name__ == "__main__":
    main()
