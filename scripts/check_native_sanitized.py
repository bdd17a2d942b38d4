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
WARP_SRC = os.path.join(REPO, "elektronn2_tpu", "data", "warp_core.cpp")
KNOSSOS_SRC = os.path.join(REPO, "elektronn2_tpu", "data", "knossos_core.cpp")

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


WARP_CHILD = r"""
import ctypes, os, sys
import numpy as np
sys.path.insert(0, {repo!r})
os.environ["ELEKTRONN2_NO_NATIVE_WARP"] = "1"   # oracle = numpy path
import elektronn2_tpu.data._warp_native as wn
wn._SO = {so!r}
wn._lib = None
wn._build = lambda: None          # use the sanitized build as-is
from elektronn2_tpu.data import transformations as T
rng = np.random.RandomState(1)
src = rng.rand(2, 9, 11, 13).astype(np.float32)
lab = rng.randint(0, 7, size=(1, 9, 11, 13)).astype(np.int32)
coords = rng.uniform(-4, 16, size=(3, 5000))
a = wn.map_linear_f32(src, coords)
b = T.map_coordinates_linear(src, coords)
assert np.allclose(a, b, atol=2e-5), "warp native != numpy (sanitized)"
an = wn.map_nearest_i32(lab, coords)
bn = T.map_coordinates_nearest(lab, coords)
assert (an == bn).all(), "warp nearest != numpy (sanitized)"
print("warp sanitized cross-check OK")
"""


KNOSSOS_CHILD = r"""
import ctypes, os, sys, tempfile
import numpy as np
sys.path.insert(0, {repo!r})
import elektronn2_tpu.data._knossos_native as kn
kn._SO = {so!r}
kn._lib = None
kn._build = lambda: None          # use the sanitized build as-is

e = 8
rng = np.random.RandomState(2)
td = tempfile.mkdtemp()
paths, raws = [], []
for i in range(5):
    raw = (rng.rand(e, e, e) * 255).astype(np.uint8)   # (z, y, x) on disk
    p = os.path.join(td, "cube%d.raw" % i)
    raw.tofile(p)
    paths.append(p); raws.append(raw)
paths.append(os.path.join(td, "missing.raw"))          # zero-fill path
raws.append(np.zeros((e, e, e), np.uint8))

cubes = kn.load_cubes(paths, e, np.uint8, n_threads=3)
for got, raw in zip(cubes, raws):
    want = raw.transpose(0, 2, 1)                      # -> (z, x, y)
    assert (got == want).all(), "knossos load != numpy (sanitized)"

out = np.zeros((11, 13, 9), np.uint8)
# disjoint (grid-aligned) placements with clipping/overhang on every edge;
# real KNOSSOS cubes never overlap, and overlapping writes would be
# thread-order-dependent
offsets = [(-3, 0, 0), (-3, 8, 0), (5, 0, 0), (5, 8, 0), (-3, 0, 8),
           (5, 0, 8)]
want = np.zeros_like(out)
for raw, (dz, dx, dy) in zip(raws, offsets):
    cube = raw.transpose(0, 2, 1)
    z0, x0, y0 = max(dz, 0), max(dx, 0), max(dy, 0)
    z1 = min(dz + e, out.shape[0]); x1 = min(dx + e, out.shape[1])
    y1 = min(dy + e, out.shape[2])
    if z1 > z0 and x1 > x0 and y1 > y0:
        want[z0:z1, x0:x1, y0:y1] = cube[z0 - dz:z1 - dz, x0 - dx:x1 - dx,
                                         y0 - dy:y1 - dy]
kn.assemble(paths, offsets, e, out, n_threads=3)
assert (out == want).all(), "knossos assemble != numpy (sanitized)"

# error path: short file must raise, not overrun
short = os.path.join(td, "short.raw")
np.zeros(e ** 3 - 1, np.uint8).tofile(short)
try:
    kn.load_cubes([short], e, np.uint8)
except IOError:
    pass
else:
    raise AssertionError("short cube did not raise under sanitizers")
print("knossos sanitized cross-check OK")
"""


def main():
    with tempfile.TemporaryDirectory() as td:
        asan_rt = subprocess.run(
            ["g++", "-print-file-name=libasan.so"],
            capture_output=True, text=True).stdout.strip()
        env = dict(os.environ,
                   LD_PRELOAD=asan_rt,
                   ASAN_OPTIONS="detect_leaks=0",  # CPython itself 'leaks'
                   )
        for src, name, child_tpl in (
                (SRC, "_malis_asan.so", CHILD),
                (WARP_SRC, "_warp_asan.so", WARP_CHILD),
                (KNOSSOS_SRC, "_knossos_asan.so", KNOSSOS_CHILD)):
            so = os.path.join(td, name)
            cmd = ["g++", "-O1", "-g", "-std=c++17", "-shared", "-fPIC",
                   "-pthread",
                   "-fsanitize=address,undefined",
                   "-fno-sanitize-recover=undefined",
                   "-fno-omit-frame-pointer",
                   src, "-o", so]
            print("+", " ".join(cmd))
            subprocess.run(cmd, check=True)
            child = child_tpl.format(repo=REPO, so=so)
            r = subprocess.run([sys.executable, "-c", child], env=env)
            if r.returncode:
                sys.exit(r.returncode)
        sys.exit(0)


if __name__ == "__main__":
    main()
