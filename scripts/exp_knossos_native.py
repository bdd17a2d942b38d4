"""Measure the native C++ KNOSSOS cube core vs the numpy path.

Builds a synthetic cube tree in /tmp (default 4x4x4 cubes of 128^3 uint8 =
128 MiB), then times whole-volume and slab-shaped ``KnossosArray`` reads
with a fresh (cold-cache) array per repeat. OS page cache is warm after the
first touch, so the numbers isolate the per-cube CPU cost (read syscall +
(z,y,x)->(z,x,y) transpose + scatter) -- which is exactly what the native
core moves out of Python. On multi-core hosts the native path additionally
parallelises across cubes (this sandbox has 1 core; scaling noted in
BASELINE.md).

Usage: python scripts/exp_knossos_native.py [--cubes 4] [--edge 128]
"""

import argparse
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from elektronn2_tpu.data import KnossosArray                     # noqa: E402
from elektronn2_tpu.data.knossos_array import save_knossos       # noqa: E402


def timeit(fn, repeats=5):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cubes", type=int, default=4)
    ap.add_argument("--edge", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    n, e = args.cubes, args.edge
    Z = X = Y = n * e
    rng = np.random.RandomState(0)
    vol = rng.randint(0, 256, (Z, X, Y), dtype=np.uint8)
    root = tempfile.mkdtemp(prefix="knossos_bench_")
    try:
        save_knossos(vol, root, exp_name="bench", cube_edge=e)
        mb = vol.nbytes / 2**20
        print(f"dataset: {n}^3 cubes of {e}^3 u8 = {mb:.0f} MiB at {root}")

        results = {}
        for native in (False, True):
            tag = "native" if native else "numpy "

            def whole():
                ka = KnossosArray(root, cube_edge=e, native=native,
                                  max_ram=4096, n_preload=0)
                out = ka[:, :, :]
                assert out[0, 0, 0] == vol[0, 0, 0]

            def slab():
                ka = KnossosArray(root, cube_edge=e, native=native,
                                  max_ram=4096, n_preload=0)
                out = ka[: min(96, Z), :, :]
                assert out.shape[0] == min(96, Z)

            def stream():
                # cache smaller than the read -> native takes the direct
                # C++ assembly path (numpy path thrashes its LRU)
                ka = KnossosArray(root, cube_edge=e, native=native,
                                  max_ram=0, n_preload=0)
                out = ka[:, :, :]
                assert out[0, 0, 0] == vol[0, 0, 0]

            tw = timeit(whole, args.repeats)
            ts = timeit(slab, args.repeats)
            tst = timeit(stream, args.repeats)
            slab_mb = min(96, Z) * X * Y / 2**20
            results[tag] = (tw, ts, tst)
            print(f"{tag}: whole {tw*1e3:8.1f} ms ({mb/tw:7.1f} MB/s)   "
                  f"slab(96z) {ts*1e3:8.1f} ms ({slab_mb/ts:7.1f} MB/s)   "
                  f"stream {tst*1e3:8.1f} ms ({mb/tst:7.1f} MB/s)")

        sw = results["numpy "][0] / results["native"][0]
        ss = results["numpy "][1] / results["native"][1]
        st = results["numpy "][2] / results["native"][2]
        print(f"speedup: whole {sw:.2f}x   slab {ss:.2f}x   stream {st:.2f}x")

        # --- GIL contention: the training scenario. A prefetch thread
        # loads slabs while the main Python thread is busy (schedules,
        # history, console, dispatch bookkeeping). The native core runs
        # GIL-free (ctypes CDLL releases the GIL); the numpy path's
        # transpose-scatter holds it and time-slices against the spinner.
        import threading
        stop = threading.Event()

        def spinner():
            x = 0
            while not stop.is_set():
                x += 1
        spin = threading.Thread(target=spinner, daemon=True)
        spin.start()
        try:
            cont = {}
            for native in (False, True):
                tag = "native" if native else "numpy "

                def stream_c():
                    ka = KnossosArray(root, cube_edge=e, native=native,
                                      max_ram=0, n_preload=0)
                    ka[:, :, :]

                tc = timeit(stream_c, args.repeats)
                cont[tag] = tc
                print(f"{tag} under GIL contention: stream "
                      f"{tc*1e3:8.1f} ms ({mb/tc:7.1f} MB/s)")
            print(f"contended speedup: "
                  f"{cont['numpy '] / cont['native']:.2f}x")
        finally:
            stop.set()
            spin.join()

        # correctness spot-check on the full volume
        ka = KnossosArray(root, cube_edge=e, native=True, max_ram=4096)
        np.testing.assert_array_equal(ka[:, :, :], vol)
        print("native full-volume read == source: OK")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
