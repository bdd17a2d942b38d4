"""Chained tail-conv cost decomposition at production shapes (r2 s10).

The s10 ablation (exp_ptail_ablate.py) showed the kernel BODY is at its
DMA floor (~62 TF/s padded, dots fully hidden), yet the in-graph tail
chain measured only ~42 TF/s. This script locates the difference: it
times, at the flagship's in-graph tail shape,

  single  — one conv, nczxy in -> nczxy out (both transforms paid)
  chain3  — conv1 (nczxy->xzcy) -> conv2 (xzcy->xzcy) -> conv3
            (xzcy->nczxy): the production chaining pattern
  chain3x — same but conv3 emits xzcy too (what the graph runs when the
            1x1 head consumes xzcy) — no output transform at all

and prints per-conv ms so the chaining overhead (layout transforms at
the chain boundaries, lane padding) is separated from the body cost.

Sustained protocol: K dispatches, one sync, best of 3. JSON line each.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    from elektronn2_tpu.ops import pallas_tailconv as pt

    # flagship in-graph tail shape: z ~ slab z - head fov, xy ~ 496-geom
    shp = tuple(int(v) for v in os.environ.get(
        "SHAPE", "1,40,116,480,512").split(","))
    dil = tuple(int(v) for v in os.environ.get("DIL", "1,4,4").split(","))
    Cout = int(os.environ.get("COUT", "40"))
    K = int(os.environ.get("BENCH_K", "8"))
    zb = int(os.environ.get("ZB", "8"))
    pf = int(os.environ.get("PREFETCH", "1"))

    _, Cin, Z, X, Y = shp
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randn(*shp).astype(np.float32))
    ws = [jax.device_put((rng.randn(Cout, Cin if i == 0 else Cout, 3, 3, 3)
                          / 30).astype(np.float32)) for i in range(3)]
    bs = [jax.device_put(rng.randn(Cout).astype(np.float32))
          for _ in range(3)]
    float(jnp.sum(x))

    dz, dx, dy = dil

    def single(x):
        return pt.conv3x3_dilated(x, ws[0], bs[0], dil=dil, z_block=zb,
                                  prefetch=pf)

    def chain3(x, last_xz=False):
        vy = Y
        h = pt.conv3x3_dilated(x, ws[0], bs[0], dil=dil, z_block=zb,
                               prefetch=pf, out_layout="xzcy")
        vy -= 2 * dy
        h = pt.conv3x3_dilated(h, ws[1], bs[1], dil=dil, z_block=zb,
                               prefetch=pf, in_layout="xzcy", valid_y=vy,
                               out_layout="xzcy")
        vy -= 2 * dy
        return pt.conv3x3_dilated(h, ws[2], bs[2], dil=dil, z_block=zb,
                                  prefetch=pf, in_layout="xzcy",
                                  valid_y=vy,
                                  out_layout="xzcy" if last_xz else
                                  "nczxy")

    def run(name, fn, n_convs, zo, xo, yo):
        try:
            out = fn(x)
            float(jnp.sum(out))
        except Exception as e:
            print(json.dumps({"case": name, "error": str(e)[:160]}),
                  flush=True)
            return
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                out = fn(x)
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0) / K)
        dt = min(ts)
        flops = sum(2 * (Z - 2 * (i + 1)) * (X - 2 * dx * (i + 1))
                    * (Y - 2 * dy * (i + 1))
                    * (Cin if i == 0 else Cout) * Cout * 27
                    for i in range(n_convs))
        print(json.dumps({
            "case": name, "ms": round(dt * 1e3, 2),
            "ms_per_conv": round(dt * 1e3 / n_convs, 2),
            "tflops": round(flops / dt / 1e12, 1)}), flush=True)

    run("single", single, 1, Z - 2, X - 2 * dx, Y - 2 * dy)
    run("chain3", lambda x: chain3(x, False), 3,
        Z - 6, X - 6 * dx, Y - 6 * dy)
    run("chain3x", lambda x: chain3(x, True), 3,
        Z - 6, X - 6 * dx, Y - 6 * dy)


if __name__ == "__main__":
    main()
