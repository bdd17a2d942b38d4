"""Pallas tail-conv kernel: per-row floor study (r2 s10).

Context (docs/tpu_performance.md "Pallas tail-conv kernel"): every
structural variant measured in s9 (mstack / mstack3 / kfuse / tap9 /
mstack2p — 1..9 dots per output row, M fill 31..94%, 1..3x RHS bytes)
lands at the same ~1.05 us per output row vs a ~0.46 us MXU+copy floor,
i.e. the binding cost is per-row-INVARIANT. This script measures the one
variant that divides that per-row cost instead of reshaping it:

  nfold — ONE dot per grid cell: all z_block output rows fold into the
          matmul N (lane) dim (stage (9C, ZB*Yp)); epilogue slices each
          row's Yp-lane segment.

plus a z_block sweep (incl. ZB >= 12, which compile-500'd in s9 — retest
whether that was geometry-specific like the other 500s).

Sustained protocol: K dispatches, one sync, best of 3. JSON line each.
Shapes default to the s9 canonical isolated tail shape.
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

    shp = tuple(int(v) for v in os.environ.get(
        "SHAPE", "1,40,34,320,531").split(","))
    dil = tuple(int(v) for v in os.environ.get("DIL", "1,4,4").split(","))
    Cout = int(os.environ.get("COUT", "40"))
    K = int(os.environ.get("BENCH_K", "8"))
    variants = os.environ.get(
        "VARIANTS", "mstack,nfold").split(",")
    zblocks = [int(v) for v in os.environ.get("ZB", "8").split(",")]
    prefetches = [int(v) for v in os.environ.get(
        "PREFETCH", "1").split(",")]

    _, Cin, Z, X, Y = shp
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randn(*shp).astype(np.float32))
    w = jax.device_put((rng.randn(Cout, Cin, 3, 3, 3) / 30)
                       .astype(np.float32))
    b = jax.device_put(rng.randn(Cout).astype(np.float32))
    float(jnp.sum(x))                      # sync staging

    Zo, Xo, Yo = Z - 2, X - 2 * dil[1], Y - 2 * dil[2]
    rows = Zo * Xo
    flops = 2 * Zo * Xo * Yo * Cin * Cout * 27
    ref = None
    for variant in variants:
      for pf in prefetches:
        for zb in zblocks:
            try:
                out = pt.conv3x3_dilated(x, w, b, dil=dil, z_block=zb,
                                         variant=variant, prefetch=pf)
                s = float(jnp.sum(out))
            except Exception as e:
                print(json.dumps({"variant": variant, "zb": zb, "pf": pf,
                                  "error": str(e)[:160]}), flush=True)
                continue
            if ref is None:
                ref = s
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(K):
                    out = pt.conv3x3_dilated(x, w, b, dil=dil, z_block=zb,
                                             variant=variant, prefetch=pf)
                float(jnp.sum(out))
                ts.append((time.perf_counter() - t0) / K)
            dt = min(ts)
            print(json.dumps({
                "variant": variant, "zb": zb, "pf": pf,
                "ms": round(dt * 1e3, 2),
                "us_per_row": round(dt * 1e6 / rows, 3),
                "tflops": round(flops / dt / 1e12, 1),
                "sum_relerr": abs(s - ref) / (abs(ref) + 1e-9)}),
                flush=True)


if __name__ == "__main__":
    main()
