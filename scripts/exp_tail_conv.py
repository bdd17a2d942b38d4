"""Isolated A/B of tail-conv lowerings on the s2bg phase batch.

In champion mode the post-split tail (conv2/conv3: 3^3, 30->40->40 ch on a
16-phase batch) holds ~92% of the sweep FLOPs. Candidates per conv:

  conv3d   — lax 3D conv on (P, C, Z, X, Y)            [what champion does]
  ztap2d   — z-tap concat into channels (C*3) + ONE 2D conv with z folded
             into the conv batch dim (materialises a 3x-channel copy, but
             the conv runs in XLA's happiest 2D big-batch form)
  ztapsum  — three z-shifted 2D convs summed (no concat; 3 conv outputs)

All exactly equivalent (checked here vs conv3d on CPU-precision sums).
Sustained protocol: K dispatches, one sync. JSON line per variant.
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
    from jax import lax
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    from elektronn2_tpu.ops.conv import conv

    P = int(os.environ.get("P", "16"))          # phases
    Z, X, Y = (int(v) for v in os.environ.get(
        "SP", "64,128,128").split(","))
    Cin = int(os.environ.get("CIN", "30"))
    Cout = int(os.environ.get("COUT", "40"))
    K = int(os.environ.get("BENCH_K", "4"))
    cdtype = os.environ.get("CDTYPE", "bfloat16")

    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randn(P, Cin, Z, X, Y).astype(np.float32)
                       .astype(cdtype))
    w = jax.device_put((rng.randn(Cout, Cin, 3, 3, 3) / 30)
                       .astype(np.float32).astype(cdtype))
    float(jnp.sum(x.astype(jnp.float32)))

    def conv3d(x, w):
        return conv(x, w)

    def ztap2d(x, w):
        # y[:, :, z] = sum_t conv2d(x[:, :, z+t], w[:, :, t])
        # == ONE 2D conv over channels stacked with the 3 z-taps
        zo = Z - 2
        xz = jnp.concatenate([x[:, :, t:t + zo] for t in range(3)], 1)
        x2 = xz.transpose(0, 2, 1, 3, 4).reshape(P * zo, Cin * 3, X, Y)
        w2 = w.transpose(0, 2, 1, 3, 4).reshape(Cout, Cin * 3, 3, 3)
        y = conv(x2, w2)
        return y.reshape(P, zo, Cout, X - 2, Y - 2).transpose(0, 2, 1, 3, 4)

    def ztapsum(x, w):
        zo = Z - 2
        acc = None
        for t in range(3):
            x2 = (x[:, :, t:t + zo].transpose(0, 2, 1, 3, 4)
                  .reshape(P * zo, Cin, X, Y))
            y = conv(x2, w[:, :, t])
            acc = y if acc is None else acc + y
        return acc.reshape(P, zo, Cout, X - 2, Y - 2).transpose(0, 2, 1, 3, 4)

    def fatn(x, w):
        # ONE 2D conv computing all kz taps' outputs (N = Cout*kz = 120
        # MXU lanes instead of 40), combined by shifted slab adds:
        # out[z] = sum_t c_t[z + t], c_t = conv2d(x[:, :, z'], w[:, :, t])
        zo = Z - 2
        x2 = x.transpose(0, 2, 1, 3, 4).reshape(P * Z, Cin, X, Y)
        w2 = w.transpose(2, 0, 1, 3, 4).reshape(3 * Cout, Cin, 3, 3)
        c = conv(x2, w2)
        c = c.reshape(P, Z, 3, Cout, X - 2, Y - 2)
        y = (c[:, 0:zo, 0] + c[:, 1:1 + zo, 1] + c[:, 2:2 + zo, 2])
        return y.transpose(0, 2, 1, 3, 4)

    fns = {"conv3d": conv3d, "ztap2d": ztap2d, "ztapsum": ztapsum,
           "fatn": fatn}
    only = os.environ.get("ONLY")
    ref = None
    flops = (P * (Z - 2) * (X - 2) * (Y - 2)) * Cout * Cin * 27 * 2
    for name, f in fns.items():
        if only and name not in only.split(","):
            continue
        jf = jax.jit(f)
        try:
            out = jf(x, w)
            s = float(jnp.sum(out.astype(jnp.float32)))
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        if ref is None:
            ref = s
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                out = jf(x, w)
            float(jnp.sum(out.astype(jnp.float32)))
            ts.append((time.perf_counter() - t0) / K)
        dt = min(ts)
        print(json.dumps({
            "variant": name, "ms": round(dt * 1e3, 1),
            "tflops": round(flops / dt / 1e12, 1),
            "sum_relerr": abs(s - ref) / (abs(ref) + 1e-9)}), flush=True)


if __name__ == "__main__":
    main()
