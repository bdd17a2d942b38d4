"""conv0 pathology experiment: the Cin=1 (1,3,3) conv takes ~53 of 114 ms
in the dense sweep (scripts/attr_s2bg.py). A/B alternative lowerings of
conv0+pool+relu in isolation on the TPU."""

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
    from elektronn2_tpu.ops.conv import conv as ops_conv

    rng = np.random.RandomState(0)
    Z, X, Y = tuple(int(v) for v in os.environ.get(
        "BENCH_VOL", "70,406,406").split(","))
    F = 20
    x = jax.device_put(rng.rand(1, 1, Z, X, Y).astype(np.float32))
    w = jax.device_put((rng.rand(F, 1, 1, 3, 3) * 0.1).astype(np.float32))
    b = jax.device_put(np.zeros(F, np.float32))
    float(jnp.sum(x))

    def pool_act(y):
        yp = lax.reduce_window(y, -np.inf, lax.max, (1, 1, 1, 2, 2),
                               (1,) * 5, "VALID")
        return jax.nn.relu(yp + b.reshape(1, -1, 1, 1, 1))

    def v_lax(x):
        return pool_act(ops_conv(x, w))

    def v_shiftmac(x):
        Zo, Xo, Yo = Z, X - 2, Y - 2
        acc = jnp.zeros((1, F, Zo, Xo, Yo), jnp.float32)
        for dx in range(3):
            for dy in range(3):
                sl = x[:, :, :, dx:dx + Xo, dy:dy + Yo]
                acc = acc + sl * w[:, 0, 0, dx, dy].reshape(1, F, 1, 1, 1)
        return pool_act(acc)

    def v_im2col(x):
        # stack the 9 taps along a new K axis, one (9 -> F) matmul
        Xo, Yo = X - 2, Y - 2
        taps = jnp.stack([x[0, 0, :, dx:dx + Xo, dy:dy + Yo]
                          for dx in range(3) for dy in range(3)], -1)
        y = jnp.einsum("zxyk,fk->fzxy", taps,
                       w[:, 0, 0].reshape(F, 9))[None]
        return pool_act(y)

    for name, fn in (("lax_conv", v_lax), ("shiftmac", v_shiftmac),
                     ("im2col", v_im2col)):
        jfn = jax.jit(fn)
        out = jfn(x)
        float(jnp.sum(out))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(x)
            float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"variant": name,
                          "ms": round(min(ts) * 1e3, 1)}), flush=True)
    # cross-check values
    a = np.asarray(jax.jit(v_lax)(x))
    for name, fn in (("shiftmac", v_shiftmac), ("im2col", v_im2col)):
        d = float(np.abs(np.asarray(jax.jit(fn)(x)) - a).max())
        print(json.dumps({"variant": name, "max_diff_vs_lax": d}),
              flush=True)


if __name__ == "__main__":
    main()
