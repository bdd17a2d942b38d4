"""Calibrate the per-dispatch+sync floor through the axon tunnel, and
decompose conv0's time: pure conv vs pure pool+relu vs fused."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def t3(jfn, *a):
    import jax.numpy as jnp
    out = jfn(*a)
    float(jnp.sum(out))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = jfn(*a)
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return round(min(ts) * 1e3, 1)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    from elektronn2_tpu.ops.conv import conv as ops_conv

    # all arrays are generated ON DEVICE: the sandbox tunnel stages host
    # arrays at ~20 MB/s, which would dominate the whole experiment
    key = jax.random.PRNGKey(0)
    tiny = jnp.ones((8, 128), jnp.float32)
    print(json.dumps({"variant": "floor_tiny_add",
                      "ms": t3(jax.jit(lambda v: v + 1), tiny)}),
          flush=True)

    Z, X, Y = 70, 406, 406
    F = 20
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.uniform(k1, (Z, 1, X, Y), jnp.float32)
    w = jax.random.uniform(k2, (F, 1, 3, 3), jnp.float32) * 0.1
    big = jax.random.uniform(k3, (Z, F, X - 2, Y - 2), jnp.float32)
    float(jnp.sum(x))
    float(jnp.sum(big))

    print(json.dumps({"variant": "conv_only_2d",
                      "ms": t3(jax.jit(lambda v: ops_conv(v, w)), x)}),
          flush=True)

    def poolrelu(y):
        yp = lax.reduce_window(y, -np.inf, lax.max, (1, 1, 2, 2),
                               (1,) * 4, "VALID")
        return jax.nn.relu(yp)

    print(json.dumps({"variant": "poolrelu_only",
                      "ms": t3(jax.jit(poolrelu), big)}), flush=True)

    print(json.dumps({"variant": "copy_big",
                      "ms": t3(jax.jit(lambda v: v * 1.000001), big)}),
          flush=True)


if __name__ == "__main__":
    main()
