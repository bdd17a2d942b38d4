"""conv0 experiment round 2: z-fold to 2D conv, bf16 operand variants."""

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
    Z, X, Y = 70, 406, 406
    F = 20
    x = jax.device_put(rng.rand(1, 1, Z, X, Y).astype(np.float32))
    w = jax.device_put((rng.rand(F, 1, 1, 3, 3) * 0.1).astype(np.float32))
    b = jax.device_put(np.zeros(F, np.float32))
    float(jnp.sum(x))

    def pool_act(y):
        yp = lax.reduce_window(y, -np.inf, lax.max, (1,) * (y.ndim - 2)
                               + (2, 2), (1,) * y.ndim, "VALID")
        return jax.nn.relu(yp + b.reshape((1, -1) + (1,) * (y.ndim - 2)))

    def v_z2b(x):
        # kz=1: z folds into the conv batch dim -> one 2D conv
        x2 = x[0].transpose(1, 0, 2, 3)              # (Z, 1, X, Y)
        y = ops_conv(x2, w[:, :, 0])                 # (Z, F, Xo, Yo)
        y = pool_act(y)
        return y.transpose(1, 0, 2, 3)[None]

    def v_z2b_bf16(x):
        x2 = x[0].transpose(1, 0, 2, 3).astype(jnp.bfloat16)
        y = ops_conv(x2, w[:, :, 0].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        y = pool_act(y)
        return y.transpose(1, 0, 2, 3)[None]

    def v_im2col_bf16(x):
        Xo, Yo = X - 2, Y - 2
        xb = x.astype(jnp.bfloat16)
        taps = jnp.stack([xb[0, 0, :, dx:dx + Xo, dy:dy + Yo]
                          for dx in range(3) for dy in range(3)], -1)
        y = jnp.einsum("zxyk,fk->fzxy", taps,
                       w[:, 0, 0].reshape(F, 9).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)[None]
        return pool_act(y)

    def v_lax_bf16(x):
        y = ops_conv(x.astype(jnp.bfloat16),
                     w.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        return pool_act(y)

    sel = os.environ.get("VARIANTS", "z2b,z2b_bf16,im2col_bf16,lax_bf16")
    table = {"z2b": v_z2b, "z2b_bf16": v_z2b_bf16,
             "im2col_bf16": v_im2col_bf16, "lax_bf16": v_lax_bf16}
    for name, fn in [(n, table[n]) for n in sel.split(",")]:
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


if __name__ == "__main__":
    main()
