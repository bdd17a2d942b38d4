"""Probe: xzcy-chained enc1 -> pool -> enc2 for the decoder (conv-dense)
serving path (r2 s15).

After s14, the conv-dense trace runs each eligible (3,3,3) conv through
the Pallas tail kernel with nczxy in/out — so enc1's output is
transposed out of the kernel layout, pooled, then transposed back in for
enc2. The dilated path's s9 finding: chaining consecutive kernels in the
kernel-native xzcy layout deletes those full-volume transposes. Here the
max-pool sits between, but max pooling is layout-agnostic — do it
directly on the xzcy block (window over dims 0=X and 3=Y).

A: enc1(nczxy->nczxy) -> pooling -> enc2(nczxy->nczxy)   [today]
B: enc1(nczxy->xzcy)  -> pool on xzcy -> enc2(xzcy->nczxy)

Usage: python scripts/exp_convdense_chain.py   (on a live chip)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(os.environ.get("EXP_K", "8"))
WINDOWS = 2
ZB = int(os.environ.get("EXP_ZB", "16"))
# enc0-output shape for a 128x512x512 slab
Z, X, Y = (int(v) for v in os.environ.get("EXP_VOL", "128,510,510")
           .split(","))


def _sync(y):
    import jax.numpy as jnp
    idx = tuple(slice(0, 1) for _ in range(y.ndim))
    return float(jnp.sum(jnp.asarray(y[idx], jnp.float32)))


def bench(fn, *args, k=K):
    import jax
    f = jax.jit(fn)
    _sync(f(*args))
    _sync(f(*args))
    best = None
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(k):
            y = f(*args)
        _sync(y)
        dt = (time.perf_counter() - t0) / k
        best = dt if best is None else min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from elektronn2_tpu.ops.conv import pooling
    from elektronn2_tpu.ops.pallas_tailconv import conv3x3_dilated

    print(f"devices: {jax.devices()} vol {(Z, X, Y)} zb {ZB}", flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    x = jax.random.normal(k1, (1, 12, Z, X, Y), jnp.float32)
    w1 = jax.random.normal(k2, (24, 12, 3, 3, 3), jnp.float32) * 0.1
    b1 = jax.random.normal(k3, (24,), jnp.float32)
    w2 = jax.random.normal(k4, (24, 24, 3, 3, 3), jnp.float32) * 0.1
    b2 = jax.random.normal(k5, (24,), jnp.float32)

    Zo, Xo, Yo = Z - 2, X - 2, Y - 2

    def chain_a(x, w1, b1, w2, b2):
        y = conv3x3_dilated(x, w1, b1, dil=(1, 1, 1), relu=True,
                            variant="mstack", z_block=ZB)
        y = pooling(y, (1, 2, 2))
        return conv3x3_dilated(y, w2, b2, dil=(1, 1, 1), relu=True,
                               variant="mstack", z_block=ZB)

    def chain_b(x, w1, b1, w2, b2):
        y = conv3x3_dilated(x, w1, b1, dil=(1, 1, 1), relu=True,
                            variant="mstack", z_block=ZB,
                            out_layout="xzcy")
        # y: (Xo, Zo_p, 24, Yo_p), valid (Xo, Zo, 24, Yo).
        # max-pool (1,2,2) directly in the kernel layout: window over
        # X (dim 0) and Y (dim 3). Pad lanes/rows hold garbage but only
        # feed garbage OUTPUT positions, which the valid slice drops.
        y = lax.reduce_window(y, -jnp.inf, lax.max, (2, 1, 1, 2),
                              (2, 1, 1, 2), "VALID")
        out = conv3x3_dilated(y, w2, b2, dil=(1, 1, 1), relu=True,
                              variant="mstack", z_block=ZB,
                              in_layout="xzcy", valid_y=Yo // 2)
        # kernel z rows beyond the valid Zo carried garbage; trim
        return out[:, :, :Zo - 2]

    ya = chain_a(x, w1, b1, w2, b2)
    yb = chain_b(x, w1, b1, w2, b2)
    d = float(jnp.max(jnp.abs(ya - yb)))
    print(f"shapes a={ya.shape} b={yb.shape}  maxdev {d:.2e}", flush=True)
    del ya, yb

    ta = bench(chain_a, x, w1, b1, w2, b2)
    tb = bench(chain_b, x, w1, b1, w2, b2)
    print(f"A nczxy-chain {ta * 1e3:7.1f} ms   B xzcy-chain "
          f"{tb * 1e3:7.1f} ms   speedup {ta / tb:.2f}x", flush=True)


if __name__ == "__main__":
    main()
