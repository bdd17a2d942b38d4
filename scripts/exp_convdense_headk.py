"""Probe: head-unit Pallas kernel (kz=1 conv, pool=1) vs the zfold 2D
conv at the DECODER's kz=1 shapes (r2 s14 follow-up).

After s14's ptail landing, the conv-dense champion's remaining XLA convs
are the zfolded kz=1 layers (enc0: Cin=1->12, dec: Cin=24->16 at full
resolution). `conv1x3x3_pool_dilated(pool=1)` covers the shape class;
its output is xzcy, so the honest comparison INCLUDES the transpose back
to nczxy (the conv-dense trace consumes nczxy).

Usage: python scripts/exp_convdense_headk.py   (on a live chip)

RESULT (v5e, 2026-08-19, sustained K=8): measured REJECTION — the head
kernel loses at every decoder kz=1 shape once the xzcy->nczxy transpose
is included (0.52-0.77x vs conv_zfold2d; maxdev ~2e-6). Recorded in
docs/tpu_performance.md "s15 follow-up".
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(os.environ.get("EXP_K", "8"))


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x[..., :1, :1] if x.ndim == 4 else x[..., :1, :1, :1]))


def bench(fn, *args, k=K, windows=2):
    import jax
    f = jax.jit(fn)
    y = f(*args); sync(y)
    y = f(*args); sync(y)
    best = None
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(k):
            y = f(*args)
        sync(y)
        dt = (time.perf_counter() - t0) / k
        best = dt if best is None else min(best, dt)
    return best, y


def main():
    import jax
    import jax.numpy as jnp

    from elektronn2_tpu.ops.conv import conv_zfold2d
    from elektronn2_tpu.ops.pallas_tailconv import conv1x3x3_pool_dilated

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    cases = [
        ("dec-96x512 24->16", 24, 16, 96, 512, 512),
        ("dec-128x512 24->16", 24, 16, 128, 512, 512),
        ("enc0-96x512 1->12", 1, 12, 96, 512, 512),
    ]
    for name, ci, co, Z, X, Y in cases:
        kx, kw, kb = jax.random.split(key, 3)
        x = jax.random.normal(kx, (1, ci, Z, X, Y), jnp.float32)
        w = jax.random.normal(kw, (co, ci, 1, 3, 3), jnp.float32) * 0.1
        b = jax.random.normal(kb, (co,), jnp.float32)

        def zf(x, w, b):
            y = conv_zfold2d(x, w) + b.reshape(1, -1, 1, 1, 1)
            return jax.nn.relu(y)

        def headk(x, w, b):
            # kernel emits xzcy (Xo, Z_p, Co_p, Yp); transpose back to
            # nczxy and slice pads — the cost a node-level integration
            # would actually pay
            yk = conv1x3x3_pool_dilated(x, w, b, dil=(1, 1), pool=1)
            Zv, Yv = Z, Y - 2
            yk = yk[:, :Zv, :co, :Yv]
            return jnp.transpose(yk, (2, 1, 0, 3))[None]

        try:
            t0_, y0 = bench(zf, x, w, b)
        except Exception as e:
            print(f"{name}: zfold FAILED {str(e)[:90]}", flush=True)
            t0_, y0 = None, None
        try:
            t1_, y1 = bench(headk, x, w, b)
        except Exception as e:
            print(f"{name}: headk FAILED {str(e)[:90]}", flush=True)
            t1_, y1 = None, None
        msg = [name]
        if t0_:
            msg.append(f"zfold {t0_*1e3:6.1f} ms")
        if t1_:
            msg.append(f"headk {t1_*1e3:6.1f} ms")
        if t0_ and t1_:
            msg.append(f"speedup {t0_/t1_:.2f}x")
        if y0 is not None and y1 is not None:
            msg.append(f"maxdev {float(jnp.max(jnp.abs(y0 - y1))):.2e}")
        print("  ".join(msg), flush=True)
        del x, w, b, y0, y1


if __name__ == "__main__":
    main()
