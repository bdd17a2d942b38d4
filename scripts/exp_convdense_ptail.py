"""Probe: Pallas tail-conv kernel vs lax conv3d at DECODER serving shapes.

The conv-dense (U-Net) serving champion (`set_convdense_impl(upconv='d2s',
zfold=True)`, 181.3 Mvox/s f32 — docs/tpu_performance.md r2 s13) still
runs its 3x3x3 convs (enc1: Cin=12->24 at full res, enc2: 24->24 at
pooled res — ~60% of the graph FLOPs) through XLA's conv. Those are the
exact shape class the dilated path's Pallas kernel was built for
(narrow-channel (3,3,3), dil z=1), just at dil=(1,1,1). This probe
measures `ops.pallas_tailconv.conv3x3_dilated` against
`lax.conv_general_dilated` (+ fused bias/relu) at the decoder's serving
shapes before wiring a `set_convdense_impl(ptail=...)` knob.

Usage: python scripts/exp_convdense_ptail.py   (on a live chip)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(os.environ.get("EXP_K", "8"))


def sync(x):
    # materialise a scalar: block_until_ready is unreliable on this tunnel
    import jax.numpy as jnp
    return float(jnp.sum(x[..., :1, :1, :1]))


def bench(fn, *args, k=K, windows=2):
    import jax
    f = jax.jit(fn)
    y = f(*args); sync(y)
    y = f(*args); sync(y)          # double warm-up (s9 finding)
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
    from jax import lax

    from elektronn2_tpu.ops.pallas_tailconv import conv3x3_dilated

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    # serving-shape cases: (name, Cin, Cout, Z, X, Y)
    # enc1 runs at (almost) the full padded slab; enc2 at xy/2.
    cases = [
        ("enc1-96x512", 12, 24, 96, 512, 512),
        ("enc2-96x256", 24, 24, 96, 256, 256),
        ("enc1-64x512", 12, 24, 64, 512, 512),
        ("wide24x24-96x512", 24, 24, 96, 512, 512),
    ]
    for name, ci, co, Z, X, Y in cases:
        kx, kw, kb = jax.random.split(key, 3)
        x = jax.random.normal(kx, (1, ci, Z, X, Y), jnp.float32)
        w = jax.random.normal(kw, (co, ci, 3, 3, 3), jnp.float32) * 0.1
        b = jax.random.normal(kb, (co,), jnp.float32)

        def lax_conv(x, w, b):
            y = lax.conv_general_dilated(
                x, w, (1, 1, 1), "VALID",
                dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
            return jax.nn.relu(y + b.reshape(1, -1, 1, 1, 1))

        def ptail(x, w, b):
            return conv3x3_dilated(x, w, b, dil=(1, 1, 1), relu=True)

        try:
            t_lax, y0 = bench(lax_conv, x, w, b)
        except Exception as e:
            print(f"{name}: lax FAILED {type(e).__name__}: {e}", flush=True)
            t_lax, y0 = None, None
        try:
            t_pt, y1 = bench(ptail, x, w, b)
        except Exception as e:
            print(f"{name}: ptail FAILED {type(e).__name__}: {e}",
                  flush=True)
            t_pt, y1 = None, None
        vox = (Z - 2) * (X - 2) * (Y - 2)
        msg = [name]
        if t_lax is not None:
            msg.append(f"lax {t_lax*1e3:7.1f} ms ({vox/t_lax/1e6:6.1f} Mvox/s)")
        if t_pt is not None:
            msg.append(f"ptail {t_pt*1e3:7.1f} ms ({vox/t_pt/1e6:6.1f} Mvox/s)")
        if t_lax and t_pt:
            msg.append(f"speedup {t_lax/t_pt:.2f}x")
        if y0 is not None and y1 is not None:
            d = float(jnp.max(jnp.abs(y0 - y1)))
            msg.append(f"maxdev {d:.2e}")
        print("  ".join(msg), flush=True)
        del x, w, b, y0, y1


if __name__ == "__main__":
    main()
