"""Isolated op-lowering A/B for the decoder (conv-dense) serving path.

Two candidate lowerings, measured at the whole-volume shapes the decoder
path actually runs (96x512x512 slab family), against today's lowering:

1. ``upconv`` (kernel == stride transposed conv): lhs_dilation (today)
   vs dot + depth-to-space (1x1 matmul into Cout*prod(pool) channels,
   then interleave) — with kernel == stride every output position takes
   exactly one tap, so D2S is exact and has zero wasted MACs, while the
   dilated form convolves 3/4 zeros unless XLA rewrites it.
2. kz=1 conv3d vs z-folded conv2d (z into conv batch) — the dilated
   path's ``zfold`` trick (measured 2.4x isolated there), applied to the
   decoder's full-resolution (1,3,3) convs.

Each candidate is exactness-checked on-device before timing.

Usage: python scripts/exp_convdense_ops.py   (live chip)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 5


def timeit(fn, *args):
    out = fn(*args)
    out.block_until_ready()
    out = fn(*args)          # double warm-up (allocator penalty)
    out.block_until_ready()
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from elektronn2_tpu.ops.conv import conv, upconv

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    part = os.environ.get("EXP_PART", "all")

    # --- 1) upconv lowering, decoder mid-res shape -----------------------
    # unet3d-class decoder: Cin=24 -> Cout=12, pool (1,2,2), half-res slab
    for (C_in, C_out, Z, X, Y) in ([(24, 12, 92, 250, 250),
                                    (48, 24, 92, 125, 125)]
                                   if part in ("all", "up") else []):
        x = jax.random.normal(key, (1, C_in, Z, X, Y), jnp.float32)
        w = jax.random.normal(key, (C_out, C_in, 1, 2, 2), jnp.float32) * 0.1

        def up_today(x, w):
            return upconv(x, w, (1, 2, 2))

        def up_d2s(x, w):
            # (Cout, Cin, 1, px, py) -> 1x1 conv to Cout*px*py, interleave
            co, ci = w.shape[:2]
            px, py = w.shape[3], w.shape[4]
            wm = w.reshape(co, ci, px * py)            # (co, ci, p)
            wm = wm.transpose(0, 2, 1).reshape(co * px * py, ci, 1, 1, 1)
            y = conv(x, wm)                            # (b, co*p, z, sx, sy)
            b, _, z, sx, sy = y.shape
            y = y.reshape(b, co, px, py, z, sx, sy)
            y = y.transpose(0, 1, 4, 5, 2, 6, 3)       # b co z sx px sy py
            return y.reshape(b, co, z, sx * px, sy * py)

        f_today = jax.jit(up_today)
        f_d2s = jax.jit(up_d2s)
        # exactness at a memory-cheap shape, same code path
        xs = x[:, :, :8, :32, :32]
        err = float(jnp.max(jnp.abs(f_today(xs, w) - f_d2s(xs, w))))
        ta = timeit(f_today, x, w)
        tb = timeit(f_d2s, x, w)
        print(f"upconv {C_in}->{C_out} @{Z}x{X}x{Y}: lhs_dilation "
              f"{ta*1e3:7.1f} ms | d2s {tb*1e3:7.1f} ms "
              f"(max|d|={err:.2e})", flush=True)
        del x

    # --- 2) kz=1 conv: conv3d vs z-folded conv2d -------------------------
    for (C_in, C_out, Z, X, Y) in ([(1, 12, 48, 512, 512),
                                    (24, 16, 44, 503, 503),
                                    (12, 12, 44, 501, 501)]
                                   if part in ("all", "conv") else []):
        x = jax.random.normal(key, (1, C_in, Z, X, Y), jnp.float32)
        w = jax.random.normal(key, (C_out, C_in, 1, 3, 3), jnp.float32) * 0.1

        def c3d(x, w):
            return conv(x, w)

        def c2d_zfold(x, w):
            b, c, z = x.shape[:3]
            x2 = x.transpose(0, 2, 1, 3, 4).reshape(b * z, c,
                                                    x.shape[3], x.shape[4])
            y = conv(x2, w[:, :, 0])
            y = y.reshape(b, z, w.shape[0], y.shape[2], y.shape[3])
            return y.transpose(0, 2, 1, 3, 4)

        fa, fb = jax.jit(c3d), jax.jit(c2d_zfold)
        xs = x[:, :, :8, :32, :32]
        err = float(jnp.max(jnp.abs(fa(xs, w) - fb(xs, w))))
        ta = timeit(fa, x, w)
        tb = timeit(fb, x, w)
        print(f"conv kz=1 {C_in}->{C_out} @{Z}x{X}x{Y}: conv3d "
              f"{ta*1e3:7.1f} ms | zfold2d {tb*1e3:7.1f} ms "
              f"(max|d|={err:.2e})", flush=True)
        del x


if __name__ == "__main__":
    main()
