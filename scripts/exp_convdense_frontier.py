"""Decoder serving frontier: slab geometry x kernel z_block for the
champion conv-dense config (d2s+zfold+ptail) — the s14 follow-up to
scripts/exp_convdense.py (which fixed 96x512x512 / z_block=8).

Usage: python scripts/exp_convdense_frontier.py   (on a live chip)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(os.environ.get("EXP_K", "8"))
WINDOWS = 2


def main():
    import jax
    import jax.numpy as jnp

    from scripts.exp_convdense import build_model
    from elektronn2_tpu.neuromancer.inference import \
        convolutional_dense_forward

    print("devices:", jax.devices(), flush=True)
    model = build_model()

    slabs = [(144, 496, 496), (160, 496, 496), (128, 512, 512),
             (144, 448, 448), (192, 400, 400)]
    zblocks = [16, 32]
    for V in slabs:
        for zb in zblocks:
            model.set_convdense_impl(upconv="d2s", zfold=True,
                                     ptail={"z_block": zb})
            tag = f"{V[0]}x{V[1]}x{V[2]} zb={zb}"
            try:
                vol = jax.random.uniform(jax.random.PRNGKey(0), (1,) + V,
                                         jnp.float32)
                float(jnp.sum(vol))
                fn = jax.jit(lambda p, s, v: convolutional_dense_forward(
                    model, v, params=p, state=s))
                out = fn(model.params, model.state, vol)
                out_vox = float(np.prod(out.shape[1:]))
                float(jnp.sum(jnp.asarray(out, jnp.float32)))
                float(jnp.sum(jnp.asarray(
                    fn(model.params, model.state, vol), jnp.float32)))
                best = float("inf")
                for _ in range(WINDOWS):
                    t0 = time.perf_counter()
                    acc = jnp.float32(0)
                    for _ in range(K):
                        acc = acc + jnp.sum(jnp.asarray(
                            fn(model.params, model.state, vol),
                            jnp.float32))
                    float(acc)
                    best = min(best, (time.perf_counter() - t0) / K)
                print(f"{tag:>24}: {out_vox/best/1e6:8.1f} Mvox/s "
                      f"({best*1e3:7.1f} ms/slab)", flush=True)
                del out, vol
            except Exception as e:   # noqa: BLE001
                print(f"{tag:>24}: FAILED {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
