"""int8 quantised-serving on-chip study (r2 s6).

Measures the sustained dense-sweep throughput of the int8 serving mode
against the bf16 champion, across the knobs that matter:

* dynamic per-dispatch activation scales (max-abs reductions in-graph)
  vs STATIC calibrated scales (``Model.calibrate_int8``: constants baked
  into the trace — no reduction passes over the big activations);
* f32 inter-layer activation storage (the default) vs bf16 storage
  (``set_compute_dtype('int8', activations=True)`` — halves the
  inter-layer buffers, which is what lets the 96-z champion slab fit:
  plain int8 at 96x512x512 OOMs v5e by 216 MB, measured).

Env: VOLS (semicolon-separated z,x,y list), K (sustained dispatches),
MODES (comma list of dyn, cal, cal+act, dyn+act).

Results land in docs/tpu_performance.md "int8 quantised serving".
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
    from __graft_entry__ import _flagship_model

    model = _flagship_model(mfp=True, patch=[23, 103, 103])
    model.set_dilated_impl("s2bg", zfold=True)
    K = int(os.environ.get("K", "8"))
    vols = [tuple(int(v) for v in s.split(","))
            for s in os.environ.get("VOLS", "88,512,512;96,512,512"
                                    ).split(";")]
    modes = os.environ.get("MODES", "cal,cal+act").split(",")

    # calibration volume: small (one eager f32 pass per conv) but bigger
    # than the fov so every conv sees representative maxima
    calvol = jax.random.uniform(jax.random.PRNGKey(7), (1, 32, 160, 160),
                                jnp.float32)

    for vshape in vols:
        vol = jax.random.uniform(jax.random.PRNGKey(0), (1,) + vshape,
                                 jnp.float32)
        float(jnp.sum(vol))
        for mode in modes:
            act = mode.endswith("+act")
            model.set_compute_dtype("int8", activations=act)
            if mode.startswith("cal"):
                model.calibrate_int8(calvol)
            try:
                out = model.predict_dense_device(vol, pad_raw=True)
                float(jnp.sum(out))            # compile + sync
                t0 = time.perf_counter()
                s = jnp.float32(0)
                for _ in range(K):
                    s = s + jnp.sum(jnp.asarray(
                        model.predict_dense_device(vol, pad_raw=True),
                        jnp.float32))
                float(s)
                dt = time.perf_counter() - t0
                vox = float(np.prod(out.shape[1:])) * K
                print(json.dumps({
                    "mode": f"int8-{mode}", "vol": vshape, "K": K,
                    "ms_per_slab": round(dt * 1e3 / K, 1),
                    "sustained_mvox_s": round(vox / dt / 1e6, 2)}),
                    flush=True)
            except Exception as e:
                print(json.dumps({
                    "mode": f"int8-{mode}", "vol": vshape,
                    "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                    flush=True)


if __name__ == "__main__":
    main()
