"""Sustained sweep throughput via the CACHED predict_dense_device program:
K back-to-back dispatches, one sync."""

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
    vol_shape = tuple(int(v) for v in os.environ.get(
        "BENCH_VOL", "64,512,512").split(","))
    K = int(os.environ.get("K", "4"))
    vol = jax.random.uniform(jax.random.PRNGKey(0), (1,) + vol_shape,
                             jnp.float32)
    float(jnp.sum(vol))
    zfold = os.environ.get("ZFOLD", "0") == "1"
    cdtype = os.environ.get("CDTYPE", "") or None
    model.set_compute_dtype(cdtype)
    for impl in os.environ.get("IMPLS", "s2bg,direct").split(","):
        model.set_dilated_impl(impl, zfold=zfold)
        out = model.predict_dense_device(vol, pad_raw=True)
        float(jnp.sum(out))                   # compile + sync
        t0 = time.perf_counter()
        s = jnp.float32(0)
        for _ in range(K):
            # fold immediately: holding K outputs OOMs big slabs at high K
            s = s + jnp.sum(jnp.asarray(model.predict_dense_device(
                vol, pad_raw=True), jnp.float32))
        float(s)
        dt = time.perf_counter() - t0
        vox = float(np.prod(out.shape[1:])) * K
        print(json.dumps({"impl": impl, "K": K,
                          "ms_per_slab": round(dt * 1e3 / K, 1),
                          "sustained_mvox_s": round(vox / dt / 1e6, 2),
                          "vol": vol_shape}), flush=True)


if __name__ == "__main__":
    main()
