"""Sustained dense-sweep throughput: K back-to-back dispatches with ONE
final sync (the serving pattern — sweep_knossos dispatches slab after
slab), vs the single-dispatch timing that pays the ~30 ms tunnel
dispatch+sync floor per call. Also A/Bs slab batching. On-device data."""

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
    from elektronn2_tpu.neuromancer.inference import dilated_dense_forward

    model = _flagship_model(mfp=True, patch=[23, 103, 103])
    vol_shape = tuple(int(v) for v in os.environ.get(
        "BENCH_VOL", "64,512,512").split(","))
    impl = os.environ.get("IMPL", "s2bg")
    batch = int(os.environ.get("BATCH", "1"))
    K = int(os.environ.get("K", "4"))
    vol = jax.random.uniform(jax.random.PRNGKey(0),
                             (batch, 1) + vol_shape, jnp.float32)
    float(jnp.sum(vol))
    fn = jax.jit(lambda p, s, v: dilated_dense_forward(
        model, v, batch=True, params=p, state=s, impl=impl))
    out = fn(model.params, model.state, vol)
    float(jnp.sum(out))                       # compile + sync
    # K back-to-back dispatches, one sync
    t0 = time.perf_counter()
    outs = [fn(model.params, model.state, vol) for _ in range(K)]
    s = jnp.float32(0)
    for o in outs:
        s = s + jnp.sum(o)
    float(s)
    dt = time.perf_counter() - t0
    vox = float(np.prod(out.shape[2:])) * batch * K
    print(json.dumps({"impl": impl, "batch": batch, "K": K,
                      "total_ms": round(dt * 1e3, 1),
                      "ms_per_slab": round(dt * 1e3 / (batch * K), 1),
                      "sustained_mvox_s": round(vox / dt / 1e6, 2),
                      "vol": vol_shape}), flush=True)


if __name__ == "__main__":
    main()
