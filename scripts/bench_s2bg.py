"""A/B the dilated-dense lowerings (direct vs s2b vs s2bg) on real TPU.

VERDICT r1 #1: measure the global space-to-batch tail lowering against the
round-1 'direct' baseline, per-graph and per-layer. Prints one JSON line
per measurement.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    from __graft_entry__ import _flagship_model

    model = _flagship_model(mfp=True, patch=[23, 103, 103])
    cdtype = os.environ.get("COMPUTE_DTYPE")
    if cdtype:
        model.set_compute_dtype(
            cdtype, activations=bool(int(os.environ.get("ACT_E2E", "0"))))
    vol_shape = tuple(int(v) for v in os.environ.get(
        "BENCH_VOL", "48,384,384").split(","))
    batch = int(os.environ.get("BATCH", "0"))
    rng = np.random.RandomState(0)
    impls = os.environ.get("IMPLS", "direct,s2bg").split(",")
    zfold = bool(int(os.environ.get("ZFOLD", "0")))
    ztap = os.environ.get("ZTAP", "0")    # 0 | native | f32 | concat
    ztap = False if ztap in ("0", "") else ztap
    zmajor = bool(int(os.environ.get("ZMAJOR", "0")))
    poolslice = bool(int(os.environ.get("POOLSLICE", "0")))
    K = int(os.environ.get("SUSTAIN_K", "1"))   # >1: K dispatches, one sync
    if batch:
        from elektronn2_tpu.neuromancer.inference import dilated_dense_forward
        vol = jax.device_put(
            rng.rand(batch, 1, *vol_shape).astype(np.float32))
        float(jnp.sum(vol))
        for impl in impls:
            fn = jax.jit(lambda p, s, v, impl=impl: dilated_dense_forward(
                model, v, batch=True, params=p, state=s, impl=impl))
            out = fn(model.params, model.state, vol)
            float(jnp.sum(out))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(model.params, model.state, vol)
                assert np.isfinite(float(jnp.sum(out)))
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            mvox = float(np.prod(out.shape[1:]) * batch) / dt / 1e6
            print(json.dumps({"impl": impl, "batch": batch,
                              "ms": round(dt * 1e3, 1),
                              "mvox_s": round(mvox, 2), "vol": vol_shape,
                              "dtype": cdtype or "f32"}), flush=True)
        return
    # on-device data: the tunnel stages host arrays at ~20 MB/s
    vol = jax.random.uniform(jax.random.PRNGKey(0), (1,) + vol_shape,
                             jnp.float32)
    float(jnp.sum(vol))
    for impl in impls:
        model.set_dilated_impl(impl, zfold=zfold, ztap=ztap, zmajor=zmajor,
                               poolslice=poolslice)
        out = model.predict_dense_device(vol, pad_raw=True)   # compile
        float(jnp.sum(out))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [model.predict_dense_device(vol, pad_raw=True)
                    for _ in range(K)]
            acc = outs[0].dtype.type(0)
            for o in outs:
                acc = acc + jnp.sum(o)
            assert np.isfinite(float(acc))       # one sync for K dispatches
            ts.append((time.perf_counter() - t0) / K)
        dt = min(ts)
        mvox = float(np.prod(out.shape[1:])) / dt / 1e6
        print(json.dumps({"impl": impl, "zfold": zfold, "ztap": ztap,
                          "zmajor": zmajor, "poolslice": poolslice,
                          "act_e2e": bool(getattr(model, "_compute_act",
                                                  False)),
                          "K": K, "ms": round(dt * 1e3, 1),
                          "mvox_s": round(mvox, 2), "vol": vol_shape,
                          "dtype": cdtype or "f32"}), flush=True)


if __name__ == "__main__":
    main()
