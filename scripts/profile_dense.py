#!/usr/bin/env python
"""Dense-inference perf triage on real hardware: where do the cycles go?

Run on a live TPU (takes ~2-4 min):  python scripts/profile_dense.py

Produces, for the flagship dilated dense sweep:
  1. direct vs s2b lowering wall time,
  2. per-stage ablations (convs only / convs+pools / full graph, bf16 vs
     f32) to attribute time to MXU convs vs VPU dilated pools vs the rest,
  3. XLA cost_analysis (flops, bytes) per variant → achieved vs peak,
  4. optionally a Perfetto trace (PROFILE_TRACE=1).

This is the measurement companion to docs/tpu_performance.md's open
question: the dilated sweep reaches ~12.7 TF/s with bf16 ≈ f32 (so not
MXU-bound) and low HBM traffic — the per-stage ablation pinpoints the
binding stage before any further kernel work (Pallas or otherwise).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timed(fn, *args, reps=3):
    import jax.numpy as jnp
    out = fn(*args)
    float(jnp.sum(out))                      # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()       # cost_analysis recompiles: make it a hit
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_model
    from elektronn2_tpu.neuromancer.inference import dilated_dense_forward
    from elektronn2_tpu.utils.profiling import cost_analysis

    print("devices:", jax.devices())
    model = _flagship_model(mfp=True, patch=[23, 103, 103])
    vol = jax.device_put(
        np.random.RandomState(0).rand(1, 48, 384, 384).astype(np.float32))
    float(jnp.sum(vol))
    n_vox_in = float(np.prod(vol.shape[1:]))
    results = {}

    # 1+2. lowering x dtype matrix over the full graph
    for impl in ("direct", "s2b"):
        for dtype in (None, "bfloat16"):
            model.set_compute_dtype(dtype)
            fn = jax.jit(lambda p, s, v, impl=impl: dilated_dense_forward(
                model, v, params=p, state=s, impl=impl))
            dt, out = timed(fn, model.params, model.state, vol)
            mvox = float(np.prod(out.shape[1:])) / dt / 1e6
            key = f"{impl}/{dtype or 'f32'}"
            ca = cost_analysis(fn, model.params, model.state, vol)
            tf = (ca["flops"] / dt / 1e12
                  if ca and "flops" in ca else None)
            results[key] = {"ms": round(dt * 1e3, 1),
                            "Mvox/s": round(mvox, 1),
                            "TF/s": round(tf, 2) if tf is not None
                            else None}
            print(key, results[key])
    model.set_compute_dtype(None)

    # 2b. ablations: convs-only (pools replaced by slicing — same output
    # extent arithmetic, no VPU windows) to bound the pools' share
    from elektronn2_tpu.ops.conv import conv as ops_conv

    def convs_only(params, v):
        x = v[None]
        dil = (1, 1, 1)
        for i in range(4):
            w = params[f"conv{i}"]["w"]
            b = params[f"conv{i}"]["b"]
            x = ops_conv(x, w, dilation=dil) + b.reshape(1, -1, 1, 1, 1)
            x = jnp.maximum(x, 0)
            node = model.nodes[f"conv{i}"]
            pool = node.pool_shape
            if any(p > 1 for p in pool):
                # stand-in for the dilated pool: same extent trim, no window
                trim = [d * (p - 1) for d, p in zip(dil, pool)]
                x = x[:, :, :x.shape[2] - trim[0],
                      :x.shape[3] - trim[1], :x.shape[4] - trim[2]]
                dil = tuple(d * p for d, p in zip(dil, pool))
        w = params["barrier"]["w"]
        return ops_conv(x, w, dilation=dil)

    fn = jax.jit(convs_only)
    dt, out = timed(fn, model.params, vol)
    results["convs_only/f32"] = {"ms": round(dt * 1e3, 1)}
    print("convs_only/f32", results["convs_only/f32"])

    if os.environ.get("PROFILE_TRACE"):
        from elektronn2_tpu.utils import profiling
        fn = jax.jit(lambda p, s, v: dilated_dense_forward(
            model, v, params=p, state=s))
        with profiling.trace("/tmp/jax-trace-dense"):
            out = fn(model.params, model.state, vol)
            float(jnp.sum(out))
        print("trace: /tmp/jax-trace-dense")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
