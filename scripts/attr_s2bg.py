"""Per-layer attribution of the dilated dense sweep (direct vs s2bg).

Times truncated graphs (prediction = conv0, conv1, ..., probs); the delta
between successive prefixes attributes wall time per layer. One JSON line
per (impl, prefix).
"""

import json
import os
import sys
import time
import types

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
        "BENCH_VOL", "48,384,384").split(","))
    rng = np.random.RandomState(0)
    vol = jax.device_put(rng.rand(1, *vol_shape).astype(np.float32))
    float(jnp.sum(vol))

    chain = ["conv0", "conv1", "conv2", "conv3", "barrier", "probs"]
    impls = os.environ.get("IMPLS", "direct,s2bg").split(",")
    for impl in impls:
        prev = 0.0
        for upto in chain:
            proxy = types.SimpleNamespace(
                prediction_node=model.nodes[upto],
                input_node=model.input_node,
                params=model.params, state=model.state,
                _compute_dtype=getattr(model, "_compute_dtype", None),
                _dilated_impl=impl)
            fn = jax.jit(lambda p, s, v, proxy=proxy, impl=impl:
                         dilated_dense_forward(proxy, v, params=p, state=s,
                                               impl=impl))
            out = fn(model.params, model.state, vol)
            float(jnp.sum(out))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(model.params, model.state, vol)
                float(jnp.sum(out))
                ts.append(time.perf_counter() - t0)
            dt = min(ts) * 1e3
            print(json.dumps({"impl": impl, "upto": upto,
                              "ms": round(dt, 1),
                              "layer_ms": round(dt - prev, 1)}), flush=True)
            prev = dt


if __name__ == "__main__":
    main()
