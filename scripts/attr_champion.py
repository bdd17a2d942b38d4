"""Per-layer attribution of the champion dense lowering (s2bg+zfold+bf16).

Times truncated graphs under the SUSTAINED protocol (K back-to-back
dispatches, one sync — the sweep_knossos serving pattern) so the tunnel
dispatch floor is amortised out of the deltas. One JSON line per prefix.

Caveat (docs/tpu_performance.md): truncated-prefix deltas are noisy because
XLA fuses differently per prefix — trust whole-program deltas; treat
per-layer numbers as direction, not gospel.
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
    # default 48x384x384: the truncated prefixes return un-decimated
    # f32 feature maps (40ch x full volume) — at 64x512x512 those
    # intermediates RESOURCE_EXHAUST the chip (observed), while the full
    # graph (2ch softmax output) fits
    vol_shape = tuple(int(v) for v in os.environ.get(
        "BENCH_VOL", "48,384,384").split(","))
    K = int(os.environ.get("BENCH_K", "4"))
    cdtype = os.environ.get("CDTYPE", "bfloat16") or None
    zfold = os.environ.get("ZFOLD", "1") == "1"
    ztap = os.environ.get("ZTAP", "0")    # 0 | native | f32 | concat
    ztap = False if ztap in ("0", "") else ztap
    impl = os.environ.get("IMPL", "s2bg")
    rng = np.random.RandomState(0)
    vol = jax.device_put(rng.rand(1, *vol_shape).astype(np.float32))
    float(jnp.sum(vol))

    chain = os.environ.get(
        "CHAIN", "conv0,conv1,conv2,conv3,barrier,probs").split(",")
    prev = 0.0
    for upto in chain:
        proxy = types.SimpleNamespace(
            prediction_node=model.nodes[upto],
            input_node=model.input_node,
            params=model.params, state=model.state,
            _compute_dtype=cdtype,
            _dilated_zfold=zfold,
            _dilated_ztap=ztap,
            _dilated_impl=impl)
        fn = jax.jit(lambda p, s, v, proxy=proxy, impl=impl:
                     dilated_dense_forward(proxy, v, params=p, state=s,
                                           impl=impl))
        try:
            out = fn(model.params, model.state, vol)
            float(jnp.sum(out))
        except Exception as e:
            print(json.dumps({"upto": upto,
                              "error": str(e)[:200]}), flush=True)
            continue
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                out = fn(model.params, model.state, vol)
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0) / K)
        dt = min(ts) * 1e3
        print(json.dumps({"impl": impl, "zfold": zfold, "cdtype": cdtype,
                          "upto": upto, "ms": round(dt, 1),
                          "layer_ms": round(dt - prev, 1)}), flush=True)
        prev = dt


if __name__ == "__main__":
    main()
