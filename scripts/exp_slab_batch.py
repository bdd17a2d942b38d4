"""Slab-batch A/B on the champion serving config (s2bg+zfold+bf16):
sustained throughput of the batched dilated dense program at batch=1
vs batch=2 (the ``sweep_knossos(slab_batch=N)`` serving mode).

Rationale: conv maps (spatial x batch) onto the MXU M dim and Cout onto
N; batch>1 does NOT fix the Cout=40 N-lane underfill, but it halves the
per-dispatch overheads (program prologue/epilogue, dispatch) per slab and
gives XLA a longer schedule to overlap. Whether that wins at these slab
sizes is an empirical question — this script answers it. On-device data;
sustained protocol (K dispatches, one sync).
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
    from elektronn2_tpu.neuromancer.inference import dilated_dense_forward

    model = _flagship_model(mfp=True, patch=[23, 103, 103])
    vol_shape = tuple(int(v) for v in os.environ.get(
        "BENCH_VOL", "64,512,512").split(","))
    impl = os.environ.get("IMPL", "s2bg")
    zfold = os.environ.get("ZFOLD", "1") == "1"
    cdtype = os.environ.get("CDTYPE", "bfloat16") or None
    K = int(os.environ.get("K", "4"))
    model.set_dilated_impl(impl, zfold=zfold)
    model.set_compute_dtype(cdtype)
    label = impl + ("+zfold" if zfold else "") + (f"+{cdtype}" if cdtype
                                                 else "")
    for batch in (int(b) for b in os.environ.get("BATCHES", "1,2").split(",")):
        vol = jax.random.uniform(jax.random.PRNGKey(0),
                                 (batch, 1) + vol_shape, jnp.float32)
        float(jnp.sum(vol))
        fn = jax.jit(lambda p, s, v: dilated_dense_forward(
            model, v, batch=True, params=p, state=s, impl=impl))
        try:
            out = fn(model.params, model.state, vol)
            float(jnp.sum(out))               # compile + sync
            t0 = time.perf_counter()
            outs = [fn(model.params, model.state, vol) for _ in range(K)]
            s = jnp.float32(0)
            for o in outs:
                s = s + jnp.sum(jnp.asarray(o, jnp.float32))
            float(s)
            dt = time.perf_counter() - t0
        except Exception as e:                # OOM / compile-helper outage
            print(json.dumps({"impl": label, "batch": batch,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        vox = float(np.prod(out.shape[2:])) * batch * K
        print(json.dumps({"impl": label, "batch": batch, "K": K,
                          "ms_per_slab": round(dt * 1e3 / (batch * K), 1),
                          "sustained_mvox_s": round(vox / dt / 1e6, 2),
                          "vol": vol_shape}), flush=True)


if __name__ == "__main__":
    main()
