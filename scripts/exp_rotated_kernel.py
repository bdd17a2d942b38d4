"""Rotated-extraction kernel study (VERDICT r4 #3).

r4 position: ``DeviceTracer(rotate_to_heading=True)`` = whole-volume
8-corner XLA gather per step = ~2.4 K agent-steps/s; windowed
dynamic_slice variant measured SLOWER (1.9 K). This script measures the
r5 Pallas kernel (ops/pallas_extract_rot.py) on the real chip:

  A. extraction-only A/B: XLA gather oracle vs kernel f32 vs kernel
     bf16 at the bench geometry (B x 16^3 patches, 256^3 volume);
  B. on-chip parity: kernel vs oracle on ok-masked agents;
  C. full rotated rollout agent-steps/s: oracle path vs kernel paths
     (the bench-able probe: GRU tracer model, B agents, K steps).

All timing windows sync by checksum fetch (axon: block_until_ready does
not flush queued executions — tpu-tunnel protocol).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def sustained(call, K=4, windows=2):
    import jax.numpy as jnp
    out = call()
    float(jnp.sum(out))
    float(jnp.sum(call()))              # double warm-up
    best = None
    for _ in range(windows):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(K):
            acc = acc + jnp.sum(call())
        assert np.isfinite(float(acc))
        dt = (time.perf_counter() - t0) / K
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--patch", type=int, nargs=3, default=[16, 16, 16])
    ap.add_argument("--rollout", action="store_true",
                    help="also run the full-rollout A/B (leg C)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    from elektronn2_tpu.data.tracing_utils import (DeviceTracer,
                                                   _flight_frame_jnp)
    from elektronn2_tpu.ops.pallas_extract_rot import (
        rotated_patches_pallas, rotated_extract_eligible)

    patch = tuple(args.patch)
    B = args.b
    vol = jax.random.uniform(jax.random.PRNGKey(0), (1, 256, 256, 256),
                             jnp.float32)
    float(jnp.sum(vol))
    assert rotated_extract_eligible(vol.shape, vol.dtype, patch)

    rng = np.random.RandomState(1)
    pos = jnp.asarray(rng.uniform(24, 232, (B, 3)), jnp.float32)
    heads = jnp.asarray(rng.randn(B, 3), jnp.float32)
    frames = jax.jit(jax.vmap(_flight_frame_jnp))(heads)
    frames.block_until_ready()

    class _Stub:
        patch_size = patch
        _extract_rot_batch = DeviceTracer._extract_rot_batch
    stub = _Stub()
    oracle = jax.jit(lambda v, p, h: stub._extract_rot_batch(v, p, h))

    # ---- A: extraction-only -------------------------------------------
    dt_o = sustained(lambda: oracle(vol, pos, heads)[0], K=2)
    print(json.dumps({"leg": "extract_oracle", "ms": round(dt_o * 1e3, 2),
                      "per_agent_us": round(dt_o / B * 1e6, 2)}),
          flush=True)
    legs = ([(cdt, var, None) for cdt in ("float32", "bfloat16")
             for var in ("bigk", "fact2", "probe", "mxb", "sepa")]
            + [("float32", var, "high") for var in ("bigk", "mxb",
                                                    "sepa")])
    for cdt, var, precision in legs:
        tag = (f"extract_kernel_{cdt}_{var}"
               + ("_high" if precision else ""))
        try:
            dt_k = sustained(lambda: rotated_patches_pallas(
                vol, pos, frames, patch, compute_dtype=cdt,
                variant=var, precision=precision)[0], K=8)
        except Exception as e:   # noqa: BLE001 — variant-tolerant
            print(json.dumps({"leg": tag, "error":
                              f"{type(e).__name__}: {str(e)[:110]}"}),
                  flush=True)
            continue
        print(json.dumps({"leg": tag,
                          "ms": round(dt_k * 1e3, 3),
                          "per_agent_us": round(dt_k / B * 1e6, 2),
                          "speedup_vs_oracle":
                          round(dt_o / dt_k, 1)}), flush=True)

    # ---- B: on-chip parity --------------------------------------------
    ref, ok_ref, _ = oracle(vol, pos, heads)
    for cdt, var, precision in (("float32", "bigk", None),
                                ("float32", "sepa", None),
                                ("float32", "bigk", "high"),
                                ("float32", "sepa", "high"),
                                ("float32", "mxb", None),
                                ("bfloat16", "bigk", None),
                                ("bfloat16", "sepa", None)):
        got, ok = rotated_patches_pallas(vol, pos, frames, patch,
                                         compute_dtype=cdt, variant=var,
                                         precision=precision)
        m = np.asarray(ok_ref)
        d = float(jnp.max(jnp.abs(got[m] - ref[m])))
        okeq = bool(jnp.all(ok == ok_ref))
        print(json.dumps({"leg": f"parity_{cdt}_{var}"
                          + ("_high" if precision else ""),
                          "maxdiff": d,
                          "ok_equal": okeq, "ok_frac":
                          round(float(jnp.mean(ok_ref.astype(
                              jnp.float32))), 3)}), flush=True)

    # ---- C: full rotated rollout --------------------------------------
    if args.rollout:
        from scripts.exp_tracer_rollout import build_model
        model = build_model(patch)
        seeds = jnp.asarray(rng.uniform(24, 232, (B, 3)), jnp.float32)
        variants = [("oracle", False, "float32", None),
                    ("kernel_f32", True, "float32", None),
                    ("kernel_f32_high", True, "float32", "high"),
                    ("kernel_bf16", True, "bfloat16", None)]
        for name, use_k, cdt, rprec in variants:
            tr = DeviceTracer(model, vol, max_steps=args.k, min_step=0.0,
                              rotate_to_heading=True, use_pallas_rot=use_k,
                              rot_compute_dtype=cdt, rot_precision=rprec)
            fn = tr._build()
            t0 = time.perf_counter()
            traj, alive = fn(model.params, model.state, tr.volume, seeds)
            float(jnp.sum(traj))
            compile_s = time.perf_counter() - t0
            dt = sustained(lambda: fn(model.params, model.state,
                                      tr.volume, seeds)[0],
                           K=2, windows=2)
            sps = B * args.k / dt
            print(json.dumps({"leg": f"rollout_{name}",
                              "sps": round(sps, 0),
                              "ms_per_step": round(dt / args.k * 1e3, 3),
                              "compile_s": round(compile_s, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
