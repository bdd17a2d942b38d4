"""Pool-rollout throughput: respawning trace_pool vs plain trace_batch.

The r3 champion rollout (B=512, K=256) reported 1.71M RAW agent-steps/s
with alive≈0.61 — 39% of its extraction+model cost bought nothing because
dead agents ride the scan to the end (VERDICT r3 weak #1). ``trace_pool``
respawns dead slots from a device-resident seed queue INSIDE the scan
(zero extra host syncs), so slot utilization stays near 1 until the queue
drains. This script measures what that buys at deployment scale:

  * plain ``trace_batch`` at the champion config: raw sps, alive
    fraction, and EFFECTIVE sps (raw x alive — the honest number);
  * ``trace_pool`` at matched slot counts over a longer seed queue:
    effective agent-steps/s (recorded steps / wall), consumed seeds,
    slot utilization;
  * a B sweep around the champion to re-check the B=1024 cliff under
    the pool program (its respawn adds cumsum+gather to the body).

Seeds are drawn in the volume interior; the step head is scaled so agents
live O(tens) of steps (mimicking the measured alive 0.61 regime —
all-alive agents would show no pool benefit by construction).

Usage: python scripts/exp_tracer_pool.py [--steps 256] [--vol 256]
       [--patch 16] [--batches 256,512,768,1024] [--queue-mult 4]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from exp_tracer_rollout import build_model  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--vol", type=int, default=256)
    ap.add_argument("--patch", type=int, default=16)
    ap.add_argument("--batches", default="256,512,768,1024")
    ap.add_argument("--queue-mult", type=int, default=4,
                    help="seed queue length = mult x B")
    ap.add_argument("--step-scale", type=float, default=1.0)
    args = ap.parse_args()

    import os
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.data.tracing_utils import DeviceTracer

    print("device:", jax.devices(), flush=True)
    patch = (args.patch,) * 3
    model = build_model(patch)
    V = args.vol
    vol = jax.random.uniform(jax.random.PRNGKey(0), (1, V, V, V),
                             jnp.float32)
    vol.block_until_ready()
    K = args.steps
    rng = np.random.RandomState(1)
    results = {}

    for B in [int(b) for b in args.batches.split(",")]:
        tracer = DeviceTracer(model, vol, max_steps=K, min_step=0.0,
                              step_scale=args.step_scale)
        seeds = jnp.asarray(rng.uniform(V * 0.1, V * 0.9, (B, 3)),
                            jnp.float32)

        # ---- plain rollout baseline (sustained, double warm-up; sync
        # by checksum fetch — axon's block_until_ready does not reliably
        # flush, see bench.py::_sustained) ------------------------------
        fn = tracer._build()
        for _ in range(2):
            traj, alive = fn(model.params, model.state, tracer.volume,
                             seeds)
            float(jnp.sum(traj))
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for _ in range(2):
                traj, alive = fn(model.params, model.state,
                                 tracer.volume, seeds)
                acc = acc + jnp.sum(traj)
            float(acc)
            dt = (time.perf_counter() - t0) / 2
            best = dt if best is None else min(best, dt)
        alive_frac = float(jnp.mean(alive.astype(jnp.float32)))
        raw = B * K / best
        row = {"raw_sps": round(raw, 0), "alive": round(alive_frac, 3),
               "eff_sps_batch": round(raw * alive_frac, 0)}

        # ---- pool rollout: queue of mult*B seeds, same slot count -----
        N = args.queue_mult * B
        pseeds = jnp.asarray(rng.uniform(V * 0.1, V * 0.9, (N, 3)),
                             jnp.float32)
        # size the dispatch to the measured regime: mean agent lifetime
        # ~= alive_frac * K (baseline), so the queue drains in about
        # N * life / B slot-steps; +K margin lets the last consumers
        # finish their full budget (t_cut semantics)
        total = int(N * max(0.05, alive_frac) * K / B) + K
        pfn = tracer._pool_fns.get(("pool", B, total, N)) \
            if hasattr(tracer, "_pool_fns") else None
        if pfn is None:
            pfn = tracer._build_pool(B, total, N)
        for _ in range(2):
            traj, moved, ids, used = pfn(model.params, model.state,
                                         tracer.volume, pseeds)
            float(jnp.sum(traj))
        bestp = None
        for _ in range(2):
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for _ in range(2):
                traj, moved, ids, used = pfn(model.params, model.state,
                                             tracer.volume, pseeds)
                acc = acc + jnp.sum(traj)
            float(acc)
            dt = (time.perf_counter() - t0) / 2
            bestp = dt if bestp is None else min(bestp, dt)
        eff_steps = int(jnp.sum(moved))
        row.update({
            "pool_eff_sps": round(eff_steps / bestp, 0),
            "pool_util": round(eff_steps / (B * total), 3),
            "pool_consumed": int(used),
            "pool_total_steps": total,
            "pool_raw_slot_sps": round(B * total / bestp, 0),
        })
        results[B] = row
        print(f"B={B}: {row}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
