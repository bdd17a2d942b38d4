"""Attribution probe for the fused tracer rollout body (r3).

The r3 rollout study saturates at B≈256 with ~781 µs/scan-step — past
there cost grows linearly with agents, i.e. the body is compute-bound.
The body has two halves: trilinear patch extraction (8 blended
``dynamic_slice`` corners per agent) and the model step (Perceptron
encoder + GRU + head matmuls). This probe times whole-program variants
(truncated-prefix attribution is unreliable; each variant is a complete
rollout):

  * full     — the production rollout;
  * extract  — patch extraction only (model replaced by a fold of the
               patch into a 3-vector: keeps positions moving);
  * model    — model step only (extraction replaced by a position-
               broadcast fill: keeps data dependence on pos, no slices).

Usage: python scripts/exp_tracer_body.py [--b 256] [--k 256] [--patch 16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--patch", type=int, default=16)
    ap.add_argument("--vol", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()

    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    from scripts.exp_tracer_rollout import build_model

    print("device:", jax.devices(), flush=True)
    patch = (args.patch,) * 3
    model = build_model(patch)
    key = jax.random.PRNGKey(0)
    vol = jax.random.uniform(key, (1, args.vol, args.vol, args.vol),
                             jnp.float32)
    vol.block_until_ready()
    rng = np.random.RandomState(1)
    B, K = args.b, args.k
    seeds = jnp.asarray(rng.uniform(10, args.vol - 10, (B, 3)),
                        jnp.float32)

    tracer = DeviceTracer(model, vol, max_steps=K, min_step=0.0)

    def timed(fn, label):
        # sync by checksum fetch — axon's block_until_ready does not
        # reliably flush queued executions (r4 finding, bench.py protocol)
        traj, alive = fn(model.params, model.state, tracer.volume, seeds)
        float(jnp.sum(traj))
        for _ in range(2):
            traj, alive = fn(model.params, model.state, tracer.volume,
                             seeds)
            float(jnp.sum(traj))
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for _ in range(args.repeats):
                traj, alive = fn(model.params, model.state, tracer.volume,
                                 seeds)
                acc = acc + jnp.sum(traj)
            float(acc)
            dt = (time.perf_counter() - t0) / args.repeats
            best = dt if best is None else min(best, dt)
        print(f"{label:8s} {best * 1e3:8.2f} ms/rollout  "
              f"{best / K * 1e6:7.1f} us/step  "
              f"{B * K / best / 1e3:8.1f} K agent-steps/s", flush=True)
        return best

    # full production rollout
    full = timed(tracer._build(), "full")

    # extraction-only: replace the model step by a cheap fold
    margin = jnp.asarray(patch, jnp.float32) / 2.0 + 1.0
    dims = jnp.asarray(vol.shape[1:], jnp.float32)

    def inbounds(pos):
        return jnp.all((pos >= margin) & (pos < dims - margin), axis=1)

    def make_rollout(extract, step_from_patch):
        def rollout(params, state, v, s):
            def body(carry, _):
                pos, alive = carry
                patches = jax.vmap(lambda q: extract(v, q))(pos)
                step = step_from_patch(params, state, patches)
                newpos = pos + step
                pos = jnp.where(alive[:, None], newpos, pos)
                alive = alive & inbounds(newpos)
                return (pos, alive), (pos, alive)

            _, (traj, alive) = jax.lax.scan(
                body, (s, inbounds(s)), None, length=K)
            return traj, alive
        return jax.jit(rollout)

    def fold_step(params, state, patches):
        f = patches.reshape(patches.shape[0], -1)
        n = f.shape[1] // 3 * 3
        return (f[:, :n].reshape(f.shape[0], -1, 3).mean(1) - 0.5) * 0.3

    timed(make_rollout(tracer._extract, fold_step), "extract")

    # PALLAS-extraction-only: the production kernel with the cheap fold
    # step (B-sweep this leg to attribute the B=1024 cliff — r4)
    from elektronn2_tpu.ops.pallas_extract import (extract_eligible,
                                                   trilinear_patches_pallas)
    if extract_eligible(vol.shape, vol.dtype, patch):
        def rollout_pallas(params, state, v, s):
            def body(carry, _):
                pos, alive = carry
                patches = trilinear_patches_pallas(v, pos, patch)
                step = fold_step(params, state, patches)
                newpos = pos + step
                pos = jnp.where(alive[:, None], newpos, pos)
                alive = alive & inbounds(newpos)
                return (pos, alive), (pos, alive)
            _, (traj, alive) = jax.lax.scan(
                body, (s, inbounds(s)), None, length=K)
            return traj, alive
        timed(jax.jit(rollout_pallas), "pextract")

    # model-only: patches filled from pos (no slices, data dep kept)
    carry0 = tracer._init_carry(model.params, model.state, B)

    def const_extract(v, q):
        return jnp.broadcast_to(
            (q.sum() * 1e-3).astype(jnp.float32),
            (v.shape[0],) + patch)

    def model_step(params, state, patches):
        # reuse the production cell-step path with the real carry
        pred, _ = tracer._step_apply(params, state, patches, carry0)
        return pred.reshape(patches.shape[0], -1)[:, :3] * 0.1

    timed(make_rollout(const_extract, model_step), "model")


if __name__ == "__main__":
    main()
