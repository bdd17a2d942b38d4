"""Device-augmentation A/B under the r2 sustained protocol (VERDICT r2
item 6): the 91.7 Mvox/s separable-core champion was an r1-protocol
number (single-dispatch best-of-5) — every other surface got re-measured
under the double-warm-up sustained protocol except augmentation.

Measures, on-chip:
  1. ``DeviceBatchAugmenter.getbatch`` throughput — separable MXU core vs
     trilinear gather, batch sweep, K back-to-back dispatches per sync,
     double warm-up, best-of-2 windows (bench.py protocol).
  2. Augmentation's share inside a fused training chunk at large batch:
     ``FusedTrainLoop.run_chunk`` with warp prob 1.0 vs 0.0 (the
     augmentation leg compiled in vs branchless-skipped) — the r1 "overlap"
     claim, re-measured whole-program (truncated-prefix attribution is
     unreliable; whole-program deltas are the only trustworthy
     attribution on this toolchain — docs/tpu_performance.md).

Usage: python scripts/exp_augment_sustained.py [--k 8] [--batches 8,16,32]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _sustained(call, K):
    import jax.numpy as jnp
    out = call()
    _ = [float(jnp.sum(jnp.asarray(o, jnp.float32))) for o in out]
    _ = [float(jnp.sum(jnp.asarray(o, jnp.float32))) for o in call()]
    best = None
    for _w in range(2):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(K):
            acc = acc + sum(jnp.sum(jnp.asarray(o, jnp.float32))
                            for o in call())
        assert np.isfinite(float(acc))
        dt = (time.perf_counter() - t0) / K
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--chunks", type=int, default=4)
    args = ap.parse_args()

    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    import jax
    from elektronn2_tpu.ops.warp import DeviceBatchAugmenter
    from elektronn2_tpu.training.fused_loop import FusedTrainLoop
    from scripts.bench_tpu_pending import _neuro3d_model

    print("device:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    raws = [rng.rand(1, 160, 160, 160).astype(np.float32)
            for _ in range(2)]
    labs = [(rng.rand(160, 160, 160) > 0.5).astype(np.int16)
            for _ in range(2)]
    patch = (128, 128, 128)
    results = {}
    for mode in ("separable", "gather"):
        for B in [int(b) for b in args.batches.split(",")]:
            try:
                aug = DeviceBatchAugmenter(
                    raws, labs, patch_size=patch, elastic_sigma=3.0,
                    grey_channels=[0], resample=mode, seed=0)
                dt = _sustained(
                    lambda: aug.getbatch(batch_size=B, warp=1.0), args.k)
            except Exception as e:           # OOM at large B — record
                results[f"{mode}/b{B}"] = f"failed: {type(e).__name__}"
                print(f"{mode:9s} B={B:3d}  FAILED "
                      f"({type(e).__name__})", flush=True)
                continue
            mvox = B * float(np.prod(patch)) / dt / 1e6
            results[f"{mode}/b{B}"] = round(mvox, 1)
            print(f"{mode:9s} B={B:3d}  {dt * 1e3:7.1f} ms/batch  "
                  f"{mvox:7.1f} Mvox/s", flush=True)

    # --- augmentation share inside a fused chunk, large batch ----------
    B, K = 8, 16
    for warp_p, label in ((1.0, "warp=1.0"), (0.0, "warp=0.0")):
        model, pin, pout, stride = _neuro3d_model(B, bf16=False)
        aug = DeviceBatchAugmenter(raws, labs, patch_size=pin,
                                   target_size=pout,
                                   target_strides=stride,
                                   grey_channels=[0], seed=0)
        loop = FusedTrainLoop(model, aug, batch_size=B, n_inner=K,
                              warp=warp_p, seed=0)
        loop.run_chunk()
        loop.run_chunk()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.chunks):
                losses, _ = loop.run_chunk()
            np.asarray(losses)
            dt = (time.perf_counter() - t0) / (args.chunks * K)
            best = dt if best is None else min(best, dt)
        results[f"fused_b{B}/{label}"] = {
            "ms_per_it": round(best * 1e3, 2),
            "it_per_s": round(1 / best, 1)}
        print(f"fused chunk B={B} {label}: {best * 1e3:6.2f} ms/it "
              f"({1 / best:6.1f} it/s)", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
