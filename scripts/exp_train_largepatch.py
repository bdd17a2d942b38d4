"""Large-patch training attribution (VERDICT r2 item 1b).

r2 closed the SMALL-patch training question: at [15,55,55] patches the
fused step is dispatch/fusion-bound, not MXU-bound (bf16 A/B identical —
docs/tpu_performance.md). But spatial-sharded training exists precisely to
train on big slabs, where the convs must eventually bind, and the Pallas
tail kernel has no VJP — so the open question is whether a training-path
kernel (a VJP / transpose-kernel pair for ``ops/pallas_tailconv.py``)
would pay at production patch sizes.

Methodology (same as r2's small-patch closure): whole-program bf16-vs-f32
A/B of the fused train step across a PATCH SWEEP. bf16 halves MXU time
and nothing else, so
  * bf16 ≈ f32   → the step is NOT MXU-bound at that size → a Pallas
                   kernel cannot pay (measured rejection);
  * bf16 << f32  → convs bind → a kernel VJP is worth building.
Per-op timing attribution is deliberately avoided (truncated-prefix
measurements are unreliable under XLA fusion — r2 s10).

Also prints input-Mvox/s so the slab-regime numbers are comparable with
serving throughput, and an f32 per-step (unfused) point at the largest
patch for the dispatch-amortisation picture.

Usage: python scripts/exp_train_largepatch.py [--chunks 3] [--inner 4]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _model(batch, patch, cdtype):
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.utils.cnncalculator import cnncalculator

    filters = [(1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3)]
    pools = [(1, 2, 2), (1, 2, 2), (1, 1, 1), (1, 1, 1)]
    nof = [20, 30, 40, 40]
    calc = cnncalculator(filters, pools, desired_patch_size=list(patch),
                         mfp=False, ndim=3)
    z, x, y = calc.input
    nm.model_manager.reset(seed=0)
    inp = nm.Input([batch, 1, z, x, y], "b,f,z,x,y", name="raw")
    h = inp
    for i, (f, p, nf) in enumerate(zip(filters, pools, nof)):
        h = nm.Conv(h, nf, f, p, name=f"conv{i}")
    out = nm.Conv(h, 2, 1, 1, activation_func="lin", name="cls")
    probs = nm.Softmax(out, name="probs")
    tgt = nm.Input([batch, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True, name="nll")
    m = nm.model_manager.getmodel("lp")
    m.designate_nodes(input_node=inp, target_node=tgt,
                      loss_node=nm.AggregateLoss(nll),
                      prediction_node=probs)
    m.set_compute_dtype(cdtype)
    m.set_opt("Adam", lr=1e-3)
    return m, tuple(calc.input), tuple(calc.output), tuple(calc.pred_stride)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--inner", type=int, default=4)
    args = ap.parse_args()

    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    import jax
    from elektronn2_tpu.ops.warp import DeviceBatchAugmenter
    from elektronn2_tpu.training.fused_loop import FusedTrainLoop

    print("device:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    # cubes big enough for the largest patch's warp margin
    raws = [rng.rand(1, 72, 200, 200).astype(np.float32) for _ in range(2)]
    labs = [(rng.rand(72, 200, 200) > 0.5).astype(np.int16)
            for _ in range(2)]

    # (batch, desired patch): small-patch r2 baseline, the mid regime,
    # and spatial-training-sized slabs (batch 1)
    grid = [(8, (15, 55, 55)),
            (2, (23, 103, 103)),
            (1, (31, 151, 151)),
            (1, (47, 183, 183))]
    results = {}
    for B, patch in grid:
        row = {}
        for cdtype in (None, "bfloat16"):
            try:
                m, pin, pout, stride = _model(B, patch, cdtype)
                aug = DeviceBatchAugmenter(
                    raws, labs, patch_size=pin, target_size=pout,
                    target_strides=stride, grey_channels=[0], seed=0)
                loop = FusedTrainLoop(m, aug, batch_size=B,
                                      n_inner=args.inner, warp=0.5, seed=0)
                loop.run_chunk()
                loop.run_chunk()                 # double warm-up
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    for _ in range(args.chunks):
                        losses, _ = loop.run_chunk()
                    np.asarray(losses)
                    dt = ((time.perf_counter() - t0)
                          / (args.chunks * args.inner))
                    best = dt if best is None else min(best, dt)
                assert np.isfinite(np.asarray(losses)).all()
                row[cdtype or "f32"] = {
                    "ms_per_it": round(best * 1e3, 2),
                    "it_per_s": round(1 / best, 1),
                    "Mvox_in_s": round(
                        B * float(np.prod(pin)) / best / 1e6, 1)}
                print(f"B={B} patch={pin} {cdtype or 'f32':8s} "
                      f"{best * 1e3:8.2f} ms/it  "
                      f"{B * float(np.prod(pin)) / best / 1e6:7.1f} "
                      f"Mvox_in/s", flush=True)
            except Exception as e:
                row[cdtype or "f32"] = f"failed: {type(e).__name__}"
                print(f"B={B} patch={patch} {cdtype or 'f32'} FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
        results[f"b{B}_{'x'.join(map(str, patch))}"] = row

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
