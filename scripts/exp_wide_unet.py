"""Wide-channel (64/128/256) U-Net MFU campaign (VERDICT r3 #3).

Every serving/training perf conclusion so far is conditioned on the
flagship's 20-40 output channels — lane-underfilled on the 128-wide MXU,
where bf16/int8/Winograd all measured as losses BECAUSE the fill, not the
math, was the binder. This campaign measures the framework on a graph
where the MXU is actually fillable (examples/unet3d_wide.py: 64->128->256
encoder, the shape of modern EM nets):

  * SERVING: whole-volume conv-dense throughput across lowerings
    (default / d2s+zfold / +ptail) x dtype (f32 / bf16) x slab shapes,
    reported as Mvox/s AND achieved TF/s vs the v5e ceilings
    (197 TF/s bf16 peak; 66 TF/s measured f32-dot bound) — whole-graph
    MFU, not a microbenchmark;
  * the bf16 question RE-ASKED: the r2 rejection was underfill-
    conditioned and should flip when lanes fill;
  * Pallas tail-kernel eligibility at wide C (mstack geometry was
    designed at C<=40 — measured, not assumed);
  * TRAINING: f32-vs-bf16 whole-program A/B (the r2/r3 method: bf16
    halves MXU time and nothing else, so bf16 ~= f32 means not
    MXU-bound; bf16 << f32 means the convs finally bind).

FLOP accounting is exact per conv (2*prod(k)*Cin*Cout per output voxel,
output voxels scaled by the node's cumulative stride), walked from the
graph — so TF/s numbers are whole-graph facts, not estimates.

Usage: python scripts/exp_wide_unet.py [--slabs 32x256x256,48x320x320]
       [--serve-k 4] [--train] [--widths 64,128,256]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def graph_flops_per_invox(model):
    """Exact dense-serving FLOPs per INPUT voxel: for each Conv/UpConv
    under the prediction node, 2*prod(filter)*Cin*Cout per output voxel,
    with output voxels = input voxels / prod(cumulative stride)."""
    total = 0.0
    for node in model.prediction_node.all_parents():   # includes self
        t = type(node).__name__
        if t == "Conv":
            k = float(np.prod(node.filter_shape))
            cin = float(node.parents[0].shape["f"])
            rate = 1.0 / float(np.prod(node.shape.strides))
            total += 2.0 * k * cin * node.n_f * rate
        elif t == "UpConv":
            # transposed conv, kernel == stride: each OUTPUT voxel gets
            # exactly one tap per (cin, cout) pair
            cin = float(node.parents[0].shape["f"])
            rate = 1.0 / float(np.prod(node.shape.strides))
            total += 2.0 * cin * node.n_f * rate
    return total


def _sustained(call, K):
    """bench.py's sustained protocol: checksum-fetch syncs (on the axon
    tunnel, block_until_ready does NOT reliably flush queued executions —
    only a value fetch does; measured this session: 4 'dispatches' timed
    0.12 ms while the real execution was ~58 ms each)."""
    from bench import _sustained as bs
    out, dt_k = bs(call, K)
    return out, dt_k / K


def serve_campaign(widths, slabs, K):
    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.neuromancer.inference import (
        convolutional_dense_forward)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))
    from unet3d_wide import create_model

    model = create_model(batch=1, widths=widths)
    fpv = graph_flops_per_invox(model)
    print(f"widths={widths}: {fpv / 1e6:.3f} MFLOP per input voxel",
          flush=True)

    # dtype spec: (compute_dtype, activations_flag) — activations=True
    # STORES inter-layer activations in the dtype too, halving (bf16) or
    # quartering (int8) HBM traffic; the r4 f32-vs-bf16 operand-only
    # parity suggested the wide graph is bandwidth-, not MXU-rate-bound,
    # which makes the storage knob the interesting one
    combos = [
        ("f32 default", (None, False), {}),
        ("f32 d2s+zfold", (None, False), dict(upconv="d2s", zfold=True)),
        ("f32 d2s+zfold+ptail", (None, False),
         dict(upconv="d2s", zfold=True, ptail=True)),
        ("bf16 default", ("bfloat16", False), {}),
        ("bf16 d2s+zfold", ("bfloat16", False),
         dict(upconv="d2s", zfold=True)),
        ("bf16+act default", ("bfloat16", True), {}),
        ("int8 default", ("int8", False), {}),
    ]
    results = {}
    for slab in slabs:
        vol = jax.random.uniform(jax.random.PRNGKey(0), (1, 1, *slab),
                                 jnp.float32)
        vol.block_until_ready()
        n_vox = float(np.prod(slab))
        for name, (dtype, act), impl in combos:
            try:
                model.set_compute_dtype(dtype, activations=act)
            except TypeError:
                model.set_compute_dtype(dtype)
            model.set_convdense_impl(**impl)
            fn = jax.jit(lambda p, s, v: convolutional_dense_forward(
                model, v, batch=True, params=p, state=s))
            try:
                out, dt = _sustained(
                    lambda: fn(model.params, model.state, vol), K)
            except Exception as e:
                results[f"{'x'.join(map(str, slab))} {name}"] = \
                    f"FAILED: {type(e).__name__}: {str(e)[:120]}"
                print(f"  {slab} {name}: FAILED {e}", flush=True)
                continue
            mvox = n_vox / dt / 1e6
            tfs = fpv * n_vox / dt / 1e12
            row = {"Mvox_s": round(mvox, 1), "TF_s": round(tfs, 1),
                   "pct_bf16_peak": round(100 * tfs / 197.0, 1),
                   "ms": round(dt * 1e3, 2)}
            results[f"{'x'.join(map(str, slab))} {name}"] = row
            print(f"  {slab} {name}: {row}", flush=True)
            model.set_compute_dtype(None)
            model.set_convdense_impl()
    return results, fpv


def train_campaign(widths, fpv):
    import jax
    from elektronn2_tpu.training.fused_loop import FusedTrainLoop
    from elektronn2_tpu.ops.warp import DeviceBatchAugmenter
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))
    from unet3d_wide import create_model

    rng = np.random.RandomState(0)
    raws = [rng.rand(1, 48, 160, 160).astype(np.float32) for _ in range(2)]
    labs = [(rng.rand(48, 160, 160) > 0.5).astype(np.int16)
            for _ in range(2)]
    grid = [(2, (16, 64, 64)), (1, (24, 96, 96))]
    results = {}
    for B, patch in grid:
        for dtype in (None, "bfloat16"):
            try:
                m = create_model(batch=B, patch=patch, widths=widths)
                m.set_compute_dtype(dtype)
                m.set_opt("Adam", lr=1e-3)
                pin = tuple(int(s) for s in m.input_node.shape
                            .spatial_shape)
                pout = tuple(int(s) for s in m.prediction_node.shape
                             .spatial_shape)
                strides = tuple(int(s) for s in m.prediction_node.shape
                                .strides)
                aug = DeviceBatchAugmenter(
                    raws, labs, patch_size=pin, target_size=pout,
                    target_strides=strides, grey_channels=[0], seed=0)
                loop = FusedTrainLoop(m, aug, batch_size=B, n_inner=4,
                                      warp=0.5, seed=0)
                loop.run_chunk()
                loop.run_chunk()
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    for _ in range(2):
                        losses, _ = loop.run_chunk()
                    np.asarray(losses)
                    dt = (time.perf_counter() - t0) / (2 * 4)
                    best = dt if best is None else min(best, dt)
                assert np.isfinite(np.asarray(losses)).all()
                n_vox = B * float(np.prod(pin))
                # fwd+bwd ~= 3x forward FLOPs (standard accounting;
                # valid-conv edge effects make this an upper bound)
                tfs = 3.0 * fpv * n_vox / best / 1e12
                row = {"ms_it": round(best * 1e3, 2),
                       "Mvox_in_s": round(n_vox / best / 1e6, 2),
                       "approx_TF_s": round(tfs, 1),
                       "pct_bf16_peak": round(100 * tfs / 197.0, 1)}
                results[f"b{B}@{'x'.join(map(str, patch))} "
                        f"{dtype or 'f32'}"] = row
                print(f"  train b{B}@{patch} {dtype or 'f32'}: {row}",
                      flush=True)
            except Exception as e:
                results[f"b{B}@{'x'.join(map(str, patch))} "
                        f"{dtype or 'f32'}"] = \
                    f"FAILED: {type(e).__name__}: {str(e)[:120]}"
                print(f"  train b{B}@{patch} {dtype}: FAILED {e}",
                      flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slabs", default="32x256x256,48x320x320")
    ap.add_argument("--serve-k", type=int, default=4)
    ap.add_argument("--widths", default="64,128,256")
    ap.add_argument("--no-train", action="store_true")
    args = ap.parse_args()

    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    import jax
    print("device:", jax.devices(), flush=True)

    widths = tuple(int(w) for w in args.widths.split(","))
    slabs = [tuple(int(s) for s in sl.split("x"))
             for sl in args.slabs.split(",")]
    serve, fpv = serve_campaign(widths, slabs, args.serve_k)
    out = {"serve": serve, "flops_per_invox": fpv}
    if not args.no_train:
        out["train"] = train_campaign(widths, fpv)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
