"""Wide-graph TRAINING campaign (VERDICT r4 #2): give training the
serving treatment — profile the fused chunk per-op instead of labelling
it, scale patch/batch to the HBM frontier (the 34->54 narrow-graph
lesson), try remat / bf16 activation storage as CAPACITY levers, and
re-A/B f32-vs-bf16 at the frontier.

r4 position: 8.3 Mvox-in/s at b1@24x96x96, ~23 TF/s fwd+bwd, 12% of
bf16 peak, binder recorded as "dispatch/fusion" from a two-point A/B.

Usage: python scripts/exp_wide_train.py [--profile-at 32,128,128]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_cfg(B, patch, dtype=None, remat=False, act=False, n_inner=4,
            widths=(64, 128, 256), zfold=False, skipsum=False):
    import jax
    from elektronn2_tpu.training.fused_loop import FusedTrainLoop
    from elektronn2_tpu.ops.warp import DeviceBatchAugmenter
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))
    from unet3d_wide import create_model

    rng = np.random.RandomState(0)
    src = tuple(min(300, p + 64) for p in patch)
    raws = [rng.rand(1, *src).astype(np.float32) for _ in range(2)]
    labs = [(rng.rand(*src) > 0.5).astype(np.int16) for _ in range(2)]
    m = create_model(batch=B, patch=patch, widths=widths)
    if dtype:
        try:
            m.set_compute_dtype(dtype, activations=act)
        except TypeError:
            m.set_compute_dtype(dtype)
    if remat:
        m.set_remat(True)
    if zfold or skipsum:
        m.set_train_lowering(zfold=zfold, skipsum=skipsum)
    m.set_opt("Adam", lr=1e-3)
    pin = tuple(int(s) for s in m.input_node.shape.spatial_shape)
    pout = tuple(int(s) for s in m.prediction_node.shape.spatial_shape)
    strides = tuple(int(s) for s in m.prediction_node.shape.strides)
    aug = DeviceBatchAugmenter(raws, labs, patch_size=pin,
                               target_size=pout, target_strides=strides,
                               grey_channels=[0], seed=0)
    loop = FusedTrainLoop(m, aug, batch_size=B, n_inner=n_inner,
                          warp=0.5, seed=0)
    loop.run_chunk()
    loop.run_chunk()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(2):
            losses, _ = loop.run_chunk()
        np.asarray(losses)
        dt = (time.perf_counter() - t0) / (2 * n_inner)
        best = dt if best is None else min(best, dt)
    assert np.isfinite(np.asarray(losses)).all()
    return m, loop, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile-at", default=None,
                    help="e.g. 32,128,128[:remat][:bf16]")
    ap.add_argument("--frontier", action="store_true")
    ap.add_argument("--lowerings", default=None,
                    help="B@patch for the train-lowering A/B, e.g. 1@32,128,128")
    args = ap.parse_args()
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    from scripts.exp_wide_unet import graph_flops_per_invox

    if args.frontier:
        grid = [(160, (16, 64, 64), dict(zfold=True)),
                (192, (16, 64, 64), dict(zfold=True)),
                ]
        fpv = None
        for B, patch, kw in grid:
            label = (f"b{B}@{'x'.join(map(str, patch))}"
                     + ("".join(f"+{k}" for k in kw)))
            try:
                m, loop, dt = run_cfg(B, patch, **kw)
                if fpv is None:
                    fpv = graph_flops_per_invox(m)
                n_vox = B * float(np.prod(patch))
                tfs = 3.0 * fpv * n_vox / dt / 1e12
                print(json.dumps({
                    "leg": label, "ms_it": round(dt * 1e3, 2),
                    "Mvox_in_s": round(n_vox / dt / 1e6, 2),
                    "approx_TF_s": round(tfs, 1),
                    "pct_bf16_peak": round(100 * tfs / 197.0, 1)}),
                    flush=True)
            except Exception as e:
                print(json.dumps({"leg": label, "error":
                                  f"{type(e).__name__}: {str(e)[:110]}"}),
                      flush=True)

    if args.lowerings:
        bs, ps = args.lowerings.split("@")
        B = int(bs)
        patch = tuple(int(v) for v in ps.split(","))
        fpv = None
        for name, kw in (("default", {}), ("zfold", dict(zfold=True)),
                         ("skipsum", dict(skipsum=True)),
                         ("zfold+skipsum",
                          dict(zfold=True, skipsum=True)),
                         ("zfold+skipsum+bf16",
                          dict(zfold=True, skipsum=True,
                               dtype="bfloat16"))):
            try:
                m, loop, dt = run_cfg(B, patch, **kw)
                if fpv is None:
                    fpv = graph_flops_per_invox(m)
                n_vox = B * float(np.prod(patch))
                tfs = 3.0 * fpv * n_vox / dt / 1e12
                print(json.dumps({
                    "leg": f"b{B}@{ps} {name}",
                    "ms_it": round(dt * 1e3, 2),
                    "Mvox_in_s": round(n_vox / dt / 1e6, 2),
                    "approx_TF_s": round(tfs, 1),
                    "pct_bf16_peak": round(100 * tfs / 197.0, 1)}),
                    flush=True)
            except Exception as e:
                print(json.dumps({"leg": f"b{B}@{ps} {name}", "error":
                                  f"{type(e).__name__}: {str(e)[:110]}"}),
                      flush=True)

    if args.profile_at:
        import jax
        import jax.numpy as jnp
        parts = args.profile_at.split(":")
        patch = tuple(int(v) for v in parts[0].split(","))
        kw = {}
        if "remat" in parts[1:]:
            kw["remat"] = True
        if "bf16" in parts[1:]:
            kw.update(dtype="bfloat16")
        m, loop, dt = run_cfg(1, patch, **kw)
        print(json.dumps({"leg": f"profiled@{parts[0]}",
                          "ms_it": round(dt * 1e3, 2)}), flush=True)
        from scripts.exp_wide_glue import (aggregate_trace,
                                           print_trace_summary)
        d = "/tmp/prof_wide_train"
        os.system(f"rm -rf {d}")
        with jax.profiler.trace(d):
            for _ in range(2):
                losses, _ = loop.run_chunk()
            np.asarray(losses)
        ev = aggregate_trace(d)
        print_trace_summary(ev, top=30)


if __name__ == "__main__":
    main()
