#!/usr/bin/env python
"""Real-TPU measurements for the session-2 features (run when the tunnel
is up; takes ~5-10 min):

  1. device augmentation throughput — separable MXU core vs trilinear
     gather (affine+elastic+grey, batch 8 x 128^3),
  2. fused multi-step training (`fused_steps=16`) vs per-step dispatch,
     neuro3d-class net at batch 1 and 4,
  3. U-Net whole-volume convolutional dense inference throughput.

Companion to docs/tpu_performance.md; results land in BASELINE.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

RESULTS = {}


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x if x.dtype.kind == "f" else x.astype(jnp.float32)))


def bench_augmentation():
    import jax
    from elektronn2_tpu.ops.warp import DeviceBatchAugmenter

    rng = np.random.RandomState(0)
    raws = [rng.rand(1, 160, 160, 160).astype(np.float32) for _ in range(2)]
    labs = [(rng.rand(160, 160, 160) > 0.5).astype(np.int16)
            for _ in range(2)]
    B, patch = 8, (128, 128, 128)
    for mode in ("separable", "gather"):
        aug = DeviceBatchAugmenter(raws, labs, patch_size=patch,
                                   elastic_sigma=3.0, grey_channels=[0],
                                   resample=mode, seed=0)
        d, t = aug.getbatch(batch_size=B, warp=1.0)   # compile
        sync(d), sync(t)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            d, t = aug.getbatch(batch_size=B, warp=1.0)
            sync(d), sync(t)
            best = min(best, time.perf_counter() - t0)
        mvox = B * float(np.prod(patch)) / best / 1e6
        RESULTS[f"augment/{mode}"] = {"ms": round(best * 1e3, 1),
                                      "Mvox/s": round(mvox, 1)}
        print(f"augment/{mode}", RESULTS[f"augment/{mode}"], flush=True)


def _neuro3d_model(batch_size, bf16=True):
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.utils.cnncalculator import cnncalculator

    filters = [(1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3)]
    pools = [(1, 2, 2), (1, 2, 2), (1, 1, 1), (1, 1, 1)]
    nof = [20, 30, 40, 40]
    calc = cnncalculator(filters, pools, desired_patch_size=[15, 55, 55],
                         mfp=False, ndim=3)
    z, x, y = calc.input
    nm.model_manager.reset(seed=0)
    inp = nm.Input([batch_size, 1, z, x, y], "b,f,z,x,y", name="raw")
    h = inp
    for i, (f, p, nf) in enumerate(zip(filters, pools, nof)):
        h = nm.Conv(h, nf, f, p, name=f"conv{i}")
    out = nm.Conv(h, 2, 1, 1, activation_func="lin", name="cls")
    probs = nm.Softmax(out, name="probs")
    tgt = nm.Input([batch_size, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True, name="nll")
    model = nm.model_manager.getmodel("bench_neuro3d")
    model.designate_nodes(input_node=inp, target_node=tgt,
                          loss_node=nm.AggregateLoss(nll),
                          prediction_node=probs)
    if bf16:
        model.set_compute_dtype("bfloat16")
    model.set_opt("Adam", lr=1e-3)
    calc_in, calc_out = tuple(calc.input), tuple(calc.output)
    stride = tuple(calc.pred_stride)
    return model, calc_in, calc_out, stride


def bench_fused_training():
    import jax
    from elektronn2_tpu.ops.warp import DeviceBatchAugmenter
    from elektronn2_tpu.training.fused_loop import FusedTrainLoop

    rng = np.random.RandomState(0)
    raws = [rng.rand(1, 48, 128, 128).astype(np.float32) for _ in range(2)]
    labs = [(rng.rand(48, 128, 128) > 0.5).astype(np.int16)
            for _ in range(2)]

    for B in (1, 4):
        model, pin, pout, stride = _neuro3d_model(B)
        aug = DeviceBatchAugmenter(raws, labs, patch_size=pin,
                                   target_size=pout, target_strides=stride,
                                   grey_channels=[0], seed=0)
        # per-step dispatch loop (device augmentation, async loss)
        d, t = aug.getbatch(batch_size=B, warp=0.5)
        loss, _ = model.trainingstep(d, t)     # compile
        float(loss)
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            d, t = aug.getbatch(batch_size=B, warp=0.5)
            loss, _ = model.trainingstep(d, t)
        float(loss)
        dt = (time.perf_counter() - t0) / n
        RESULTS[f"train_b{B}/per_step"] = {
            "ms/it": round(dt * 1e3, 1), "it/s": round(1 / dt, 1)}
        print(f"train_b{B}/per_step", RESULTS[f"train_b{B}/per_step"],
              flush=True)

        # fused 16-step chunks
        K = 16
        loop = FusedTrainLoop(model, aug, batch_size=B, n_inner=K,
                              warp=0.5, seed=0)
        loop.run_chunk()                        # compile
        chunks = 4
        t0 = time.perf_counter()
        for _ in range(chunks):
            losses, _ = loop.run_chunk()
        dt = (time.perf_counter() - t0) / (chunks * K)
        assert np.isfinite(losses).all()
        RESULTS[f"train_b{B}/fused16"] = {
            "ms/it": round(dt * 1e3, 2), "it/s": round(1 / dt, 1)}
        print(f"train_b{B}/fused16", RESULTS[f"train_b{B}/fused16"],
              flush=True)


def bench_unet_dense():
    import jax
    import jax.numpy as jnp
    import elektronn2_tpu.neuromancer as nm

    nm.model_manager.reset(seed=0)
    inp = nm.Input([1, 1, 16, 32, 32], "b,f,z,x,y", name="raw")
    enc0 = nm.Conv(inp, 12, (1, 3, 3), (1, 1, 1), name="enc0")
    enc1 = nm.Conv(enc0, 24, (3, 3, 3), (1, 2, 2), name="enc1")
    enc2 = nm.Conv(enc1, 24, (3, 3, 3), (1, 1, 1), name="enc2")
    up = nm.UpConv(enc2, 12, (1, 2, 2), activation_func="relu", name="up")
    merged = nm.FaithlessMerge(up, enc0, name="merge")
    dec = nm.Conv(merged, 16, (1, 3, 3), (1, 1, 1), name="dec")
    out = nm.Conv(dec, 2, 1, 1, activation_func="lin", name="cls")
    probs = nm.Softmax(out, name="probs")
    model = nm.model_manager.getmodel("bench_unet")
    model.designate_nodes(input_node=inp, prediction_node=probs)

    vol = jax.device_put(
        np.random.RandomState(0).rand(1, 48, 384, 384).astype(np.float32))
    sync(vol)
    out = model.predict_dense_device(vol, pad_raw=True)   # compile
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = model.predict_dense_device(vol, pad_raw=True)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    mvox = float(np.prod(out.shape[1:])) / best / 1e6
    RESULTS["unet_dense"] = {"ms": round(best * 1e3, 1),
                             "Mvox/s": round(mvox, 1),
                             "out_shape": list(out.shape)}
    print("unet_dense", RESULTS["unet_dense"], flush=True)


def bench_tracing_rollout():
    """Recurrent tracing: fused device rollout (DeviceTracer) vs the
    per-step host Tracer dispatch floor."""
    import jax
    import jax.numpy as jnp
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.data.tracing_utils import DeviceTracer

    patch = (9, 9, 9)
    B_DESIGN, T = 1, 4
    nm.model_manager.reset(seed=0)
    seq = nm.Input([T, B_DESIGN, 1, *patch], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([B_DESIGN, 1, *patch], "b,f,z,x,y", name="x_t")
    c = nm.Conv(x_t, 8, (3, 3, 3), (1, 1, 1), name="c")
    enc = nm.Perceptron(c, 48, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=48, name="h0")
    gru = nm.GRU(enc, h0, n_f=48, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    step = nm.Perceptron(scan, 3, activation_func="lin", name="step")
    m = nm.model_manager.getmodel("bench_tracer")
    m.designate_nodes(input_node=seq, prediction_node=step)
    m.params["step"]["b"] = jnp.asarray([0.2, 0.15, 0.1], np.float32)

    rng = np.random.RandomState(0)
    vol = rng.rand(1, 128, 128, 128).astype(np.float32)
    K, B = 256, 64
    dt_tr = DeviceTracer(m, vol, max_steps=K, min_step=0.0)
    seeds = rng.uniform(30, 98, size=(B, 3)).astype(np.float32)
    dt_tr.trace_batch(seeds)          # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        traces = dt_tr.trace_batch(seeds)
        best = min(best, time.perf_counter() - t0)
    sps = B * K / best
    RESULTS["tracing_rollout"] = {
        "agents": B, "steps": K, "ms": round(best * 1e3, 1),
        "agent_steps/s": round(sps, 0),
        "mean_len": round(float(np.mean([len(t.coords) for t in traces])),
                          1)}
    print("tracing_rollout", RESULTS["tracing_rollout"], flush=True)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    benches = {"aug": bench_augmentation, "train": bench_fused_training,
               "unet": bench_unet_dense, "tracing": bench_tracing_rollout}
    only = set(sys.argv[1:])
    unknown = only - set(benches)
    if unknown:
        raise SystemExit(f"unknown bench name(s) {sorted(unknown)}; "
                         f"valid: {sorted(benches)}")
    for name, fn in benches.items():
        if not only or name in only:
            fn()
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
