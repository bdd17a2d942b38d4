"""Decoder (U-Net) convolutional dense-path serving study (r2 s13).

The r1 measurement (scripts/bench_tpu_pending.py::bench_unet_dense,
BASELINE.md: 64.2 Mvox/s at 48x384x384) predates the whole serving
campaign: it timed ONE dispatch per sync (so every sample pays the
~30 ms tunnel dispatch floor), f32 only, one slab geometry. This script
re-measures the decoder path with the campaign's protocol:

  * sustained throughput (K back-to-back dispatches, ONE sync — the
    ``sweep_knossos`` serving pattern), double warm-up, best-of-2 windows;
  * slab-size sweep (halo/dispatch amortisation);
  * dtype contenders: f32 / bf16 serving (``set_compute_dtype``).

Reference context: the reference serves decoder graphs through the same
host-tiled ``predict_dense`` as everything else (SURVEY.md §4.B
``node_basic.py::predict_dense``); the whole-volume convolutional path is
this rebuild's TPU-first replacement (inference.py::
convolutional_dense_forward).

Usage: python scripts/exp_convdense.py            (on a live chip)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(os.environ.get("EXP_K", "8"))
WINDOWS = 2


def build_model():
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
    return model


def main():
    import jax
    import jax.numpy as jnp

    from elektronn2_tpu.neuromancer.inference import \
        convolutional_dense_forward

    print("devices:", jax.devices(), flush=True)
    model = build_model()

    if os.environ.get("EXP_KNOBS"):
        # part 2: lowering knobs (set_convdense_impl) at the best slab
        results = []
        V = tuple(int(v) for v in os.environ.get(
            "EXP_V", "96,512,512").split(","))
        vol = jax.random.uniform(jax.random.PRNGKey(0), (1,) + V,
                                 jnp.float32)
        float(jnp.sum(vol))
        for dtype in (None, "bfloat16"):
            kws = [{}, {"zfold": True}, {"upconv": "d2s"},
                   {"upconv": "d2s", "zfold": True}]
            if dtype is None:
                # the s14 Pallas tail-conv contenders (f32-only: the knob
                # gates itself off under bf16/int8 serving)
                kws += [{"ptail": True},
                        {"upconv": "d2s", "zfold": True, "ptail": True}]
                # r5 (VERDICT r4 #7): the wide-graph glue winners A/B'd
                # on the NARROW decoder family — skipsum on the champion
                # lowering, plus poolslice for completeness
                kws += [{"upconv": "d2s", "zfold": True, "ptail": True,
                         "skipsum": True},
                        {"upconv": "d2s", "zfold": True, "skipsum": True},
                        {"upconv": "d2s", "zfold": True, "ptail": True,
                         "poolslice": True}]
            for kw in kws:
                model.set_compute_dtype(dtype)
                model.set_convdense_impl(**kw)
                tag = (f"{'f32' if dtype is None else dtype}"
                       f"+{'+'.join(f'{k}={v}' for k, v in kw.items()) or 'default'}")
                try:
                    fn = jax.jit(lambda p, s, v: convolutional_dense_forward(
                        model, v, params=p, state=s))
                    out = fn(model.params, model.state, vol)
                    out_vox = float(np.prod(out.shape[1:]))
                    float(jnp.sum(jnp.asarray(out, jnp.float32)))
                    float(jnp.sum(jnp.asarray(
                        fn(model.params, model.state, vol), jnp.float32)))
                    best = float("inf")
                    for _ in range(WINDOWS):
                        t0 = time.perf_counter()
                        acc = jnp.float32(0)
                        for _ in range(K):
                            acc = acc + jnp.sum(jnp.asarray(
                                fn(model.params, model.state, vol),
                                jnp.float32))
                        float(acc)
                        best = min(best, (time.perf_counter() - t0) / K)
                    mvox = out_vox / best / 1e6
                    print(f"{tag:>40}: {mvox:8.1f} Mvox/s "
                          f"({best*1e3:7.1f} ms/slab)", flush=True)
                    del out
                except Exception as e:   # noqa: BLE001
                    print(f"{tag:>40}: FAILED {str(e)[:120]}", flush=True)
        return

    vols = [(48, 384, 384), (64, 512, 512), (96, 512, 512),
            (128, 512, 512)]
    dtypes = [None, "bfloat16"]

    results = []

    # 0) replicate the r1 protocol exactly (per-dispatch sync, f32,
    #    48x384x384, pad_raw=True) to calibrate the dispatch-floor share
    vol = jax.random.uniform(jax.random.PRNGKey(0), (1, 48, 384, 384),
                             jnp.float32)
    float(jnp.sum(vol))
    model.set_compute_dtype(None)
    out = model.predict_dense_device(vol, pad_raw=True)
    out.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = model.predict_dense_device(vol, pad_raw=True)
        out.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    mvox = float(np.prod(out.shape[1:])) / best / 1e6
    print(f"r1-protocol replication (per-dispatch, f32, 48x384x384, "
          f"pad_raw): {mvox:.1f} Mvox/s ({best*1e3:.1f} ms)", flush=True)

    for dtype in dtypes:
        model.set_compute_dtype(dtype)
        for V in vols:
            tag = f"{'f32' if dtype is None else dtype}@{V[0]}x{V[1]}x{V[2]}"
            try:
                vol = jax.random.uniform(jax.random.PRNGKey(0), (1,) + V,
                                         jnp.float32)
                float(jnp.sum(vol))
                fn = jax.jit(lambda p, s, v: convolutional_dense_forward(
                    model, v, params=p, state=s))
                out = fn(model.params, model.state, vol)
                out_vox = float(np.prod(out.shape[1:]))
                float(jnp.sum(jnp.asarray(out, jnp.float32)))
                # double warm-up (first post-compile dispatch carries a
                # one-off allocator penalty — tune_sweep protocol)
                float(jnp.sum(jnp.asarray(
                    fn(model.params, model.state, vol), jnp.float32)))
                best = float("inf")
                for _ in range(WINDOWS):
                    t0 = time.perf_counter()
                    acc = jnp.float32(0)
                    for _ in range(K):
                        acc = acc + jnp.sum(jnp.asarray(
                            fn(model.params, model.state, vol),
                            jnp.float32))
                    checksum = float(acc)
                    dt = (time.perf_counter() - t0) / K
                    if not np.isfinite(checksum):
                        raise ValueError("non-finite checksum")
                    best = min(best, dt)
                mvox = out_vox / best / 1e6
                results.append((tag, mvox, best * 1e3))
                print(f"{tag:>24}: {mvox:8.1f} Mvox/s  ({best*1e3:7.1f} ms"
                      f"/slab, out {list(out.shape)})", flush=True)
                del out, vol
            except Exception as e:   # noqa: BLE001 — OOM/compile tolerant
                results.append((tag, None, None))
                print(f"{tag:>24}: FAILED {str(e)[:140]}", flush=True)
    model.set_compute_dtype(None)

    print("\n== table ==")
    for tag, mvox, ms in results:
        print(f"{tag:>24}  {mvox if mvox else 'FAIL'}")


if __name__ == "__main__":
    main()
