"""bf16 mixed-precision A/B for the fused training loop: f32 vs
``set_compute_dtype("bfloat16")`` (bf16 conv/dot operands, f32 master
params + accumulation) on the neuro3d-class net, fused_steps=16, device
augmentation. Reports it/s per config.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    from elektronn2_tpu.ops.warp import DeviceBatchAugmenter
    from elektronn2_tpu.training.fused_loop import FusedTrainLoop
    from scripts.bench_tpu_pending import _neuro3d_model

    rng = np.random.RandomState(0)
    raws = [rng.rand(1, 48, 128, 128).astype(np.float32) for _ in range(2)]
    labs = [(rng.rand(48, 128, 128) > 0.5).astype(np.int16)
            for _ in range(2)]
    B = int(os.environ.get("B", "8"))
    K = int(os.environ.get("K", "16"))
    chunks = int(os.environ.get("CHUNKS", "4"))
    for cdtype in (None, "bfloat16"):
        model, pin, pout, stride = _neuro3d_model(B, bf16=False)
        model.set_compute_dtype(cdtype)
        aug = DeviceBatchAugmenter(raws, labs, patch_size=pin,
                                   target_size=pout, target_strides=stride,
                                   grey_channels=[0], seed=0)
        loop = FusedTrainLoop(model, aug, batch_size=B, n_inner=K,
                              warp=0.5, seed=0)
        losses, _ = loop.run_chunk()            # compile
        t0 = time.perf_counter()
        for _ in range(chunks):
            losses, _ = loop.run_chunk()
        dt = (time.perf_counter() - t0) / (chunks * K)
        assert np.isfinite(np.asarray(losses)).all()
        print(json.dumps({"cdtype": cdtype or "float32", "B": B, "K": K,
                          "ms_per_it": round(dt * 1e3, 2),
                          "it_per_s": round(1 / dt, 1),
                          "Mvox_in_per_s": round(
                              B * float(np.prod(pin)) / dt / 1e6, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
