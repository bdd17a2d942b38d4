"""Benchmark: MFP dense-inference throughput (Mvox/s) on one chip.

The driver-defined headline metric (BASELINE.json): dense-inference
megavoxels/sec/chip with max-fragment-pooling on an EM-like cube, using the
neuro3d-class flagship model. Prints ONE JSON line.

``vs_baseline`` divides by the documented Theano-CPU dense-prediction
throughput for this model class (~1 Mvox/s — BASELINE.md: the reference
publishes no number; this is the order of magnitude of its CPU-era docs and
is recorded there as the denominator). North-star: ≥10×.
"""

import json
import os
import sys
import time

import numpy as np

THEANO_CPU_BASELINE_MVOX_S = 1.0


def main():
    import jax
    from __graft_entry__ import _flagship_model

    model = _flagship_model(mfp=True, patch=[23, 103, 103])
    # EM-like random volume; big enough for several tiles
    vol_shape = (40, 320, 320)
    rng = np.random.RandomState(0)
    vol = rng.rand(1, *vol_shape).astype(np.float32)

    # warmup: compile the tile function on a small sweep
    model.predict_dense(vol[:, :model.input_node.shape["z"] + 2,
                            :model.input_node.shape["x"] + 2,
                            :model.input_node.shape["y"] + 2],
                        pad_raw=False)

    t0 = time.perf_counter()
    out = model.predict_dense(vol, pad_raw=True)
    dt = time.perf_counter() - t0
    mvox = np.prod(out.shape[1:]) / dt / 1e6

    print(json.dumps({
        "metric": "mfp_dense_inference",
        "value": round(float(mvox), 3),
        "unit": "Mvox/s/chip",
        "vs_baseline": round(float(mvox) / THEANO_CPU_BASELINE_MVOX_S, 2),
    }))


if __name__ == "__main__":
    main()
