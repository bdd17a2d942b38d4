"""Measure a JAX-CPU dense-sweep denominator for BASELINE.md.

VERDICT r1 #2: BASELINE.md's 1.0 Mvox/s "Theano-CPU" denominator is an
order-of-magnitude estimate (no published reference number exists and the
reference mount is empty). This script measures THIS framework's dense
path on the JAX CPU backend — a concrete, reproducible denominator for the
TPU speedup table (labelled as JAX-CPU, not Theano-CPU, in BASELINE.md).

Run: python scripts/measure_cpu_denominator.py [Z,X,Y]
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from __graft_entry__ import _flagship_model

    model = _flagship_model(mfp=True, patch=[23, 103, 103])
    vol_shape = tuple(int(v) for v in
                      (sys.argv[1] if len(sys.argv) > 1
                       else "32,256,256").split(","))
    rng = np.random.RandomState(0)
    vol = jax.device_put(rng.rand(1, *vol_shape).astype(np.float32))
    out = model.predict_dense_device(vol, pad_raw=True)     # compile
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = model.predict_dense_device(vol, pad_raw=True)
    assert np.isfinite(float(jnp.sum(out)))
    dt = time.perf_counter() - t0
    mvox = float(np.prod(out.shape[1:])) / dt / 1e6
    print(json.dumps({
        "metric": "mfp_dense_inference_cpu_denominator",
        "value": round(mvox, 3), "unit": "Mvox/s (JAX-CPU, this host)",
        "vol": vol_shape}))


if __name__ == "__main__":
    main()
