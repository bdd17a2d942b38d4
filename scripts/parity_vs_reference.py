#!/usr/bin/env python
"""Voxel-parity harness against a reference-generated golden file.

The BASELINE.json correctness gate is "output voxel values match the Theano
reference within float tolerance". Theano cannot run in this environment, so
parity is checked against a *golden file* produced wherever the reference
does run:

    golden.h5:
      raw            (f, Z, X, Y) float32 input volume
      probs          (c, Zo, Xo, Yo) float32 reference dense prediction
      spec           json attrs: filters, pools, nof_filters, mfp,
                     activation (per-layer lists), n_lab
      w{i}, b{i}     per-layer conv parameters, (out, in, *filter) / (out,)

Usage:
    python scripts/parity_vs_reference.py golden.h5 [--flip-filters]
                                          [--tol 1e-4] [--cpu]

``--flip-filters`` spatially flips kernels: Theano's conv op performs true
convolution while this framework (like cuDNN's cross-correlation mode)
correlates — whether a flip is needed depends on which path the reference
model used; try both if unsure.

Exit code 0 on parity within tolerance.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("golden")
    ap.add_argument("--flip-filters", action="store_true")
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import h5py
    import elektronn2_tpu.neuromancer as nm

    with h5py.File(args.golden, "r") as f:
        raw = f["raw"][()]
        want = f["probs"][()]
        spec = json.loads(f.attrs["spec"])
        weights = []
        for i in range(len(spec["filters"])):
            w = f[f"w{i}"][()]
            b = f[f"b{i}"][()]
            if args.flip_filters:
                w = w[..., ::-1, ::-1, ::-1] if w.ndim == 5 \
                    else w[..., ::-1, ::-1]
            weights.append((np.ascontiguousarray(w), b))

    nm.model_manager.reset()
    ndim = raw.ndim - 1
    tags = "b,f," + ",".join("zxy"[-ndim:] if ndim < 3 else "zxy")
    patch = list(raw.shape[1:])
    inp = nm.Input([1, raw.shape[0]] + patch, tags, name="raw")
    h = inp
    for i, ((w, b), flt, pool, act) in enumerate(zip(
            weights, spec["filters"], spec["pools"],
            spec.get("activation",
                     ["relu"] * (len(weights) - 1) + ["lin"]))):
        h = nm.Conv(h, w.shape[0], flt, pool, activation_func=act,
                    mfp=spec.get("mfp", False), w=w, b=b, name=f"conv{i}")
    probs = nm.Softmax(h, name="probs")
    model = nm.model_manager.getmodel("parity")
    model.designate_nodes(input_node=inp, prediction_node=probs)

    # the parity contract is against the reference's host-tiled convention
    # (repeat-upsampled strided outputs) — keep the oracle path explicit
    got = model.predict_dense(raw, prefer_device=False)
    n = [min(a, b) for a, b in zip(got.shape, want.shape)]
    got_c = got[tuple(slice(0, k) for k in n)]
    want_c = want[tuple(slice(0, k) for k in n)]
    maxdiff = float(np.abs(got_c - want_c).max())
    print(f"shapes: ours {got.shape} reference {want.shape}; "
          f"compared {n}; max |diff| = {maxdiff:.3e} (tol {args.tol})")
    if maxdiff <= args.tol:
        print("PARITY: PASS")
        return 0
    print("PARITY: FAIL")
    return 1


if __name__ == "__main__":
    sys.exit(main())
