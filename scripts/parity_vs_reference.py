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

``--make-self-golden`` writes a golden.h5 in the exact schema above from
THIS framework's oracle path (seeded params/input). It is not reference
parity — that needs the reference (mount still empty as of r2) — but it
(a) pins today's dense-path numerics as a committed regression lock
(tests/golden/, checked by tests/test_parity_golden.py through this same
harness) and (b) keeps the golden-file schema itself executable, so the
day a real reference golden appears it drops straight in.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


_UNET_WSHAPES = [            # (w shape, b len) per layer, in build order
    ((5, 1, 1, 3, 3), 5),    # enc0: Conv (1,3,3)
    ((8, 5, 3, 3, 3), 8),    # enc1: Conv (3,3,3) pool (1,2,2)
    ((5, 8, 1, 2, 2), 5),    # up:   UpConv (1,2,2)
    ((6, 10, 1, 3, 3), 6),   # dec:  Conv (1,3,3) on the skip merge
    ((2, 6, 1, 1, 1), 2),    # cls:  1x1 head
]


def _unet_weights(rng):
    return [((rng.randn(*ws) / np.sqrt(np.prod(ws[1:]))).astype(
        np.float32), (rng.randn(nb) * 0.1).astype(np.float32))
        for ws, nb in _UNET_WSHAPES]


def _build_unet(nm, patch, weights):
    """Small decoder-family net (Conv -> pooled Conv -> UpConv ->
    FaithlessMerge skip -> Conv -> 1x1 head): locks the decoder dense
    path's UpConv/Crop/Concat numerics, the second of the two dense
    lowerings (inference.py::convolutional_dense_forward; reference
    geometry: ``node_basic.py::predict_dense`` + U-Net paper §3
    overlap-tile arithmetic)."""
    (w0, b0), (w1, b1), (w2, b2), (w3, b3), (w4, b4) = weights
    nm.model_manager.reset()
    inp = nm.Input([1, 1] + list(patch), "b,f,z,x,y", name="raw")
    enc0 = nm.Conv(inp, 5, (1, 3, 3), (1, 1, 1), w=w0, b=b0, name="enc0")
    enc1 = nm.Conv(enc0, 8, (3, 3, 3), (1, 2, 2), w=w1, b=b1, name="enc1")
    up = nm.UpConv(enc1, 5, (1, 2, 2), activation_func="relu",
                   w=w2, b=b2, name="up")
    merged = nm.FaithlessMerge(up, enc0, name="skip")
    dec = nm.Conv(merged, 6, (1, 3, 3), (1, 1, 1), w=w3, b=b3, name="dec")
    head = nm.Conv(dec, 2, 1, 1, activation_func="lin", w=w4, b=b4,
                   name="cls")
    probs_n = nm.Softmax(head, name="probs")
    model = nm.model_manager.getmodel("self_golden_unet")
    model.designate_nodes(input_node=inp, prediction_node=probs_n)
    return model


def make_self_golden(path, cpu=True, family="mfp"):
    """Write a golden.h5 (harness schema) from this framework's own oracle
    path with seeded params/input — the committed numeric regression lock
    (see module docstring)."""
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import h5py
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.utils.cnncalculator import cnncalculator

    if family == "unet":
        rng = np.random.RandomState(7)
        patch = [16, 32, 32]
        raw = rng.rand(1, 20, 40, 40).astype(np.float32)
        weights = _unet_weights(rng)
        model = _build_unet(nm, patch, weights)
        probs = np.asarray(model.predict_dense(raw, prefer_device=False),
                           np.float32)
        # SECOND dataset: the whole-volume convolutional dense path —
        # the lowering this family lock exists for. The tiled-oracle
        # dataset above does not execute convolutional_dense_forward at
        # all, so without this leg a regression confined to the
        # conv-dense trace would pass the lock (review r2 s15).
        from elektronn2_tpu.neuromancer.inference import \
            convolutional_dense_forward
        probs_cd = np.asarray(convolutional_dense_forward(model, raw),
                              np.float32)
        with h5py.File(path, "w") as f:
            f.create_dataset("raw", data=raw)
            f.create_dataset("probs", data=probs)
            f.create_dataset("probs_convdense", data=probs_cd)
            f.attrs["spec"] = json.dumps({"family": "unet",
                                          "patch": patch})
            for i, (w, b) in enumerate(weights):
                f.create_dataset(f"w{i}", data=w)
                f.create_dataset(f"b{i}", data=b)
        print(f"wrote {path}: raw {raw.shape}, probs {probs.shape}")
        return 0

    spec = {"filters": [[1, 3, 3], [3, 3, 3]],
            "pools": [[1, 2, 2], [2, 2, 2]],
            "nof_filters": [6, 2], "mfp": True,
            "activation": ["relu", "lin"], "n_lab": 2}
    calc = cnncalculator(spec["filters"], spec["pools"],
                         desired_patch_size=[12, 20, 20], mfp=True, ndim=3)
    patch = [int(v) for v in calc.input]            # [11, 21, 21]
    rng = np.random.RandomState(42)
    raw = rng.rand(1, *patch).astype(np.float32)
    weights = []
    n_in = 1
    for n_out, flt in zip(spec["nof_filters"], spec["filters"]):
        fan_in = n_in * int(np.prod(flt))
        w = (rng.randn(n_out, n_in, *flt) / np.sqrt(fan_in)).astype(
            np.float32)
        b = (rng.randn(n_out) * 0.1).astype(np.float32)
        weights.append((w, b))
        n_in = n_out

    nm.model_manager.reset()
    inp = nm.Input([1, 1] + patch, "b,f,z,x,y", name="raw")
    h = inp
    for i, ((w, b), flt, pool, act) in enumerate(zip(
            weights, spec["filters"], spec["pools"], spec["activation"])):
        h = nm.Conv(h, w.shape[0], flt, pool, activation_func=act,
                    mfp=True, w=w, b=b, name=f"conv{i}")
    probs_n = nm.Softmax(h, name="probs")
    model = nm.model_manager.getmodel("self_golden")
    model.designate_nodes(input_node=inp, prediction_node=probs_n)
    probs = np.asarray(model.predict_dense(raw, prefer_device=False),
                       np.float32)

    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=raw)
        f.create_dataset("probs", data=probs)
        f.attrs["spec"] = json.dumps(spec)
        for i, (w, b) in enumerate(weights):
            f.create_dataset(f"w{i}", data=w)
            f.create_dataset(f"b{i}", data=b)
    print(f"wrote {path}: raw {raw.shape}, probs {probs.shape}")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("golden")
    ap.add_argument("--flip-filters", action="store_true")
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--make-self-golden", action="store_true",
                    help="WRITE the golden file from this framework's "
                    "oracle path (self regression lock) instead of "
                    "checking against it")
    ap.add_argument("--family", default="mfp", choices=["mfp", "unet"],
                    help="which self-golden net to write (mfp conv "
                    "stack, or the decoder/U-Net family)")
    args = ap.parse_args(argv)

    if args.make_self_golden:
        # ALWAYS on CPU: the committed lock is checked by the CPU test
        # suite — TPU-numerics goldens would silently weaken it
        return make_self_golden(args.golden, cpu=True, family=args.family)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import h5py
    import elektronn2_tpu.neuromancer as nm

    with h5py.File(args.golden, "r") as f:
        raw = f["raw"][()]
        want = f["probs"][()]
        want_cd = (f["probs_convdense"][()] if "probs_convdense" in f
                   else None)
        spec = json.loads(f.attrs["spec"])
        n_layers = (len(_UNET_WSHAPES) if spec.get("family") == "unet"
                    else len(spec["filters"]))
        weights = []
        for i in range(n_layers):
            w = f[f"w{i}"][()]
            b = f[f"b{i}"][()]
            if args.flip_filters:
                w = w[..., ::-1, ::-1, ::-1] if w.ndim == 5 \
                    else w[..., ::-1, ::-1]
            weights.append((np.ascontiguousarray(w), b))

    if spec.get("family") == "unet":
        model = _build_unet(nm, spec["patch"], weights)
        got = model.predict_dense(raw, prefer_device=False)
        n = [min(a, b) for a, b in zip(got.shape, want.shape)]
        got_c = got[tuple(slice(0, k) for k in n)]
        want_c = want[tuple(slice(0, k) for k in n)]
        maxdiff = float(np.abs(got_c - want_c).max())
        print(f"shapes: ours {got.shape} reference {want.shape}; "
              f"compared {n}; max |diff| = {maxdiff:.3e} "
              f"(tol {args.tol})")
        ok = maxdiff <= args.tol
        if want_cd is not None:
            # the conv-dense (whole-volume) lowering's own lock — the
            # lowering this golden family exists for
            from elektronn2_tpu.neuromancer.inference import \
                convolutional_dense_forward
            got_cd = np.asarray(convolutional_dense_forward(model, raw),
                                np.float32)
            cd_diff = float(np.abs(got_cd - want_cd).max()) \
                if got_cd.shape == want_cd.shape else float("inf")
            print(f"conv-dense leg: ours {got_cd.shape} golden "
                  f"{want_cd.shape}; max |diff| = {cd_diff:.3e} "
                  f"(tol {args.tol})")
            ok = ok and cd_diff <= args.tol
        print("PARITY: PASS" if ok else "PARITY: FAIL")
        return 0 if ok else 1

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
