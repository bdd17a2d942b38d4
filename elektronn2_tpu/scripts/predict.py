"""``elektronn2-predict`` — dense prediction over volumes from the CLI.

Deployment companion to ``elektronn2-train`` (the reference's users scripted
``model.predict_dense`` by hand; this wraps the same call): reads a saved
model and an HDF5 volume or a KNOSSOS dataset, writes the dense prediction
as HDF5 (and optionally as a KNOSSOS dataset of uint8 maps).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="elektronn2-predict",
        description="Dense (MFP/dilated) prediction over a volume")
    ap.add_argument("model", help="saved .mdl file")
    ap.add_argument("input", help="INPUT.h5[:dataset] or a KNOSSOS dir")
    ap.add_argument("-o", "--out", default="prediction.h5")
    ap.add_argument("--knossos-out", default=None,
                    help="also write a KNOSSOS dataset of uint8 maps")
    ap.add_argument("--mfp", action="store_true",
                    help="rebuild the model with MFP active")
    ap.add_argument("--patch", default=None,
                    help="comma-separated inference patch size override")
    ap.add_argument("--no-pad", action="store_true",
                    help="valid-only output (no reflect padding)")
    ap.add_argument("--uint8", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--slab-batch", type=int, default=1,
                    help="KNOSSOS sweeps: slabs per device dispatch "
                    "(amortises dispatch overhead; auto-degrades to "
                    "per-slab on device OOM)")
    ap.add_argument("--step", default=None,
                    help="comma-separated KNOSSOS sweep slab size "
                    "(default 64,384,384; 96,512,512 measured fastest "
                    "for the flagship net on v5e)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 conv operands for the sweep (serving "
                    "mode; ~0.02 max softmax deviation, +47%% measured)")
    ap.add_argument("--int8", action="store_true",
                    help="QUANTIZED serving: int8 convs with int32 "
                    "accumulation (per-channel weight + dynamic "
                    "activation scales; ~0.014 max softmax deviation, "
                    "2x bf16 MXU peak on v5e)")
    ap.add_argument("--ptail", action="store_true",
                    help="route eligible tail convs through the Pallas "
                    "MXU kernel (set_dilated_impl(pallas_tail=True), "
                    "parity-grade f32 — the r2 s9 headline config: "
                    "+61%% over the bf16 champion measured same-run)")
    ap.add_argument("--convdense", default=None, metavar="KNOBS",
                    help="decoder (U-Net) graphs: conv-dense serving "
                    "lowerings as a comma list of 'd2s', 'zfold', "
                    "'ptail' (set_convdense_impl; exactly equivalent; "
                    "the measured v5e champion is 'd2s,zfold,ptail' — "
                    "ptail routes (3,3,3) relu convs through the Pallas "
                    "MXU kernel, 2.6-2.9x per-op over the XLA conv)")
    ap.add_argument("--tune", action="store_true",
                    help="KNOSSOS sweeps: autotune lowering/slab size/"
                    "slab batch on the live device first "
                    "(Model.tune_serving) and sweep with the winner. "
                    "Tunes parity-grade f32 lowerings only unless a "
                    "lossy mode is also requested: with --bf16/--int8 "
                    "those contenders join the grid and the measured "
                    "winner's dtype is applied (possibly overriding "
                    "the flag)")
    ap.add_argument("--trace", default=None, metavar="SEEDS",
                    help="tracing mode: roll out the (recurrent) tracing "
                         "model from seed positions 'z,x,y[;z,x,y...]' "
                         "(fused DeviceTracer — one dispatch per batch) "
                         "and write the trajectories as a KNOSSOS "
                         "skeleton (.k.zip/.nml) to --out instead of a "
                         "dense map")
    ap.add_argument("--trace-steps", type=int, default=256,
                    help="tracing mode: maximum rollout length per agent")
    ap.add_argument("--mesh", default=None, metavar="AXES",
                    help="pod-scale KNOSSOS sweeps: device-mesh axes as "
                    "'space=8' (z-sharded slabs, halo exchange) or "
                    "'data=2,space=4' (+ slab batch over 'data' when "
                    "--slab-batch > 1). In --trace mode the AGENT BATCH "
                    "is sharded instead, over the FIRST axis given — use "
                    "e.g. 'data=8' (agent-DP; no spatial sharding there)")
    args = ap.parse_args(argv)

    import os
    import numpy as np
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()    # persistent XLA cache (minutes -> <1 s)
    from elektronn2_tpu.log import logger
    from elektronn2_tpu.neuromancer.model import modelload, rebuild_model
    from elektronn2_tpu.utils.basic import h5save, h5load

    model = modelload(args.model)
    if args.mfp or args.patch:
        patch = None
        if args.patch:
            try:
                patch = [int(x) for x in args.patch.split(",")]
            except ValueError:
                ap.error(f"--patch {args.patch!r}: expected comma-"
                         "separated integers, e.g. 23,103,103")
            nsp = len(model.input_node.shape.spatial_axes)
            if len(patch) != nsp:
                ap.error(f"--patch {args.patch!r}: expected {nsp} "
                         f"comma-separated integers for this "
                         f"{nsp}-D model")
        model = rebuild_model(model, override_mfp_to_active=args.mfp,
                              imposed_patch_size=patch)
        logger.info(f"rebuilt for inference: patch="
                    f"{model.input_node.shape.spatial_shape}")

    if args.bf16 and args.int8:
        ap.error("--bf16 and --int8 are mutually exclusive")
    if args.bf16:
        model.set_compute_dtype("bfloat16")
    elif args.int8:
        model.set_compute_dtype("int8")
    if args.ptail:
        if args.bf16 or args.int8:
            ap.error("--ptail is a parity-grade f32 mode; drop "
                     "--bf16/--int8 (it outperformed both on v5e)")
        model.set_dilated_impl("direct", zfold=True, pallas_tail=True)
    if args.convdense:
        knobs = {k.strip() for k in args.convdense.split(",") if k.strip()}
        bad = knobs - {"d2s", "zfold", "ptail"}
        if bad:
            ap.error(f"--convdense: unknown knob(s) {sorted(bad)} "
                     "(expected 'd2s', 'zfold' and/or 'ptail')")
        if "ptail" in knobs and (args.bf16 or args.int8):
            ap.error("--convdense ptail is a parity-grade f32 mode; "
                     "drop --bf16/--int8")
        model.set_convdense_impl(
            upconv=("d2s" if "d2s" in knobs else "dilate"),
            zfold=("zfold" in knobs),
            ptail=("ptail" in knobs))
    if args.trace:
        # deployment tracing loop: volume → fused rollout → .k.zip
        # (reference workflow: tracing_utils.py::Tracer + trace_to_kzip,
        # SURVEY §3.2/§4.D — here one DeviceTracer dispatch per batch)
        from elektronn2_tpu.data.tracing_utils import DeviceTracer
        try:
            seeds = np.asarray(
                [[float(v) for v in s.split(",")]
                 for s in args.trace.split(";") if s.strip()], np.float32)
            if seeds.ndim != 2 or seeds.shape[1] != 3:
                raise ValueError
        except ValueError:
            ap.error(f"--trace {args.trace!r}: expected "
                     "'z,x,y[;z,x,y...]' float seed positions")
        if os.path.isdir(args.input):
            from elektronn2_tpu.data import KnossosArray
            ka = KnossosArray(args.input)
            vol = np.asarray(ka[tuple(slice(0, s)
                                      for s in ka.shape[-3:])])
        else:
            path, _, key = args.input.partition(":")
            vol = np.asarray(h5load(path, key or None))
        # same normalisation as every dense-serving path (KNOSSOS cubes
        # are uint8): a model trained on [0,1] inputs would otherwise see
        # 0-255 and trace garbage (r3 review)
        if vol.dtype == np.uint8:
            vol = vol.astype(np.float32) / 255.0
        vol = vol.astype(np.float32, copy=False)
        if vol.ndim == 3:
            vol = vol[None]
        tracer = DeviceTracer(model, vol, max_steps=args.trace_steps)
        out_name = args.out
        if out_name.endswith(".h5"):        # default --out is a dense name
            out_name = out_name[:-3] + ".k.zip"
        mesh = None
        if args.mesh:
            try:
                axes = {k: int(v) for k, v in
                        (kv.split("=") for kv in args.mesh.split(","))}
            except ValueError:
                ap.error(f"--mesh {args.mesh!r}: expected "
                         "'axis=N[,axis=N]', e.g. data=4")
            from elektronn2_tpu.parallel import make_mesh
            mesh = make_mesh(axes)
        traces = tracer.trace_batch(seeds, save_kzip=out_name, mesh=mesh,
                                    axis_name=next(iter(axes))
                                    if mesh is not None else "data")
        logger.info(f"traced {len(traces)} agent(s) "
                    f"({[len(t) for t in traces]} nodes) -> {out_name}")
        return 0

    if os.path.isdir(args.input):
        from elektronn2_tpu.data import KnossosArray
        ka = KnossosArray(args.input)
        step = None
        if args.step:
            try:
                step = [int(x) for x in args.step.split(",")]
            except ValueError:
                ap.error(f"--step {args.step!r}: expected three "
                         "comma-separated integers, e.g. 96,512,512")
            if len(step) != 3:
                ap.error(f"--step {args.step!r}: expected exactly three "
                         "comma-separated integers (z,x,y)")
        slab_batch = args.slab_batch
        if args.tune and args.mesh:
            # the sharded sweep hardwires the 'direct' lowering (halo
            # exchange path) and its timings don't transfer from the
            # single-device programs the tuner measures — tuning here
            # would apply settings the pod execution ignores
            logger.warning("--tune measures the single-device serving "
                           "path and does not transfer to --mesh sweeps "
                           "(the halo-sharded path uses the 'direct' "
                           "lowering) — skipping autotune")
        elif args.tune:
            from elektronn2_tpu.neuromancer.inference import \
                DEFAULT_TUNE_STEPS_3D
            # the user's --step competes AGAINST the default candidates
            # (it does not restrict the search — --tune overrides --step);
            # candidates are clamped to the dataset extent (a slab larger
            # than the region would never be dispatched by the sweep)
            rshape = [int(v) for v in ka.shape[-3:]]
            cand = []
            for c in ([tuple(step)] if step else []) + list(
                    DEFAULT_TUNE_STEPS_3D):
                c = tuple(min(int(v), r) for v, r in zip(c, rshape))
                if c not in cand:
                    cand.append(c)
            # reduced-precision contenders only when the user opted into
            # a lossy mode — a bare --tune must not silently switch the
            # output numerics because int8/bf16 benchmarked faster
            # (review r2 s6); the Python API keeps them on by default
            tuned = model.tune_serving(steps=cand, apply=True,
                                       include_bf16=args.bf16,
                                       include_int8=args.int8)
            if tuned["best"] is not None:
                step = list(tuned["best"]["step"])
                slab_batch = int(tuned["best"]["slab_batch"])
                logger.info(f"--tune picked {tuned['best']}")
                asked = ("bfloat16" if args.bf16
                         else "int8" if args.int8 else None)
                if asked and tuned["best"]["dtype"] != asked:
                    logger.info(
                        f"--tune overrode the requested --"
                        f"{'bf16' if asked == 'bfloat16' else 'int8'}: "
                        f"the measured winner runs "
                        f"{tuned['best']['dtype'] or 'f32'}")
            else:
                logger.warning("--tune: no contender ran (graph outside "
                               "the dilated path) — using CLI settings")
        mesh = None
        if args.mesh:
            try:
                axes = {k: int(v) for k, v in
                        (kv.split("=") for kv in args.mesh.split(","))}
            except ValueError:
                ap.error(f"--mesh {args.mesh!r}: expected "
                         "'axis=N[,axis=N]', e.g. data=2,space=4")
            from elektronn2_tpu.parallel import make_mesh
            mesh = make_mesh(axes)
        out = model.sweep_knossos(ka, step=step, verbose=True, mesh=mesh,
                                  slab_batch=slab_batch)
    else:
        path, _, key = args.input.partition(":")
        raw = h5load(path, key or None)
        raw = np.asarray(raw)
        out = model.predict_dense(raw, pad_raw=not args.no_pad,
                                  as_uint8=args.uint8, verbose=True)

    h5save({"prediction": out}, args.out)
    logger.info(f"wrote {args.out} {out.shape} {out.dtype}")
    if args.knossos_out:
        from elektronn2_tpu.data.knossos_array import save_knossos
        u8 = (out if out.dtype == np.uint8
              else np.clip(out * 255.0, 0, 255).astype(np.uint8))
        for c in range(u8.shape[0]):
            save_knossos(u8[c], os.path.join(args.knossos_out, f"c{c}"),
                         exp_name=f"pred_c{c}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
