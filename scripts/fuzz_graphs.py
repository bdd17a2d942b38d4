#!/usr/bin/env python
"""Graph-space fuzzer: random neuromancer graphs, cross-checked across
every dense-serving path and the persistence round-trips.

Why this exists: the per-config equality tests lock the exact graphs they
were written for; the bug class that review keeps finding (r2 s15: the
sweep-slab pooling-grid phase shift, the decoder pad_raw M-rounding) lives
in the *interaction* of graph geometry with the serving paths — exactly
what a randomized generator covers and hand-written configs don't.

Per seed this builds a random valid model (encoder chains with optional
anisotropic MFP pooling, crops, grouped softmax heads; or U-Net-style
decoder graphs with UpConv + FaithlessMerge), then asserts:

  1. fused device sweep (dilated or conv-dense) == overlap-tiled host
     oracle (``predict_dense(prefer_device=False)``), full-array, since
     every generated graph has residual stride 1;
  2. same with ``pad_raw=True`` (probabilistic);
  3. a randomly drawn equivalent lowering (``set_dilated_impl`` s2bg/zfold
     or ``set_convdense_impl`` d2s/zfold/ptail) == the default lowering;
  4. ``save`` -> ``modelload`` replay predicts identically;
  5. ``rebuild_model`` predicts identically (probabilistic).

Generator-invalid seeds (graph can't be built at any probed patch size)
are *skipped*, never silently passed; any exception past construction is
a FAILURE.

Usage:
    python scripts/fuzz_graphs.py --start 0 --count 50 [--stop-on-fail]

CI runs a fixed slice through tests/test_fuzz_graphs.py; this CLI is for
longer offline sweeps.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACTIVATIONS = ["relu", "lin", "tanh", "sigmoid"]


# --------------------------------------------------------------------------
# pure shape simulation (per spatial dim) — mirrors the node arithmetic so
# the generator can probe valid patch sizes without building graphs
# --------------------------------------------------------------------------

def _sim_dim(ops, size):
    """Return the output size for one spatial dim, or None if invalid.
    ops: list of ("conv", f, p, mfp) | ("crop", lo, hi) | ("upconv", p)
    | ("merge", ops_of_skip_branch_from_fork)."""
    sizes = {"main": size}

    def run(seq, s):
        for op in seq:
            if op[0] == "conv":
                _, f, p, mfp = op
                s = s - f + 1
                if s < 1:
                    return None
                if p > 1:
                    if mfp:
                        if (s + 1) % p:
                            return None
                        s = (s + 1) // p - 1
                    else:
                        if s % p:
                            return None
                        s //= p
            elif op[0] == "crop":
                s = s - op[1] - op[2]
                if s < 1:
                    return None
            elif op[0] == "upconv":
                s *= op[1]
            elif op[0] == "merge":
                skip = run(op[1], sizes["fork"])
                if skip is None:
                    return None
                s = min(s, skip)
            elif op[0] == "fork":
                sizes["fork"] = s
            else:
                raise AssertionError(op)
        return s

    return run(ops, size)


def _probe_patch(ops_per_dim, lo=1, hi=48):
    """Smallest valid input size per dim (independent dims), or None."""
    out = []
    for ops in ops_per_dim:
        for s in range(lo, hi + 1):
            r = _sim_dim(ops, s)
            if r is not None and r >= 1:
                out.append(s)
                break
        else:
            return None
    return out


# --------------------------------------------------------------------------
# generator
# --------------------------------------------------------------------------

class SkipSeed(Exception):
    """Generator produced an unbuildable genotype — skip, don't fail."""


def build_random_model(seed, force_ndim=None, batch=1, spatial_safe=False,
                       z_multiple=1):
    """Build a random valid model. Returns (model, info) or raises
    SkipSeed. All generated graphs have residual output stride 1 (every
    decimating pool is either MFP'd or undone by an UpConv), so dense
    outputs are directly comparable across all serving paths.

    ``force_ndim``/``batch``/``spatial_safe``/``z_multiple`` serve the
    MESH family (r4): ``spatial_safe`` biases the genotype toward graphs
    the z-sharded trainers accept (no z-pooling, no MFP, no crops, single
    softmax group — z convs stay free since they halo-exchange), and
    ``z_multiple`` rounds the input z extent up to a mesh-divisible
    multiple (valid because spatial_safe z ops are all stride-1 convs).
    Defaults reproduce the original families byte-identically."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer import model_manager

    rng = np.random.RandomState(seed)
    ndim = int(rng.choice([2, 3]))
    if force_ndim is not None:
        ndim = int(force_ndim)
    tags = "b,f,z,x,y" if ndim == 3 else "b,f,x,y"
    n_ch = int(rng.randint(1, 3))
    decoder = bool(rng.rand() < 0.4)

    # ---- genotype: per-layer specs + per-dim op lists for the size probe
    layers = []          # ("conv", n_f, filt(list), pool(list), mfp, act)
    ops_dims = [[] for _ in range(ndim)]

    def add_conv(n_f, filt, pool, mfp, act):
        layers.append(("conv", n_f, filt, pool, mfp, act))
        for d in range(ndim):
            ops_dims[d].append(("conv", filt[d], pool[d], mfp))

    n_enc = int(rng.randint(1, 4))
    pooled = False
    for i in range(n_enc):
        filt = [int(rng.randint(1, 4)) for _ in range(ndim)]
        if ndim == 3 and rng.rand() < 0.5:
            filt[0] = 1                         # anisotropic EM-style layer
        pool = [1] * ndim
        want_pool = rng.rand() < 0.5 and not (decoder and pooled)
        if want_pool:
            pool = [2] * ndim
            if ndim == 3 and (rng.rand() < 0.5 or spatial_safe):
                pool[0] = 1                     # anisotropic pooling
            pooled = True
        mfp = bool(any(p > 1 for p in pool) and not decoder
                   and not spatial_safe)
        act = ACTIVATIONS[rng.randint(len(ACTIVATIONS))]
        add_conv(int(rng.randint(2, 6)), filt, pool, mfp, act)
        if not decoder and not spatial_safe and rng.rand() < 0.2:
            lo, hi = int(rng.randint(0, 2)), int(rng.randint(0, 2))
            if lo or hi:
                layers.append(("crop", lo, hi))
                for d in range(ndim):
                    ops_dims[d].append(("crop", lo, hi))

    up_pool = None
    if decoder:
        if not pooled:                          # force exactly one pooling
            filt = [int(rng.randint(1, 3)) for _ in range(ndim)]
            pool = [2] * ndim
            if ndim == 3 and (rng.rand() < 0.5 or spatial_safe):
                pool[0] = 1
            add_conv(int(rng.randint(2, 6)), filt, pool, False, "relu")
            pooled = True
        # fork point = input side; skip arm is everything before the first
        # pooled conv; merge after UpConv. Simplest faithful structure:
        # skip = output of the last pre-pool layer. Rebuild the op lists
        # with an explicit fork marker before the first pooled conv.
        new_ops = [[] for _ in range(ndim)]
        fork_placed = False
        for li, spec in enumerate(layers):
            if (spec[0] == "conv" and any(p > 1 for p in spec[3])
                    and not fork_placed):
                for d in range(ndim):
                    new_ops[d].append(("fork",))
                fork_placed = True
                fork_layer = li
            for d in range(ndim):
                if spec[0] == "conv":
                    new_ops[d].append(("conv", spec[2][d], spec[3][d],
                                       spec[4]))
                else:
                    new_ops[d].append(("crop", spec[1], spec[2]))
        ops_dims = new_ops
        up_pool = layers[fork_layer][3]         # undo exactly that pooling
        for d in range(ndim):
            ops_dims[d].append(("upconv", up_pool[d]))
            ops_dims[d].append(("merge", []))   # skip arm: identity at fork
        # post-merge conv head (kz may be >1)
        post_filt = [int(rng.randint(1, 3)) for _ in range(ndim)]
        layers.append(("postconv", int(rng.randint(2, 6)), post_filt))
        for d in range(ndim):
            ops_dims[d].append(("conv", post_filt[d], 1, False))

    # head: 1x1 conv to n_out (+ optional grouped softmax; single group
    # when spatial_safe — the mesh-train leg pairs the head with a sparse
    # MultinoulliNLL, whose class-index semantics assume one group)
    n_groups = 2 if (rng.rand() < 0.2 and not spatial_safe) else 1
    n_out = n_groups * int(rng.randint(2, 4))
    for d in range(ndim):
        ops_dims[d].append(("conv", 1, 1, False))

    patch = _probe_patch(ops_dims)
    if patch is None:
        raise SkipSeed(f"no valid patch size for seed {seed}")
    # a little headroom above the minimum (keeps runtime bounded but
    # exercises non-minimal geometry)
    patch = [p + int(rng.randint(0, 3)) * (2 if pooled else 1)
             for p in patch]
    if any(_sim_dim(ops_dims[d], patch[d]) is None for d in range(ndim)):
        patch = _probe_patch(ops_dims)          # headroom broke validity
    if decoder:
        # decoder tiles must emit >= one phase period of outputs per dim
        # (the tiled paths REJECT sub-period patches — phase-consistent
        # tiling is impossible there; r3 campaign finding): grow the
        # patch until the simulated output covers the period
        for d in range(ndim):
            period = up_pool[d]
            tries = 0
            while True:
                out_d = _sim_dim(ops_dims[d], patch[d])
                if out_d is not None and out_d >= period:
                    break
                patch[d] += 1
                tries += 1
                if tries > 60:
                    raise SkipSeed(
                        f"seed {seed}: no patch with out >= period")

    if z_multiple > 1:
        # round z up to a mesh-divisible multiple (spatial_safe z ops are
        # stride-1 convs, so any larger z stays valid — re-checked anyway)
        patch[0] = -(-patch[0] // z_multiple) * z_multiple
        if _sim_dim(ops_dims[0], patch[0]) is None:
            raise SkipSeed(f"seed {seed}: z_multiple {z_multiple} breaks "
                           "validity")

    # ---- build
    model_manager.reset(seed=seed)
    try:
        inp = nm.Input([batch, n_ch] + list(patch), tags, name="raw")
        x = inp
        fork_node = None
        li = 0
        for spec in layers:
            if spec[0] == "conv":
                _, n_f, filt, pool, mfp, act = spec
                if decoder and fork_node is None \
                        and any(p > 1 for p in pool):
                    fork_node = x
                x = nm.Conv(x, n_f, filt, pool, mfp=mfp,
                            activation_func=act, name=f"c{li}")
            elif spec[0] == "crop":
                x = nm.Crop(x, [(spec[1], spec[2])] * ndim, name=f"crop{li}")
            elif spec[0] == "postconv":
                pass                            # handled after merge below
            li += 1
        if decoder:
            x = nm.UpConv(x, int(rng.randint(2, 6)), up_pool,
                          activation_func="relu", name="up")
            x = nm.FaithlessMerge(x, fork_node, name="mg")
            post = [s for s in layers if s[0] == "postconv"][0]
            x = nm.Conv(x, post[1], post[2], 1, activation_func="relu",
                        name="post")
        x = nm.Conv(x, n_out, 1, 1, activation_func="lin", name="head")
        probs = nm.Softmax(x, n_indep=n_groups, name="probs")
        m = model_manager.getmodel(f"fuzz{seed}")
        m.designate_nodes(input_node=inp, prediction_node=probs)
    except ValueError as e:
        raise SkipSeed(f"seed {seed} build rejected: {e}")

    info = {"seed": seed, "ndim": ndim, "decoder": decoder, "patch": patch,
            "n_ch": n_ch, "layers": len(layers), "pooled": pooled,
            "batch": batch}
    return m, info


# --------------------------------------------------------------------------
# tracing family: random recurrent/feedforward step-predictor models
# --------------------------------------------------------------------------

def build_random_tracing_model(seed):
    """Random tracing-family model (SURVEY §3.2/§4.D): a step predictor
    mapping a patch (+ carried recurrent state for ScanN graphs) to a
    3-vector step. Returns (model, info) or raises SkipSeed."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer import model_manager

    rng = np.random.RandomState(10_000 + seed)
    p = int(rng.choice([3, 5, 7]))
    patch = (p, p, p)
    recurrent = bool(rng.rand() < 0.7)
    enc_w = int(rng.choice([4, 8, 16]))
    cell = "GRU" if rng.rand() < 0.5 else "LSTM"
    cell_w = int(rng.choice([4, 8]))
    T, B = int(rng.choice([2, 3])), 1

    model_manager.reset(seed=seed)
    try:
        if recurrent:
            seq = nm.Input([T, B, 1, *patch], "s,b,f,z,x,y", name="seq")
            x_t = nm.Input([B, 1, *patch], "b,f,z,x,y", name="x_t")
            enc = nm.Perceptron(x_t, enc_w, flatten=True, name="enc")
            if cell == "GRU":
                h0 = nm.InitialState_like(enc, override_f=cell_w,
                                          name="h0")
                rec = nm.GRU(enc, h0, n_f=cell_w, name="cell")
                in_mem = h0
            else:
                # LSTM carries [h, c] concatenated in ONE state (2*n_f)
                s0 = nm.InitialState_like(enc, override_f=2 * cell_w,
                                          name="s0")
                rec = nm.LSTM(enc, s0, n_f=cell_w, name="cell")
                in_mem = s0
            scan = nm.ScanN(rec, in_memory=in_mem, in_iterate=x_t,
                            in_iterate_0=seq, n_steps=T, name="scan")
            head = nm.Perceptron(scan, 3, activation_func="lin",
                                 name="step")
            tgt = nm.Input([T, B, 3], "s,b,f", name="target")
            loss = nm.AggregateLoss(nm.SquaredLoss(head, tgt))
            m = model_manager.getmodel(f"tfuzz{seed}")
            m.designate_nodes(input_node=seq, target_node=tgt,
                              loss_node=loss, prediction_node=head)
        else:
            x_t = nm.Input([B, 1, *patch], "b,f,z,x,y", name="x_t")
            h = nm.Perceptron(x_t, enc_w, flatten=True, name="enc")
            if rng.rand() < 0.5:
                h = nm.Perceptron(h, enc_w, name="enc2")
            head = nm.Perceptron(h, 3, activation_func="lin", name="step")
            tgt = nm.Input([B, 3], "b,f", name="target")
            loss = nm.AggregateLoss(nm.SquaredLoss(head, tgt))
            m = model_manager.getmodel(f"tfuzz{seed}")
            m.designate_nodes(input_node=x_t, target_node=tgt,
                              loss_node=loss, prediction_node=head)
    except ValueError as e:
        raise SkipSeed(f"tracing seed {seed} build rejected: {e}")
    info = {"seed": seed, "recurrent": recurrent, "cell": cell,
            "patch": patch, "enc_w": enc_w, "cell_w": cell_w}
    return m, info


def check_tracing_seed(seed, verbose=False):
    """Cross-checks for one tracing-family seed: fused DeviceTracer vs
    the per-step host Tracer (trajectory parity), persistence round-trip
    of the rollout, and a finite trainingstep. Returns failure strings."""
    import jax.numpy as jnp
    from elektronn2_tpu.data.tracing_utils import DeviceTracer, Tracer
    from elektronn2_tpu.neuromancer.model import modelload

    m, info = build_random_tracing_model(seed)
    rng = np.random.RandomState(20_000 + seed)
    # tame the step head: rollouts are chaotic maps (position feeds back
    # into patch extraction), so untrained-scale steps amplify the
    # host/device interpolation difference (float64 warp_slice vs f32
    # trilinear corners) exponentially and NO tolerance is meaningful;
    # small smooth steps bound the per-step growth (the same conditioning
    # the hand-written parity tests use)
    import jax.numpy as jnp_
    m.params["step"]["w"] = jnp_.asarray(
        np.asarray(m.params["step"]["w"]) * 0.05)
    m.params["step"]["b"] = jnp_.asarray(
        (rng.rand(3).astype(np.float32) - 0.3) * 0.6)
    V = 24
    vol = rng.rand(1, V, V, V).astype(np.float32)
    K = 6
    seeds_pos = rng.uniform(V * 0.35, V * 0.65, (3, 3))
    if verbose:
        print(f"tracing seed {seed}: {info}", flush=True)
    fails = []

    dt = DeviceTracer(m, vol, max_steps=K)
    dev_traces = dt.trace_batch(seeds_pos)
    ht = Tracer(m, vol, max_steps=K)
    for i, sp in enumerate(seeds_pos):
        host_tr = ht.trace(sp).coords
        dev_tr = dev_traces[i].coords
        if len(host_tr) != len(dev_tr):
            fails.append(f"tracing seed {seed} [len] agent {i}: host "
                         f"{len(host_tr)} vs device {len(dev_tr)} ({info})")
            continue
        d = (float(np.max(np.abs(host_tr - dev_tr)))
             if len(host_tr) else 0.0)
        # bound: JAX CPU's default matmul precision carries ~bf16-level
        # noise per step (memory: exactness needs highest precision);
        # K=6 steps of feedback amplify it — 5e-3 separates that from
        # semantic divergence (real bugs measured 1e-2..8e-2 untamed)
        if d > 5e-3:
            fails.append(f"tracing seed {seed} [traj] agent {i}: "
                         f"max|diff|={d:.3e} ({info})")

    # pool leg (r5, VERDICT r4 #4a): respawning pool == per-seed
    # rollouts across the random genotype space (the r4 pool logic was
    # guarded only by fixed hand-picked graphs)
    traces_p, stats_p = dt.trace_pool(seeds_pos, batch_size=2)
    if stats_p["consumed"] != len(seeds_pos):
        fails.append(f"tracing seed {seed} [pool consumed] "
                     f"{stats_p['consumed']} != {len(seeds_pos)} ({info})")
    else:
        for i, (tp, tb) in enumerate(zip(traces_p, dev_traces)):
            if len(tp.coords) != len(tb.coords) or (
                    len(tp.coords) and not np.allclose(
                        tp.coords, tb.coords, atol=1e-5)):
                fails.append(f"tracing seed {seed} [pool] agent {i} "
                             f"({info})")

    # chained-wave pool leg (r5 #4b): wave_steps below the rollout
    # length forces live agents across dispatch boundaries
    traces_c, stats_c = dt.trace_pool_chain(
        seeds_pos, batch_size=2, wave_seeds=2, wave_steps=max(2, K // 2))
    if stats_c["consumed"] != len(seeds_pos):
        fails.append(f"tracing seed {seed} [chain consumed] "
                     f"{stats_c['consumed']} != {len(seeds_pos)} ({info})")
    else:
        for i, (tp, tb) in enumerate(zip(traces_c, dev_traces)):
            if len(tp.coords) != len(tb.coords) or (
                    len(tp.coords) and not np.allclose(
                        tp.coords, tb.coords, atol=1e-5)):
                fails.append(f"tracing seed {seed} [chain] agent {i} "
                             f"({info})")

    # rotated-mode leg (r5): frame-aligned device rollout vs the host
    # Tracer across the genotype space (was hand-tested only)
    if seed % 2 == 0:
        dtr = DeviceTracer(m, vol, max_steps=4, rotate_to_heading=True)
        htr = Tracer(m, vol, max_steps=4, rotate_to_heading=True)
        for i, sp in enumerate(seeds_pos[:2]):
            host_tr = htr.trace(sp).coords
            dev_tr = dtr.trace(sp).coords
            if len(host_tr) != len(dev_tr):
                fails.append(f"tracing seed {seed} [rot len] agent {i}: "
                             f"host {len(host_tr)} vs device "
                             f"{len(dev_tr)} ({info})")
            elif len(host_tr) and float(np.max(np.abs(
                    host_tr - dev_tr))) > 5e-3:
                fails.append(f"tracing seed {seed} [rot traj] agent {i} "
                             f"({info})")

    # rotated-extraction KERNEL leg (r5 #3): interpret-mode Mosaic
    # kernel vs the XLA gather oracle on an eligible random geometry
    if seed % 4 == 0:
        import jax as _jax
        from elektronn2_tpu.data.tracing_utils import _flight_frame_jnp
        from elektronn2_tpu.ops.pallas_extract_rot import (
            rotated_patches_pallas, rotated_extract_eligible)
        kp = int(rng.choice([4, 8]))
        kpatch = (kp, 4, 4)
        kvol = jnp.asarray(rng.rand(1, 24, 32, 256), np.float32)
        if rotated_extract_eligible(kvol.shape, kvol.dtype, kpatch):
            kpos = jnp.asarray(
                rng.uniform(10, 14, (4, 3))
                * np.asarray([1.0, 1.5, 12.0]), jnp.float32)
            kheads = jnp.asarray(rng.randn(4, 3), jnp.float32)
            kF = _jax.vmap(_flight_frame_jnp)(kheads)

            class _S:
                patch_size = kpatch
                _extract_rot_batch = DeviceTracer._extract_rot_batch
            kref, kok, _ = _S()._extract_rot_batch(kvol, kpos, kheads)
            kgot, kok2 = rotated_patches_pallas(kvol, kpos, kF, kpatch,
                                                interpret=True)
            if not bool(jnp.all(kok == kok2)):
                fails.append(f"tracing seed {seed} [rotkernel ok] ({info})")
            km = np.asarray(kok)
            if km.any() and float(jnp.max(jnp.abs(
                    kgot[km] - kref[km]))) > 1e-4:
                fails.append(f"tracing seed {seed} [rotkernel] ({info})")

    # persistence: the saved/reloaded model rolls out identically
    with tempfile.TemporaryDirectory() as td:
        f = os.path.join(td, "m.mdl")
        m.save(f)
        m2 = modelload(f)
        dt2 = DeviceTracer(m2, vol, max_steps=K)
        for a, b in zip(dt2.trace_batch(seeds_pos), dev_traces):
            if len(a) != len(b) or (len(a) and not np.allclose(
                    a.coords, b.coords, atol=1e-6)):
                fails.append(f"tracing seed {seed} [modelload replay] "
                             f"({info})")
                break

    # training: one step, finite loss
    m.set_opt("SGD", lr=1e-3)
    if info["recurrent"]:
        T = int(m.input_node.shape["s"])
        x = rng.rand(T, 1, 1, *info["patch"]).astype(np.float32)
        y = rng.rand(T, 1, 3).astype(np.float32)
    else:
        x = rng.rand(1, 1, *info["patch"]).astype(np.float32)
        y = rng.rand(1, 3).astype(np.float32)
    loss, _ = m.trainingstep(x, y)
    if not np.isfinite(float(loss)):
        fails.append(f"tracing seed {seed} [train] non-finite loss "
                     f"({info})")
    return fails


# --------------------------------------------------------------------------
# training family: fused multi-step chunk vs sequential steps
# --------------------------------------------------------------------------

OPTIMISERS = [("SGD", {"lr": 0.05, "mom": 0.0}),
              ("SGD", {"lr": 0.02, "mom": 0.9}),
              ("Adam", {"lr": 1e-3}),
              ("AdaGrad", {"lr": 0.01}),
              ("AdaDelta", {"lr": 0.5})]


def _trainable_models(seed):
    """Two identically-initialised models for the seed's genotype, each
    wrapped with a SquaredLoss head (works for every generated graph,
    grouped softmax included)."""
    import elektronn2_tpu.neuromancer as nm

    out = []
    for _ in range(2):
        m, info = build_random_model(seed)
        probs = m.prediction_node
        tgt = nm.Input([1, probs.shape["f"],
                        *probs.shape.spatial_shape],
                       probs.shape.tags_str
                       if hasattr(probs.shape, "tags_str")
                       else ",".join(probs.shape.tags), name="tgt")
        loss = nm.AggregateLoss(nm.SquaredLoss(probs, tgt), name="loss")
        m.designate_nodes(input_node=m.nodes["raw"], target_node=tgt,
                          loss_node=loss, prediction_node=probs)
        opt, kw = OPTIMISERS[np.random.RandomState(seed).randint(
            len(OPTIMISERS))]
        m.set_opt(opt, **kw)
        out.append((m, info))
    return out


def check_train_seed(seed, verbose=False):
    """Training-path cross-check on a random graph: a fused K-step chunk
    (``make_fused_hostfed_trainstep`` — one lax.scan dispatch) must
    reproduce K sequential ``Model.trainingstep`` calls (losses + final
    params), for a randomly drawn optimiser. Locks the optimiser/scan/
    donation interaction across graph space, not just the hand-written
    configs."""
    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.training.fused_loop import \
        make_fused_hostfed_trainstep

    (m1, info), (m2, _) = _trainable_models(seed)
    if verbose:
        print(f"train seed {seed}: {info} opt={type(m1.optimiser).__name__}",
              flush=True)
    rng = np.random.RandomState(30_000 + seed)
    K = 3
    xs = [rng.rand(*m1.input_node.shape).astype(np.float32)
          for _ in range(K)]
    ys = [rng.rand(*m1.target_node.shape).astype(np.float32)
          for _ in range(K)]

    seq_losses = [float(m1.trainingstep(x, y)[0]) for x, y in zip(xs, ys)]

    fused = make_fused_hostfed_trainstep(m2, K)
    feeds = {m2.input_node.name: jnp.asarray(np.stack(xs)),
             m2.target_node.name: jnp.asarray(np.stack(ys))}
    keys = jax.random.split(jax.random.PRNGKey(0), K)
    losses, _, new_p, _, _, _ = fused(
        m2.params, m2.opt_state, m2.state, feeds, keys,
        m2.optimiser.current_hyper(), {})

    fails = []
    if not np.allclose(np.asarray(losses), seq_losses, rtol=1e-4,
                       atol=1e-6):
        fails.append(f"train seed {seed} [losses]: fused "
                     f"{np.asarray(losses).tolist()} vs seq {seq_losses} "
                     f"({info})")
    for nname, pd in m1.params.items():
        for pname, v in pd.items():
            d = float(np.max(np.abs(np.asarray(v)
                                    - np.asarray(new_p[nname][pname]))))
            if d > 1e-5:
                fails.append(f"train seed {seed} [param {nname}/{pname}]: "
                             f"max|diff|={d:.3e} ({info})")
    return fails


# --------------------------------------------------------------------------
# mesh family: random graphs x random device meshes — the sharded serving
# and training paths must equal their unsharded references exactly
# --------------------------------------------------------------------------

# leg-level clean rejections: the sharded paths DOCUMENT these contracts
# and raise named errors (tests lock the messages); anything else raised
# by a sharded leg is a failure. Substrings, matched against str(e).
MESH_KNOWN_REJECTS = (
    "z-sharded",            # conv-dense leg contract violations
    "local z shard",        # z shard too small for the model patch
    "slab batch",           # batch not divisible by the mesh axis
    "phase period",         # tiled-oracle sub-period rejection
    "unpooled z",           # conv-dense M_z != 1
    "decohere",             # per-rank padding would decohere voxels
    "unsupported node type",  # dilated-path structural rejection (e.g.
                              # Crop): the sharded sweep serves dilated-
                              # expressible + decoder graphs; others name
                              # the node and refuse rather than decohere
    "z-pooling",            # spatial train: z-pool unsupported
    "branches; pipeline",   # GPipe: linear conv chains only
    "uses mfp/BN/dropout",  # GPipe: stage-incompatible conv features
    "pipeline stages for",  # GPipe: fewer layers than pipe ranks
    "no Conv chain",        # GPipe: graph has no stageable chain
    "pipeline loss head",   # GPipe: unsupported loss graph
    "trainable params outside",  # GPipe: params outside the chain
    "MFP training",         # spatial train: mfp unsupported
    "misaligned skip rows", # spatial train: z-cropping merge
    "z crop",               # spatial train: explicit z crop
    "BatchNorm training",   # spatial train: BN stats hazard
)

SERVING_MESH_AXES = [{"space": 2}, {"space": 4}, {"space": 8},
                     {"data": 2, "space": 2}, {"data": 2, "space": 4},
                     {"data": 4, "space": 2}]
TRAIN_MESH_AXES = [{"data": 2, "space": 2}, {"data": 2, "space": 4},
                   {"data": 4, "space": 2}]


def check_mesh_seed(seed, verbose=False):
    """Cross-checks for one MESH-family seed (r4, VERDICT r3 #1): random
    3D graphs served and trained over random device meshes must equal
    their unsharded references. The unsharded twin of this fuzzer found
    eight real stitcher bugs in r3; the sharded paths (the pod story)
    were guarded only by fixed hand-written graphs until now.

    Legs (probabilistic, all vs unsharded references):
      serving — ``predict_dense_sharded`` (+``pad_raw``, +an equivalent
      lowering under sharding, +``predict_dense_sharded_batch`` DP×SP);
      training — ``make_spatial_dp_trainstep`` K steps == K
      ``Model.trainingstep`` calls (loss trajectory + final params),
      fused ``make_fused_spatial_trainstep`` chunk == per-step, plus
      ``Model.use_mesh`` DP (full genotype space incl. MFP) and DP×TP.

    Documented contract rejections (``MESH_KNOWN_REJECTS``) are clean
    leg skips; any OTHER exception or numeric mismatch is a failure.
    """
    import jax
    import jax.numpy as jnp

    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.parallel import make_mesh

    if jax.device_count() < 8:
        raise RuntimeError(
            "mesh family needs >= 8 devices: set XLA_FLAGS="
            "--xla_force_host_platform_device_count=8 before JAX init "
            "(tests/conftest.py does; the CLI main() does)")

    rng = np.random.RandomState(40_000 + seed)
    fails = []
    n_leg = [0]

    def record(name, a, b, atol, info):
        a, b = np.asarray(a), np.asarray(b)
        if a.shape != b.shape:
            fails.append(f"mesh seed {seed} [{name}]: shape {a.shape} vs "
                         f"{b.shape} ({info})")
            return
        d = float(np.max(np.abs(a - b))) if a.size else 0.0
        if not np.allclose(a, b, atol=atol):
            fails.append(f"mesh seed {seed} [{name}]: max|diff|={d:.3e} "
                         f"(atol {atol}) ({info})")
        else:
            n_leg[0] += 1

    def run_leg(name, fn, info):
        try:
            return fn()
        except ValueError as e:       # UnsupportedGraphError subclasses it
            if any(k in str(e) for k in MESH_KNOWN_REJECTS):
                if verbose:
                    print(f"  [mesh {seed}] {name}: clean reject: {e}",
                          flush=True)
                return None
            fails.append(f"mesh seed {seed} [{name}] unexpected rejection:"
                         f" {e} ({info})")
            return None

    # ---------------- serving: full genotype space, random mesh ----------
    m, info = build_random_model(seed, force_ndim=3)
    axes = SERVING_MESH_AXES[rng.randint(len(SERVING_MESH_AXES))]
    mesh = make_mesh(axes, n_devices=int(np.prod(list(axes.values()))))
    n_space, n_data = axes["space"], axes.get("data", 1)
    info = {**info, "mesh": axes}
    fov = [int(f) for f in m.prediction_node.shape.fov]
    patch = info["patch"]
    z_need = max(patch[0], fov[0])
    Vz = n_space * z_need + int(rng.randint(0, n_space))  # pad path too
    Vxy = [max(p, f) + int(rng.randint(0, 4))
           for p, f in zip(patch[1:], fov[1:])]
    raw = rng.rand(info["n_ch"], Vz, *Vxy).astype(np.float32)
    if verbose:
        print(f"mesh seed {seed}: {info}  V={[Vz, *Vxy]}", flush=True)

    # the unsharded references can themselves reject shape-dependently
    # (e.g. the conv path falls to the tiled fallback, which refuses
    # sub-period patches) — same clean-skip rule as the sharded legs
    un = run_leg("unsharded ref", lambda: np.asarray(
        m.predict_dense_device(jnp.asarray(raw))), info)
    sh = run_leg("sharded", lambda: np.asarray(
        m.predict_dense_sharded(jnp.asarray(raw), mesh)), info) \
        if un is not None else None
    if sh is not None:
        record("sharded vs device", sh, un, 1e-5, info)
        if rng.rand() < 0.6:   # an equivalent lowering, still sharded
            if info["decoder"]:
                low = dict(upconv="d2s", zfold=bool(rng.rand() < 0.7),
                           ptail=bool(rng.rand() < 0.5))
                m.set_convdense_impl(**low)
            else:
                low = dict(impl=["s2b", "s2bg", "direct"][rng.randint(3)],
                           zfold=bool(rng.rand() < 0.5))
                m.set_dilated_impl(**low)
            alt = run_leg(f"sharded lowering {low}", lambda: np.asarray(
                m.predict_dense_sharded(jnp.asarray(raw), mesh)), info)
            if alt is not None:
                record(f"sharded lowering {low} vs default", alt, sh,
                       1e-5, info)
            m.set_convdense_impl()
            m.set_dilated_impl("direct")
    if rng.rand() < 0.5:
        un_p = run_leg("unsharded pad_raw ref", lambda: np.asarray(
            m.predict_dense_device(jnp.asarray(raw), pad_raw=True)), info)
        sh_p = run_leg("sharded pad_raw", lambda: np.asarray(
            m.predict_dense_sharded(jnp.asarray(raw), mesh,
                                    pad_raw=True)), info) \
            if un_p is not None else None
        if sh_p is not None:
            record("sharded pad_raw vs device", sh_p, un_p, 1e-5, info)
    if n_data > 1 and un is not None:   # DP x SP slab-batch serving
        B = n_data * (2 if rng.rand() < 0.3 else 1)
        vols = rng.rand(B, info["n_ch"], Vz, *Vxy).astype(np.float32)
        un_b = np.stack([np.asarray(m.predict_dense_device(jnp.asarray(v)))
                         for v in vols])
        sh_b = run_leg("sharded batch", lambda: np.asarray(
            m.predict_dense_sharded_batch(jnp.asarray(vols), mesh)), info)
        if sh_b is not None:
            record("sharded batch vs per-slab device", sh_b, un_b, 1e-5,
                   info)

    # ---------------- training: DP x SP spatial step ---------------------
    from elektronn2_tpu.parallel import (make_spatial_dp_trainstep,
                                         make_fused_spatial_trainstep,
                                         pad_target_for_spatial)

    taxes = TRAIN_MESH_AXES[rng.randint(len(TRAIN_MESH_AXES))]
    nd_t, ns_t = taxes["data"], taxes["space"]
    B = nd_t * (2 if rng.rand() < 0.3 else 1)
    opt, okw = OPTIMISERS[rng.randint(len(OPTIMISERS))]

    def build_nll_model():
        mm, ti = build_random_model(seed, force_ndim=3, batch=B,
                                    spatial_safe=True, z_multiple=ns_t)
        probs = mm.prediction_node
        tgt = nm.Input([B, *probs.shape.spatial_shape], "b,z,x,y",
                       dtype="int32", name="target")
        nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True,
                                name="nll")
        loss = nm.AggregateLoss(nll, name="loss")
        mm.designate_nodes(input_node=mm.nodes["raw"], target_node=tgt,
                           loss_node=loss, prediction_node=probs)
        mm.set_opt(opt, **okw)
        return mm, ti

    try:
        m1, tinfo = build_nll_model()
        m2, _ = build_nll_model()
    except SkipSeed:
        m1 = None              # serving legs already ran: not a seed skip
    if m1 is not None:
        tinfo = {**tinfo, "mesh": taxes, "opt": opt}
        mesh_t = make_mesh(taxes, n_devices=nd_t * ns_t)
        if verbose:
            print(f"mesh seed {seed} train: {tinfo}", flush=True)
        step = run_leg("spatial step build",
                       lambda: make_spatial_dp_trainstep(m2, mesh_t),
                       tinfo)
        if step is not None:
            Z = int(m1.input_node.shape.spatial_shape[0])
            zo, xo, yo = [int(s) for s in
                          m1.prediction_node.shape.spatial_shape]
            n_out = int(m1.prediction_node.shape["f"])
            K = 2
            data_K = rng.rand(K, B, tinfo["n_ch"], Z, *tinfo["patch"][1:]
                              ).astype(np.float32)
            tgt_K = (rng.rand(K, B, zo, xo, yo) * n_out).astype(np.int32)
            tgtp_K = np.stack([pad_target_for_spatial(t, Z)
                               for t in tgt_K])

            ref_losses = [float(m1.trainingstep(data_K[i], tgt_K[i])[0])
                          for i in range(K)]
            p, o, s = m2.params, m2.opt_state, m2.state
            hyper = m2.optimiser.current_hyper()
            sh_losses = []
            for i in range(K):
                lv, p, o, s = step(p, o, s, jnp.asarray(data_K[i]),
                                   jnp.asarray(tgtp_K[i]), hyper,
                                   jax.random.PRNGKey(i))
                sh_losses.append(float(lv))
            if not np.allclose(sh_losses, ref_losses, rtol=1e-4,
                               atol=1e-6):
                fails.append(f"mesh seed {seed} [spatial losses]: sharded "
                             f"{sh_losses} vs ref {ref_losses} ({tinfo})")
            else:
                n_leg[0] += 1
            for nname, pd in m1.params.items():
                for pname, v in pd.items():
                    record(f"spatial param {nname}/{pname}", p[nname][pname],
                           v, 2e-5, tinfo)

            if rng.rand() < 0.5:   # fused K-step chunk == per-step
                m3, _ = build_nll_model()
                chunk = run_leg(
                    "fused spatial build",
                    lambda: make_fused_spatial_trainstep(m3, mesh_t,
                                                         n_inner=K),
                    tinfo)
                if chunk is not None:
                    losses, p3, _, _ = chunk(
                        m3.params, m3.opt_state, m3.state,
                        jnp.asarray(data_K), jnp.asarray(tgtp_K), hyper,
                        jax.random.PRNGKey(99))
                    if not np.allclose(np.asarray(losses), sh_losses,
                                       rtol=2e-4, atol=1e-6):
                        fails.append(
                            f"mesh seed {seed} [fused spatial losses]: "
                            f"{np.asarray(losses).tolist()} vs per-step "
                            f"{sh_losses} ({tinfo})")
                    else:
                        n_leg[0] += 1
                    for nname, pd in p3.items():
                        for pname, v in pd.items():
                            record(f"fused param {nname}/{pname}", v,
                                   p[nname][pname], 2e-5, tinfo)

    # ---------------- training: use_mesh DP / DP x TP --------------------
    if rng.rand() < 0.6:
        B_dp = int(rng.choice([2, 4, 8]))
        tp = bool(rng.rand() < 0.4)
        if tp:
            B_dp = 2           # mesh {'data': 2, 'model': 4}
        try:
            pair = [_attach_sq_loss(
                build_random_model(seed, force_ndim=3, batch=B_dp))
                for _ in range(2)]
        except SkipSeed:
            pair = None
        if pair is not None:
            (ma, ainfo), (mb, _) = pair
            ainfo = {**ainfo, "dp": B_dp, "tp": tp}
            ma.set_opt("SGD", lr=0.02, mom=0.9)
            mb.set_opt("SGD", lr=0.02, mom=0.9)
            if tp:
                mb.use_mesh(make_mesh({"data": 2, "model": 4}),
                            model_axis="model")
            else:
                mb.use_mesh(make_mesh({"data": B_dp}, n_devices=B_dp))
            x = rng.rand(*[int(v) for v in ma.input_node.shape]
                         ).astype(np.float32)
            y = rng.rand(*[int(v) for v in ma.target_node.shape]
                         ).astype(np.float32)
            la = lb = None
            for _ in range(2):
                la, _ = ma.trainingstep(x, y)
                lb, _ = mb.trainingstep(x, y)
            if not np.allclose(float(la), float(lb), rtol=1e-4,
                               atol=1e-7):
                fails.append(f"mesh seed {seed} [use_mesh loss]: "
                             f"{float(lb)} vs {float(la)} ({ainfo})")
            else:
                n_leg[0] += 1
            for nname, pd in ma.params.items():
                for pname, v in pd.items():
                    record(f"use_mesh param {nname}/{pname}",
                           mb.params[nname][pname], v, 2e-5, ainfo)

    # ---------------- training: GPipe Model-API trainstep ----------------
    if rng.rand() < 0.4:
        from elektronn2_tpu.parallel import make_gpipe_trainstep, microbatch

        pipe_n = int(rng.choice([2, 4]))
        n_micro, mb = pipe_n, 1
        try:
            mp_a, pinfo = build_random_model(seed, force_ndim=3,
                                             batch=n_micro * mb,
                                             spatial_safe=True)
            mp_b, _ = build_random_model(seed, force_ndim=3,
                                         batch=n_micro * mb,
                                         spatial_safe=True)
        except SkipSeed:
            mp_a = None
        if mp_a is not None and not pinfo["decoder"]:
            import jax.numpy as jnp
            for mm in (mp_a, mp_b):
                probs = mm.prediction_node
                tgt = nm.Input([n_micro * mb, *probs.shape.spatial_shape],
                               "b,z,x,y", dtype="int32", name="target")
                nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True,
                                        name="nll")
                mm.designate_nodes(input_node=mm.nodes["raw"],
                                   target_node=tgt,
                                   loss_node=nm.AggregateLoss(nll,
                                                              name="loss"),
                                   prediction_node=probs)
                mm.set_opt("SGD", lr=0.02, mom=0.9)
            pinfo = {**pinfo, "pipe": pipe_n}
            mesh_pp = make_mesh({"pipe": pipe_n}, n_devices=pipe_n)
            pstep = run_leg("gpipe build",
                            lambda: make_gpipe_trainstep(
                                mp_b, mesh_pp, n_micro=n_micro,
                                mb_batch=mb), pinfo)
            if pstep is not None:
                B_pp = n_micro * mb
                zo, xo, yo = [int(s) for s in
                              mp_a.prediction_node.shape.spatial_shape]
                n_out = int(mp_a.prediction_node.shape["f"])
                x = rng.rand(B_pp, pinfo["n_ch"], *pinfo["patch"]
                             ).astype(np.float32)
                y = (rng.rand(B_pp, zo, xo, yo) * n_out).astype(np.int32)
                lv_ref, _ = mp_a.trainingstep(x, y)
                lv, new_p, _ = pstep(mp_b.params, mp_b.opt_state,
                                     microbatch(jnp.asarray(x), n_micro),
                                     microbatch(jnp.asarray(y), n_micro),
                                     mp_b.optimiser.current_hyper())
                if not np.allclose(float(lv), float(lv_ref), rtol=1e-4,
                                   atol=1e-7):
                    fails.append(f"mesh seed {seed} [gpipe loss]: "
                                 f"{float(lv)} vs {float(lv_ref)} "
                                 f"({pinfo})")
                else:
                    n_leg[0] += 1
                for nname, pd in new_p.items():
                    for pname, v in pd.items():
                        record(f"gpipe param {nname}/{pname}", v,
                               mp_a.params[nname][pname], 2e-5, pinfo)

    # ---------------- tracing: agent-DP trace_batch over the mesh --------
    # (r5, VERDICT r4 #4a: the dryrun asserts agent-DP == unsharded on
    # ONE fixed model; this fuzzes the genotype space. trace_pool_chain
    # on the same genotype guards the chained carry against the random
    # cell zoo as well.)
    if rng.rand() < 0.6:
        from elektronn2_tpu.data.tracing_utils import DeviceTracer
        tm, tinfo = build_random_tracing_model(seed)
        tm.params["step"]["w"] = jnp.asarray(
            np.asarray(tm.params["step"]["w"]) * 0.05)
        tm.params["step"]["b"] = jnp.asarray(
            (rng.rand(3).astype(np.float32) - 0.3) * 0.6)
        V = 24
        tvol = rng.rand(1, V, V, V).astype(np.float32)
        tseeds = rng.uniform(V * 0.35, V * 0.65, (5, 3))  # pads to 8
        dtt = DeviceTracer(tm, tvol, max_steps=5)
        t_un = dtt.trace_batch(tseeds)
        t_mesh = make_mesh({"data": 8}, n_devices=8)
        t_sh = dtt.trace_batch(tseeds, mesh=t_mesh)
        for i in range(len(tseeds)):
            if len(t_sh[i].coords) != len(t_un[i].coords) or (
                    len(t_un[i].coords) and not np.allclose(
                        t_sh[i].coords, t_un[i].coords, atol=1e-5)):
                fails.append(f"mesh seed {seed} [tracer agent-DP] agent "
                             f"{i} ({tinfo})")
            else:
                n_leg[0] += 1
        t_ch, t_st = dtt.trace_pool_chain(tseeds, batch_size=2,
                                          wave_seeds=3, wave_steps=3)
        if t_st["consumed"] != len(tseeds):
            fails.append(f"mesh seed {seed} [tracer chain consumed] "
                         f"({tinfo})")
        else:
            for i in range(len(tseeds)):
                if len(t_ch[i].coords) != len(t_un[i].coords) or (
                        len(t_un[i].coords) and not np.allclose(
                            t_ch[i].coords, t_un[i].coords, atol=1e-5)):
                    fails.append(f"mesh seed {seed} [tracer chain] agent "
                                 f"{i} ({tinfo})")
                else:
                    n_leg[0] += 1

    if n_leg[0] == 0 and not fails:
        raise SkipSeed(f"mesh seed {seed}: every leg cleanly rejected")
    return fails


def _attach_sq_loss(built):
    """Attach an AggregateLoss(SquaredLoss) head to a freshly built random
    model (the check_train_seed wrapper, shared by the mesh DP/TP legs)."""
    import elektronn2_tpu.neuromancer as nm

    m, info = built
    probs = m.prediction_node
    B = int(m.input_node.shape["b"])
    # each MFP conv multiplies the runtime batch by its fragment count
    # (prod(pool)); the static TaggedShape keeps the declared b, so size
    # the target for the runtime batch explicitly
    for node in probs.all_parents():
        if getattr(node, "mfp", False):
            B *= int(np.prod(node.pool_shape))
    tgt = nm.Input([B, probs.shape["f"], *probs.shape.spatial_shape],
                   probs.shape.tags_str
                   if hasattr(probs.shape, "tags_str")
                   else ",".join(probs.shape.tags), name="tgt")
    loss = nm.AggregateLoss(nm.SquaredLoss(probs, tgt), name="loss")
    m.designate_nodes(input_node=m.nodes["raw"], target_node=tgt,
                      loss_node=loss, prediction_node=probs)
    return m, info


# --------------------------------------------------------------------------
# per-seed check
# --------------------------------------------------------------------------

def check_seed(seed, verbose=False):
    """Run all cross-checks for one seed. Returns a list of failure
    strings (empty = pass). Raises SkipSeed for unbuildable genotypes."""
    import jax.numpy as jnp
    from elektronn2_tpu.neuromancer.model import modelload, rebuild_model

    m, info = build_random_model(seed)
    rng = np.random.RandomState(seed + 1)
    ndim, patch = info["ndim"], info["patch"]
    extra = [int(rng.randint(0, 4)) for _ in range(ndim)]
    # the device sweep requires V >= fov (documented, raises otherwise);
    # the host oracle requires V >= patch — generate volumes valid for both
    fov = [int(f) for f in m.prediction_node.shape.fov]
    V = [max(p, f) + e for p, f, e in zip(patch, fov, extra)]
    raw = rng.rand(info["n_ch"], *V).astype(np.float32)
    if verbose:
        print(f"seed {seed}: {info}  V={V}", flush=True)

    fails = []

    def record(name, a, b, atol):
        if a.shape != b.shape:
            fails.append(f"seed {seed} [{name}]: shape {a.shape} vs "
                         f"{b.shape} ({info})")
            return
        d = float(np.max(np.abs(a - b))) if a.size else 0.0
        if not np.allclose(a, b, atol=atol):
            fails.append(f"seed {seed} [{name}]: max|diff|={d:.3e} "
                         f"(atol {atol}) ({info})")

    # the tiled oracle REJECTS sub-period patches (per-tile usable rows
    # < phase period — r3: phase-consistent tiling is impossible there).
    # Rejection is correct behaviour, not a failure — but the WHOLE-VOLUME
    # device paths still serve such graphs, so keep cross-checking them
    # against each other (lowerings, pad_raw interior, persistence)
    # instead of skipping the seed outright (advisor r3). The host and
    # device tiled stitchers share ``_tile_geometry``, so the rejection
    # itself cannot diverge between them.
    host = None
    try:
        host = m.predict_dense(raw, prefer_device=False)
    except ValueError as e:
        if "phase period" not in str(e):
            raise
    try:
        dev = np.asarray(m.predict_dense_device(jnp.asarray(raw)))
    except ValueError as e:
        if "phase period" in str(e) and host is None:
            # the whole-volume device paths rejected too (graph/shape-
            # dependent) and fell to the same tiled fallback: BOTH sides
            # refuse identically — the consistency the leg exists to
            # check. A device rejection while the host SERVED would
            # fall through as a failure.
            raise SkipSeed(f"seed {seed}: host and device consistently "
                           f"reject sub-period patch ({info})")
        raise
    if host is not None:
        record("device vs host oracle", dev, host, 1e-5)

    if rng.rand() < 0.6 or host is None:
        try:
            host_p = m.predict_dense(raw, pad_raw=True,
                                     prefer_device=False)
        except ValueError as e:
            if "phase period" not in str(e):
                raise
            host_p = None       # pad growth crossed the period bound
        try:
            dev_p = np.asarray(m.predict_dense_device(jnp.asarray(raw),
                                                      pad_raw=True))
        except ValueError as e:
            if "phase period" in str(e) and host_p is None:
                dev_p = None          # consistent rejection: skip leg
            else:
                raise
        if dev_p is not None and host_p is not None:
            record("pad_raw device vs host", dev_p, host_p, 1e-5)
        # interior invariant (oracle-free): voxels whose receptive field
        # lies fully inside the volume must equal the unpadded sweep —
        # pad_raw output position off+j has the same receptive field as
        # unpadded output j (the decoder pad rounding exists to preserve
        # exactly this phase coherence)
        if dev_p is not None:
            off = [(int(f) - 1) // 2
                   for f in m.prediction_node.shape.fov]
            sl = tuple(slice(o, o + s)
                       for o, s in zip(off, dev.shape[1:]))
            record("pad_raw interior vs nopad",
                   dev_p[(slice(None),) + sl], dev, 1e-5)

    # an equivalent lowering, drawn at random
    if info["decoder"]:
        m.set_convdense_impl(upconv="d2s", zfold=bool(rng.rand() < 0.7),
                             ptail=bool(rng.rand() < 0.5))
        alt = np.asarray(m.predict_dense_device(jnp.asarray(raw)))
        record("convdense d2s/zfold/ptail vs default", alt, dev, 1e-5)
        m.set_convdense_impl()                      # restore defaults
    elif ndim == 3:
        impl = ["s2b", "s2bg", "direct"][rng.randint(3)]
        zfold = bool(rng.rand() < 0.5)
        m.set_dilated_impl(impl, zfold=zfold)
        alt = np.asarray(m.predict_dense_device(jnp.asarray(raw)))
        record(f"dilated {impl} zfold={zfold} vs direct", alt, dev, 1e-5)
        m.set_dilated_impl("direct")

    # persistence round-trips
    with tempfile.TemporaryDirectory() as td:
        f = os.path.join(td, "m.mdl")
        m.save(f)
        m2 = modelload(f)
        dev2 = np.asarray(m2.predict_dense_device(jnp.asarray(raw)))
        record("modelload replay", dev2, dev, 1e-6)
    if rng.rand() < 0.5:
        m3 = rebuild_model(m)
        dev3 = np.asarray(m3.predict_dense_device(jnp.asarray(raw)))
        record("rebuild_model", dev3, dev, 1e-6)

    return fails


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--count", type=int, default=50)
    ap.add_argument("--family",
                    choices=["dense", "tracing", "train", "mesh", "all"],
                    default="dense",
                    help="graph family: dense serving graphs, tracing "
                         "step predictors, training chunks, or sharded "
                         "mesh cross-checks (random graph x random mesh)")
    ap.add_argument("--stop-on-fail", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the session's default device (the TPU "
                         "tunnel in this sandbox) instead of host CPU; "
                         "default is CPU — long campaigns through the "
                         "tunnel pay ~30 ms per dispatch and wedge risk")
    args = ap.parse_args()

    if not args.tpu:
        # mirror tests/conftest.py: 8 virtual CPU devices (the mesh
        # family hard-requires them; harmless for the others). Must land
        # before the first jax import initialises backends.
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")

    checkers = {"dense": check_seed, "tracing": check_tracing_seed,
                "train": check_train_seed, "mesh": check_mesh_seed}
    families = (["dense", "tracing", "train", "mesh"]
                if args.family == "all"
                else [args.family])
    n_pass = n_skip = 0
    all_fails = []
    for seed in range(args.start, args.start + args.count):
        for fam in families:
            try:
                fails = checkers[fam](seed, verbose=args.verbose)
            except SkipSeed as e:
                n_skip += 1
                if args.verbose:
                    print(f"SKIP {e}", flush=True)
                continue
            except Exception as e:      # crash = a finding, not a halt
                import traceback
                traceback.print_exc()
                fails = [f"{fam} seed {seed} CRASH: "
                         f"{type(e).__name__}: {e}"]
            if fails:
                all_fails += fails
                for f in fails:
                    print(f"FAIL {f}", flush=True)
                if args.stop_on_fail:
                    break
            else:
                n_pass += 1
                print(f"pass {fam} seed {seed}", flush=True)
        if all_fails and args.stop_on_fail:
            break
    print(f"\n{n_pass} passed, {n_skip} skipped, {len(all_fails)} failures")
    sys.exit(1 if all_fails else 0)


if __name__ == "__main__":
    main()
