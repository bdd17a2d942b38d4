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


def build_random_model(seed):
    """Build a random valid model. Returns (model, info) or raises
    SkipSeed. All generated graphs have residual output stride 1 (every
    decimating pool is either MFP'd or undone by an UpConv), so dense
    outputs are directly comparable across all serving paths."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer import model_manager

    rng = np.random.RandomState(seed)
    ndim = int(rng.choice([2, 3]))
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
            if ndim == 3 and rng.rand() < 0.5:
                pool[0] = 1                     # anisotropic pooling
            pooled = True
        mfp = bool(any(p > 1 for p in pool) and not decoder)
        act = ACTIVATIONS[rng.randint(len(ACTIVATIONS))]
        add_conv(int(rng.randint(2, 6)), filt, pool, mfp, act)
        if not decoder and rng.rand() < 0.2:
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
            if ndim == 3 and rng.rand() < 0.5:
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

    # head: 1x1 conv to n_out (+ optional grouped softmax)
    n_groups = 2 if rng.rand() < 0.2 else 1
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

    # ---- build
    model_manager.reset(seed=seed)
    try:
        inp = nm.Input([1, n_ch] + list(patch), tags, name="raw")
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
            "n_ch": n_ch, "layers": len(layers), "pooled": pooled}
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
    # < phase period — r3: phase-consistent tiling is impossible there;
    # the whole-volume device paths still serve such graphs). Rejection
    # is correct behaviour, not a failure: skip the affected leg.
    try:
        host = m.predict_dense(raw, prefer_device=False)
    except ValueError as e:
        if "phase period" in str(e):
            raise SkipSeed(f"seed {seed}: tiled oracle rejects "
                           f"sub-period patch ({info})")
        raise
    dev = np.asarray(m.predict_dense_device(jnp.asarray(raw)))
    record("device vs host oracle", dev, host, 1e-5)

    if rng.rand() < 0.6:
        try:
            host_p = m.predict_dense(raw, pad_raw=True,
                                     prefer_device=False)
        except ValueError as e:
            if "phase period" not in str(e):
                raise
            host_p = None       # pad growth crossed the period bound
        if host_p is not None:
            dev_p = np.asarray(m.predict_dense_device(jnp.asarray(raw),
                                                      pad_raw=True))
            record("pad_raw device vs host", dev_p, host_p, 1e-5)

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
                    choices=["dense", "tracing", "train", "all"],
                    default="dense",
                    help="graph family: dense serving graphs, tracing "
                         "step predictors, or both")
    ap.add_argument("--stop-on-fail", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the session's default device (the TPU "
                         "tunnel in this sandbox) instead of host CPU; "
                         "default is CPU — long campaigns through the "
                         "tunnel pay ~30 ms per dispatch and wedge risk")
    args = ap.parse_args()

    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    checkers = {"dense": check_seed, "tracing": check_tracing_seed,
                "train": check_train_seed}
    families = (["dense", "tracing", "train"]
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
