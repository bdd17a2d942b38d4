"""Model — designated nodes, compiled step functions, save/load.

Reference: ``elektronn2/neuromancer/model.py::Model, modelload,
rebuild_model, simple_cnn``. The Model aggregates the graph (designated
input/target/loss/prediction nodes), builds & caches compiled functions
(``trainingstep``, ``loss``, ``predict``, ``predict_dense``), exposes
parameter statistics, and serialises via the GraphManager node-spec contract.

TPU-first redesign: ``trainingstep`` is ONE jitted XLA program
(fwd+bwd+optimiser update, params donated so updates are in-place in HBM);
optimiser hyperparams are traced scalars → live-tunable without recompile;
model/optimiser state are explicit pytrees, not shared variables.
"""

from __future__ import annotations

import io
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from elektronn2_tpu.log import logger
from elektronn2_tpu.neuromancer import graphmanager
from elektronn2_tpu.neuromancer.graphmanager import GraphManager
from elektronn2_tpu.neuromancer.node_basic import Input, TraceCtx
from elektronn2_tpu.neuromancer.optimiser import get_optimiser, Optimiser


@jax.jit
def _tree_copy_jit(tree):
    return jax.tree_util.tree_map(jnp.copy, tree)


def _tree_device_copy(tree):
    """Deep-copy a pytree of (device) arrays in ONE jitted dispatch —
    data never leaves the device (vs a ``np.asarray`` tree walk, which
    pulls every buffer over D2H). All snapshot leaves are arrays by
    construction (params / optimiser slots / BN stats)."""
    if tree is None or not jax.tree_util.tree_leaves(tree):
        return tree
    return _tree_copy_jit(tree)


class Model:
    """A compiled view over a node graph.

    Usage (mirrors the reference):
        model = model_manager.getmodel()       # or gm.getmodel()
        model.designate_nodes(input_node=inp, target_node=tgt,
                              loss_node=loss, prediction_node=pred,
                              prediction_ext_node=ext, error_node=err)
        loss = model.trainingstep(data, target)
        probs = model.predict(raw)
    """

    def __init__(self, graph_manager, name="model"):
        self.gm = graph_manager
        self.name = name
        self.nodes = graph_manager.nodes
        self.input_node = None
        self.target_node = None
        self.loss_node = None
        self.prediction_node = None
        self.prediction_ext_node = None
        self.error_node = None
        self.debug_outputs = []
        self.extra_inputs = []

        # functional state
        self.params = {n.name: {k: jnp.asarray(v) for k, v in n.params.items()}
                       for n in self.nodes.values() if n.params}
        self.state = {}                       # aux state (BN running stats)
        self.optimiser = None
        self.opt_state = None
        self._lr_mults = None
        self._wd_mults = None
        self._step_fn = None
        self._step_raw = None
        self._mesh = None
        self._data_axis = "data"
        self._dilated_fns = {}
        self._compute_dtype = None
        self._remat = False
        self._predict_fns = {}
        self._loss_fn = None
        self._rng_key = jax.random.PRNGKey(0)
        self._step_count = 0
        self._node_index = {name: i for i, name in enumerate(self.nodes)}
        graph_manager.register_model(self)

    # ------------------------------------------------------------ designation
    def designate_nodes(self, input_node=None, target_node=None,
                        loss_node=None, prediction_node=None,
                        prediction_ext_node=None, error_node=None,
                        debug_outputs=None, extra_inputs=None):
        # re-designation invalidates every compiled function: a cached jit
        # executable keyed only on feed shapes would silently keep training
        # the OLD loss / skip a newly-designated error node
        self._step_fn = None
        self._step_raw = None
        self._loss_fn = None
        self._predict_fns = {}
        self._dilated_fns = {}
        self.input_node = input_node
        self.target_node = target_node
        self.loss_node = loss_node
        self.prediction_node = prediction_node
        self.prediction_ext_node = prediction_ext_node
        self.error_node = error_node
        self.debug_outputs = debug_outputs or []
        self.extra_inputs = extra_inputs or []
        self.gm.designations = {
            k: (v.name if v is not None else None) for k, v in [
                ("input_node", input_node), ("target_node", target_node),
                ("loss_node", loss_node), ("prediction_node", prediction_node),
                ("prediction_ext_node", prediction_ext_node),
                ("error_node", error_node)]}
        self.gm.designations["debug_outputs"] = [n.name for n in
                                                 self.debug_outputs]
        self.gm.designations["extra_inputs"] = [n.name for n in
                                                self.extra_inputs]
        return self

    # --------------------------------------------------------------- plumbing
    def set_dilated_impl(self, impl="direct", zfold=False, ztap=False,
                         zmajor=False, poolslice=False, pallas_tail=False):
        """Choose the dilated-op lowering for the dense path: 'direct'
        (rhs_dilation), 's2b' (per-op space-to-batch) or 's2bg' (GLOBAL
        space-to-batch: one split at the dilation plateau, undilated tail,
        one merge) — all exactly equivalent; which is faster is
        hardware/XLA-version dependent, bench A/Bs them.

        ``zfold``: lower kz=1 convs (+their fused pool/activation) as 2D
        convs with z folded into the conv batch dim — XLA's Cin-small 3D
        conv lowering is pathological (docs/tpu_performance.md r2 study:
        conv0 alone ~24 ms device time for 0.2%% of the FLOPs; the z-fold
        form measured 2.4x faster in isolation). Exactly equivalent
        (tests); composes with every impl.

        ``ztap``: lower kz>1 convs as a float32-accumulated sum of kz
        z-shifted 2D convs (z folded into the conv batch dim) — the tail
        convs past the s2bg split hold ~92%% of the sweep FLOPs and the
        z-tap form measured 15%% faster there than the lax 3D conv
        (scripts/exp_tail_conv.py, v5e). Equivalent up to float sum
        reassociation (~1e-6 relative in f32; locked by tests); composes
        with 'direct'/'s2bg' and with ``zfold`` (which covers the kz=1
        convs).

        ``zmajor``: keep internal dense-path activations in z-major layout
        (B, Z, C, X, Y) so every zfold/ztap fold is a FREE reshape instead
        of a transpose (z-slices are contiguous); one transpose in at the
        input, one out at the (few-channel) prediction map. Implies the
        folded lowerings for every conv (``ztap`` picks the kz>1 variant;
        defaults to 'native'). Equivalent up to float reassociation
        (tests).

        ``poolslice``: lower stride-1 dilated max-pools as shifted-slice
        elementwise maximums instead of ``lax.reduce_window`` — exactly
        equivalent (max is max; tests); which is faster is XLA-version
        dependent (the slice form can fuse into neighbouring elementwise
        ops where reduce_window cannot).

        ``pallas_tail``: run eligible tail convs (kernel (3,3,3), z-dil 1,
        no fused pool/BN, relu, f32) through the hand-written Pallas MXU
        kernel ``ops/pallas_tailconv.py`` (ring-buffered slab DMA, ky
        weight blocks M-stacked to fill the 128-row MXU dim, fused
        bias+relu; consecutive eligible convs chain in the kernel's native
        layout with no transposes between them). Applies in the dilated
        domain (impl 'direct'; ignored in phase space / s2b / zmajor /
        quantised / bf16 modes — those fall back per conv). Exactly
        equivalent up to float reassociation (tests)."""
        if impl not in ("direct", "s2b", "s2bg"):
            raise ValueError(f"impl={impl!r}: expected 'direct', 's2b' "
                             "or 's2bg'")
        if ztap not in (False, True, "native", "f32", "concat", "conv3d",
                        "fatn"):
            raise ValueError(f"ztap={ztap!r}: expected bool, 'native', "
                             "'f32', 'concat', 'conv3d' or 'fatn' "
                             "('conv3d'/'fatn' require zmajor=True)")
        if ztap in ("conv3d", "fatn") and not zmajor:
            # without zmajor the non-folded path runs conv_ztap, whose
            # accum dispatch knows only 'concat'/'f32' and silently falls
            # back to the native tap loop — the user would benchmark a
            # different lowering than requested (review r2)
            raise ValueError(f"ztap={ztap!r} requires zmajor=True")
        if (ztap or zmajor) \
                and getattr(self, "_compute_dtype", None) == "int8":
            raise ValueError("ztap/zmajor lowerings are not available in "
                             "int8 serving mode (set_compute_dtype)")
        self._dilated_impl = impl
        self._dilated_zfold = bool(zfold)
        self._dilated_ztap = ztap
        self._dilated_zmajor = bool(zmajor)
        self._dilated_poolslice = bool(poolslice)
        # pallas_tail: False/True, or a dict of kernel tuning knobs
        # ({"variant": "mstack"|"mstack3"|"kfuse"|"tap9", "z_block": int})
        if isinstance(pallas_tail, dict):
            self._dilated_ptail = dict(pallas_tail)
        else:
            self._dilated_ptail = bool(pallas_tail)
        # the lowering is baked into the traced program: drop cached jits
        self._dilated_fns = {}
        return self

    def set_convdense_impl(self, upconv="dilate", zfold=False, ptail=False,
                           poolslice=False, skipsum=False):
        """Choose op lowerings for the CONVOLUTIONAL dense path (decoder /
        U-Net graphs, ``inference.py::convolutional_dense_forward``) — the
        conv-dense sibling of ``set_dilated_impl``.

        ``upconv``: 'dilate' (lhs_dilation transposed conv, the default)
        or 'd2s' (1×1 conv + depth-to-space, ``ops.conv.upconv_d2s``) —
        bit-identical on v5e; d2s measured 82.2 → 64.9 ms at the unet3d
        decoder's whole-volume shape (scripts/exp_convdense_ops.py).

        ``zfold``: lower kz=1 convs as 2D convs with z folded into the
        conv batch dim (``ops.conv.conv_zfold2d``) — exactly equivalent;
        measured ~1.6× at whole-volume shapes. 3D graphs only (ignored
        for 2D).

        ``ptail``: route eligible (3,3,3) relu Convs through the Pallas
        MXU tail-conv kernel (``ops.pallas_tailconv.conv3x3_dilated`` at
        dil=(1,1,1)) — the decoder siblings of the dilated path's
        ``set_dilated_impl(pallas_tail=...)``. Eligible: 3D graphs, f32
        serving (int8/bf16 traces keep the XLA convs), no BN, relu
        activation; max-pooled Convs are eligible (the kernel's fused
        relu commutes exactly with max pooling). ``True`` or a dict of
        kernel knobs (``variant``/``z_block``/``prefetch``). Exact at
        float-reassociation level (tests).

        All knobs affect the whole-volume conv-dense trace only;
        training, patch predict and the tiled fallback keep the default
        lowerings.
        """
        if upconv not in ("dilate", "d2s"):
            raise ValueError(f"upconv={upconv!r}: expected 'dilate' "
                             "or 'd2s'")
        self._convdense_upconv = upconv
        self._convdense_zfold = bool(zfold)
        self._convdense_ptail = (dict(ptail) if isinstance(ptail, dict)
                                 else bool(ptail))
        # r5 wide-graph glue knobs (VERDICT r4 #1), both exactly
        # equivalent lowerings:
        # ``poolslice``: non-overlapping max/avg pools as elementwise
        # maxima of shifted strided slices instead of reduce_window
        # (ops.conv.pooling_slices) — the profile showed reduce_window
        # lowering to select/pad kLoop fusions + layout copies;
        # ``skipsum``: a Conv fed by a FaithlessMerge computes
        # conv(concat(a, b)) as conv(a, w[:, :Ca]) + conv(b, w[:, Ca:])
        # so the skip concat is never materialised (the wide profile
        # showed the concat lowering as pad_maximum fusions + copies).
        self._convdense_poolslice = bool(poolslice)
        self._convdense_skipsum = bool(skipsum)
        self._dilated_fns = {}    # conv-dense jits live in this cache
        return self

    def set_train_lowering(self, zfold=False, skipsum=False):
        """Exactly-equivalent op lowerings for the NODE trace (training
        and patch predict) — the training-side siblings of
        ``set_convdense_impl`` (r5, VERDICT r4 #2):

        ``zfold``: kz=1 3D convs as 2D convs with z folded into the
        conv batch dim;
        ``skipsum``: a Conv fed by a FaithlessMerge computes
        ``conv(concat(a, b))`` as ``conv(a, w[:, :Ca]) + conv(b,
        w[:, Ca:])`` — the skip concat never materialises. (Under
        ``set_remat`` the skipsum hook steps aside so rematerialisation
        stays whole-node.)

        Measured on the wide U-Net train chunk (scripts/exp_wide_train
        .py); serving paths have their own knobs. Invalidates compiled
        step/loss functions."""
        self._train_zfold = bool(zfold)
        self._train_skipsum = bool(skipsum)
        self._step_fn = None
        self._loss_fn = None
        self._predict_fns = {}
        return self

    def set_remat(self, enabled=True):
        """Rematerialisation: recompute each node's activations in the
        backward pass instead of storing them (``jax.checkpoint``) — trades
        FLOPs for HBM, enabling larger training patches per chip. Applies
        per non-trivial node at the next (re)compile."""
        self._remat = bool(enabled)
        self._step_fn = None
        self._loss_fn = None
        return self

    def set_compute_dtype(self, dtype, activations=False):
        """Mixed precision: 'bfloat16' runs conv/dot operands in bf16 with
        f32 accumulation (MXU-native); None restores full f32. Invalidates
        compiled functions.

        ``activations=True`` additionally STORES the dense-path activations
        in ``dtype`` between layers, halving inter-layer HBM traffic.
        Deviation from the default is ONE extra rounding per layer — the
        f32 epilogue (bias/BN/activation, still evaluated in f32) is
        rounded to ``dtype`` before the store instead of being consumed at
        f32 precision by pool/softmax/merge stages. Measured ≤1.5e-3 on
        softmax outputs on-chip (vs the bf16 mode's 0.019 vs f32); bound
        locked at 5e-3 by tests. Dense/serving path only; training keeps
        f32 activations.

        ``'int8'``: QUANTIZED dense serving — per-output-channel weight
        quant + dynamic per-tensor activation quant, int8×int8 MXU with
        int32 accumulation (``ops.conv.quantized_conv``; 2× the bf16 MXU
        peak on v5e). Applies to the WHOLE-VOLUME dense paths: dilated
        ('direct'/'s2bg', ``zfold`` ok; ztap/zmajor cross-guarded) and
        convolutional (decoder/U-Net graphs). Training, patch predict
        and the overlap-TILED fallback keep f32 (quantised backprop is
        out of scope; per-tile dynamic scales would seam a stitched
        output). Accuracy is distribution-grade — bounds locked by tests
        and PARITY.md, alongside the bf16 serving mode.

        ``'int8'`` + ``activations=True`` stores the dilated dense path's
        inter-layer activations in **bfloat16** (epilogues and softmax
        still evaluate in f32; convs still quantise to int8 on the MXU).
        Without it the int8 program's inter-layer buffers are full f32 —
        WIDER than the bf16 serving mode's — which is what pushed the
        96-z champion slab 216 MB past v5e HBM (measured OOM, r2 s6).
        Accuracy cost is one bf16 rounding (~2^-8 relative) on values the
        int8 re-quantisation is about to step at ~1/127 granularity —
        bound locked by tests next to the plain-int8 bound."""
        if dtype not in (None, "bfloat16", "float16", "float32", "int8"):
            raise ValueError(f"dtype={dtype!r}: expected None, 'bfloat16',"
                             " 'float16', 'float32' or 'int8'")
        if dtype == "int8":
            if getattr(self, "_dilated_ztap", False) \
                    or getattr(self, "_dilated_zmajor", False):
                raise ValueError(
                    "int8 serving supports the 'direct'/'s2bg' lowerings "
                    "(+zfold); disable ztap/zmajor first "
                    "(set_dilated_impl)")
        self._compute_dtype = dtype
        self._compute_act = bool(activations) and dtype is not None
        self._quant_scales = None     # int8 calibration: re-calibrate
        self._step_fn = None          # after changing the dtype
        self._loss_fn = None
        self._predict_fns = {}
        self._dilated_fns = {}
        return self

    def calibrate_int8(self, vol):
        """Record per-conv activation scales from a calibration volume
        ((f, Z, X, Y) or (b, f, …) array) for int8 dense serving.

        Without calibration the int8 path uses dynamic per-dispatch
        scales: each ``sweep_knossos`` slab then quantises independently,
        which steps values slightly at slab faces (review r2 s5). With
        STATIC calibrated scales the quantisation is slab-grid- and
        shard-invariant by construction — sweep outputs equal the
        whole-volume int8 sweep exactly (tests). Call AFTER
        ``set_compute_dtype('int8')`` (changing the dtype clears the
        calibration); activations beyond a calibrated max clip at ±127
        (standard post-training quantisation). ``sweep_knossos``
        auto-calibrates on its first slab when scales are absent."""
        import jax.numpy as jnp
        from elektronn2_tpu.neuromancer.inference import (
            dilated_dense_forward)
        if getattr(self, "_compute_dtype", None) != "int8":
            raise ValueError("calibrate_int8 requires "
                             "set_compute_dtype('int8') first")
        from elektronn2_tpu.neuromancer.inference import (
            UnsupportedGraphError, convolutional_dense_forward)
        nsp = len(self.input_node.shape.spatial_axes)
        vol = jnp.asarray(vol, jnp.float32)
        if vol.ndim not in (nsp + 1, nsp + 2):
            raise ValueError(f"calibration volume rank {vol.ndim} does "
                             f"not match the {nsp}-D graph")
        scales = {}
        try:
            dilated_dense_forward(self, vol, batch=(vol.ndim == nsp + 2),
                                  params=self.params, state=self.state,
                                  quant_calibrate=scales)
        except (UnsupportedGraphError, ValueError):
            # decoder (U-Net) graphs live outside the dilated path —
            # calibrate through the whole-volume convolutional trace
            # instead (same conv-input maxima; review r2 s5: without
            # this leg U-Net int8 sweeps were stuck on per-slab dynamic
            # scales, i.e. slab-face seams)
            scales = {}
            v = vol[0] if vol.ndim == nsp + 2 else vol
            convolutional_dense_forward(self, v, params=self.params,
                                        state=self.state, pad_raw=True,
                                        quant_calibrate=scales)
        if not scales:
            raise ValueError("calibration pass reached no Conv nodes")
        self._quant_scales = scales
        self._dilated_fns = {}        # bake the constants into new traces
        return dict(scales)

    def _apply(self, out_nodes, params, state, feed, rng, train):
        ctx = TraceCtx(params, feed, rng, train=train, state_in=state,
                       node_index=self._node_index,
                       compute_dtype=getattr(self, "_compute_dtype", None))
        ctx.remat = bool(getattr(self, "_remat", False)) and train
        # r5 node-trace lowerings (set_train_lowering): the wide-graph
        # TRAINING profile shows the same glue families the serving
        # harvest removed (skip-concat pad/maximum fusions, kz=1 conv
        # layout copies) — the ctx flags reuse the conv-dense names the
        # node code already consults. Exactly equivalent lowerings;
        # autodiff flows through both (plain jnp ops).
        if getattr(self, "_train_zfold", False):
            ctx.convdense_zfold = True
        if getattr(self, "_train_skipsum", False):
            ctx.convdense_skipsum = True
        outs = [ctx.get(n) for n in out_nodes]
        new_state = dict(state)
        new_state.update(ctx.state_out)
        return outs, new_state

    def _feed(self, data, target=None, extra=None, overrides=None):
        if isinstance(data, dict):
            # explicit feed dict: validate names early (otherwise a bad key
            # surfaces as an opaque AttributeError deep in the trace)
            known = {self.input_node.name}
            known |= {n.name for n in self.extra_inputs}
            if self.target_node is not None:
                known.add(self.target_node.name)
            unknown = set(data) - known
            if unknown:
                raise KeyError(
                    f"unknown feed name(s) {sorted(unknown)}; this model's "
                    f"input names are {sorted(known)}")
            feed = dict(data)
        else:
            feed = {self.input_node.name: data}
        if target is not None and self.target_node is not None:
            feed[self.target_node.name] = target
        for node, val in zip(self.extra_inputs, extra or []):
            feed[node.name] = val
        if overrides:
            feed.update(overrides)
        return feed

    def seed(self, n):
        """Reset the model's PRNG stream (dropout/sampling reproducibility)."""
        self._rng_key = jax.random.PRNGKey(int(n))
        return self

    def _next_rng(self):
        self._rng_key, sub = jax.random.split(self._rng_key)
        return sub

    # --------------------------------------------------------------- training
    def set_opt(self, optimiser="Adam", **hyperparams):
        """Attach an optimiser (name or instance). Reference: Model/Trainer
        optimiser setup."""
        if isinstance(optimiser, Optimiser):
            self.optimiser = optimiser
        else:
            self.optimiser = get_optimiser(optimiser)(**hyperparams)
        self.opt_state = self.optimiser.init_state(self._trainable(self.params))
        self._lr_mults = self._mult_tree("lr_mult")
        self._wd_mults = self._mult_tree("wd_mult")
        self._step_fn = None
        return self.optimiser

    def _trainable(self, params):
        out = {}
        for nname, pdict in params.items():
            node = self.nodes[nname]
            sub = {p: v for p, v in pdict.items()
                   if node.param_flags[p]["trainable"]}
            if sub:
                out[nname] = sub
        return out

    def _mult_tree(self, key):
        out = {}
        for nname, pdict in self._trainable(self.params).items():
            node = self.nodes[nname]
            out[nname] = {p: node.param_flags[p][key] for p in pdict}
        return out

    def _build_step(self):
        if self.loss_node is None:
            raise RuntimeError("designate a loss_node before training")
        if self.optimiser is None:
            self.set_opt("Adam")
        aux_nodes = []
        if self.error_node is not None:
            aux_nodes.append(self.error_node)
        aux_nodes += self.debug_outputs
        opt = self.optimiser
        lr_mults, wd_mults = self._lr_mults, self._wd_mults

        def step(params, opt_state, state, feed, rng, hyper):
            def loss_fn(train_params):
                merged = {n: {**params.get(n, {}), **train_params.get(n, {})}
                          for n in set(params) | set(train_params)}
                outs, new_state = self._apply(
                    [self.loss_node] + aux_nodes, merged, state, feed, rng,
                    train=True)
                return outs[0][0], (outs[1:], new_state)

            train_params = self._trainable(params)
            (loss_v, (aux, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(train_params)
            gnorm = jnp.sqrt(sum(
                jnp.sum(jnp.square(g))
                for g in jax.tree_util.tree_leaves(grads)))
            new_train, new_opt_state = opt.update(
                train_params, grads, opt_state, hyper, lr_mults, wd_mults)
            new_params = {n: {**params.get(n, {}), **new_train.get(n, {})}
                          for n in set(params) | set(new_train)}
            return loss_v, aux, gnorm, new_params, new_opt_state, new_state

        self._step_raw = step
        if getattr(self, "_mesh", None) is not None:
            self._jit_sharded_step()
        else:
            self._step_fn = jax.jit(step, donate_argnums=(0, 1))

    # ------------------------------------------------------------- scale-out
    def use_mesh(self, mesh, data_axis="data", model_axis=None):
        """Enable data-parallel (and optionally tensor-parallel) training
        over a device mesh.

        The batch is sharded along ``data_axis``. With ``model_axis`` set,
        weight tensors of Conv/UpConv/Dot/Perceptron nodes are additionally
        sharded over their output-feature dimension on that axis (GSPMD
        tensor parallelism — per-rank weight/optimiser-state memory and
        matmul work shrink by the axis size); XLA propagates the sharding
        through activations and inserts the collectives. Params whose
        feature count doesn't divide the axis stay replicated. XLA likewise
        derives the gradient ``psum`` from the batch sharding (SURVEY.md
        §3.7 — the TPU-native communication backend). The reference has no
        distributed training; this is the pod-scale path named in
        BASELINE.json's configs.
        """
        self._mesh = mesh
        self._data_axis = data_axis
        self._model_axis = model_axis
        psh = self._param_shardings()
        self.params = jax.device_put(self.params, psh)
        self.state = jax.device_put(self.state, self._repl_sharding())
        if self.opt_state is not None:
            self.opt_state = jax.device_put(self.opt_state,
                                            self._opt_shardings())
        if getattr(self, "_step_raw", None) is None:
            self._build_step()
        else:
            self._jit_sharded_step()
        self._predict_fns = {}
        self._dilated_fns = {}
        self._loss_fn = None
        return self

    def _repl_sharding(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        return NamedSharding(self._mesh, P())

    def _param_shardings(self):
        """Per-param NamedSharding tree: output-feature dim sharded on the
        model axis for weight-bearing nodes (when divisible), else
        replicated."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh, ax = self._mesh, getattr(self, "_model_axis", None)
        repl = NamedSharding(mesh, P())
        # output-feature dim per weight layout: Conv/UpConv w is
        # (f_out, f_in, *k) → dim 0; Perceptron (alias Dot) w is
        # (f_in, n_f) → dim 1 (the LAST dim); biases are (f_out,) → dim 0
        tp_w_dim = {"Conv": 0, "UpConv": 0, "Perceptron": 1}
        out = {}
        for nname, pdict in self.params.items():
            node = self.nodes.get(nname)
            tname = type(node).__name__ if node is not None else None
            out[nname] = {}
            for pname, v in pdict.items():
                sh = repl
                dim = None
                if ax is not None and tname in tp_w_dim:
                    if pname == "w" and v.ndim >= 2:
                        dim = tp_w_dim[tname]
                    elif pname == "b" and v.ndim == 1:
                        dim = 0
                if dim is not None and v.shape[dim] % mesh.shape[ax] == 0:
                    spec = [None] * v.ndim
                    spec[dim] = ax
                    sh = NamedSharding(mesh, P(*spec))
                out[nname][pname] = sh
        return out

    def _opt_shardings(self):
        """Sharding tree congruent to opt_state: slot entries matching a
        (node, param) leaf inherit that param's sharding."""
        from jax.tree_util import tree_map_with_path
        psh = self._param_shardings()
        repl = self._repl_sharding()

        def pick(path, leaf):
            keys = [getattr(p, "key", None) for p in path]
            for i in range(len(keys) - 1):
                n, p = keys[i], keys[i + 1]
                if (n in psh and p in psh.get(n, {})
                        and tuple(self.params[n][p].shape)
                        == tuple(leaf.shape)):
                    return psh[n][p]
            return repl

        return tree_map_with_path(pick, self.opt_state)

    def _jit_sharded_step(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = self._mesh
        repl = NamedSharding(mesh, P())
        batch = NamedSharding(mesh, P(self._data_axis))

        # in_shardings per arg: params, opt_state, state, feed, rng, hyper;
        # outputs pinned to the same shardings so donated buffers round-trip
        psh, osh = self._param_shardings(), self._opt_shardings()
        self._step_fn = jax.jit(
            self._step_raw, donate_argnums=(0, 1),
            in_shardings=(psh, osh, repl, None, repl, repl),
            out_shardings=(repl, repl, repl, psh, osh, repl))
        self._feed_sharding = batch

    def _shard_batch(self, feed):
        if getattr(self, "_mesh", None) is None:
            return feed
        return {k: jax.device_put(jnp.asarray(v), self._feed_sharding)
                for k, v in feed.items()}

    def trainingstep(self, data, target=None, extra=None,
                     feed_overrides=None):
        """One fused fwd+bwd+update step. Returns (loss, aux_dict).

        aux_dict holds 'error' (if an error node is designated), per-debug
        outputs, and 'gradnorm'. ``feed_overrides`` injects values for
        non-input nodes that accept feeding (e.g. InitialState_like for
        truncated-BPTT state carry). Reference: ``Model.trainingstep``.
        """
        if self._step_fn is None:
            self._build_step()
        feed = self._shard_batch(self._feed(data, target, extra,
                                            feed_overrides))
        hyper = self.optimiser.current_hyper()
        loss_v, aux, gnorm, self.params, self.opt_state, self.state = \
            self._step_fn(self.params, self.opt_state, self.state, feed,
                          self._next_rng(), hyper)
        self._step_count += 1
        aux_dict = {"gradnorm": gnorm}
        i = 0
        if self.error_node is not None:
            aux_dict["error"] = aux[0][0]
            i = 1
        for node, v in zip(self.debug_outputs, aux[i:]):
            aux_dict[node.name] = v
        return loss_v, aux_dict

    def loss(self, data, target=None, extra=None):
        """Evaluate the scalar loss without updating (eval mode)."""
        if self._loss_fn is None:
            def f(params, state, feed):
                outs, _ = self._apply([self.loss_node], params, state, feed,
                                      None, train=False)
                return outs[0][0]
            self._loss_fn = jax.jit(f)
        return self._loss_fn(self.params, self.state,
                             self._feed(data, target, extra))

    def test_error(self, data, target, extra=None):
        """Loss + error rate in eval mode (validation)."""
        nodes = [self.loss_node]
        if self.error_node is not None:
            nodes.append(self.error_node)
        key = "test_error"
        if key not in self._predict_fns:
            def f(params, state, feed):
                outs, _ = self._apply(nodes, params, state, feed, None,
                                      train=False)
                return [o[0] for o in outs]
            self._predict_fns[key] = jax.jit(f)
        outs = self._predict_fns[key](self.params, self.state,
                                      self._feed(data, target, extra))
        return (outs[0], outs[1]) if len(outs) > 1 else (outs[0], None)

    # -------------------------------------------------------------- inference
    def _get_predict_fn(self, node, dense):
        key = (node.name, dense)
        if key not in self._predict_fns:
            from elektronn2_tpu.ops.mfp import fragments2dense

            def f(params, state, feed):
                outs, _ = self._apply([node], params, state, feed, None,
                                      train=False)
                y = outs[0]
                if dense and node.shape.n_frag > 1:
                    y = fragments2dense(y, node.shape.mfp_offsets)
                return y
            self._predict_fns[key] = jax.jit(f)
        return self._predict_fns[key]

    def get_activations(self, data, nodes, target=None, extra=None,
                        train=False):
        """Evaluate arbitrary graph nodes on a batch (debugging/inspection).

        ``nodes``: node objects or names. Returns {name: array}. Eval mode
        by default (no dropout; BN running stats).
        """
        nodes = [self.nodes[n] if isinstance(n, str) else n for n in nodes]
        feed = self._feed(data, target, extra)
        outs, _ = self._apply(nodes, self.params, self.state, feed,
                              self._next_rng() if train else None, train)
        return {n.name: o for n, o in zip(nodes, outs)}

    def predict(self, raw, extra=None):
        """Forward pass to the prediction node (eval mode, no stitching)."""
        node = self.prediction_node
        fn = self._get_predict_fn(node, dense=False)
        return fn(self.params, self.state, self._feed(raw, extra=extra))

    def predict_ext(self, raw, extra=None):
        node = self.prediction_ext_node or self.prediction_node
        fn = self._get_predict_fn(node, dense=False)
        return fn(self.params, self.state, self._feed(raw, extra=extra))

    def predict_dense(self, raw_img, pad_raw=False, as_uint8=False,
                      tile_batch=1, verbose=False, prefer_device=True,
                      device_budget=4 << 30):
        """MFP dense prediction over an arbitrarily large volume.

        Reference: ``node_basic.py::Node.predict_dense`` (see SURVEY.md §4.B).
        Device-fitting volumes route through the fused dilated /
        whole-volume convolutional paths; larger ones use the overlap-tiled
        sweep with on-device fragment restitching.
        """
        from elektronn2_tpu.neuromancer.inference import predict_dense
        return predict_dense(self, raw_img, pad_raw=pad_raw,
                             as_uint8=as_uint8, tile_batch=tile_batch,
                             verbose=verbose, prefer_device=prefer_device,
                             device_budget=device_budget)

    def predict_dense_device(self, vol, pad_raw=False, tile_batch=1):
        """Device-resident dense sweep: (f, Z, X, Y) jnp array in HBM in,
        dense map out, no host round-trips (production serving path)."""
        from elektronn2_tpu.neuromancer.inference import predict_dense_device
        return predict_dense_device(self, vol, pad_raw=pad_raw,
                                    tile_batch=tile_batch)

    def predict_dense_sharded(self, vol, mesh, axis_name="space",
                              pad_raw=False):
        """Spatial-CP dense sweep over a device mesh (halo exchange)."""
        from elektronn2_tpu.neuromancer.inference import predict_dense_sharded
        return predict_dense_sharded(self, vol, mesh, axis_name=axis_name,
                                     pad_raw=pad_raw)

    def predict_dense_sharded_batch(self, vols, mesh, axis_name="space",
                                    batch_axis="data"):
        """DP×SP dense serving: slab batch over ``batch_axis``, each
        slab's z extent over ``axis_name`` (halo exchange)."""
        from elektronn2_tpu.neuromancer.inference import (
            predict_dense_sharded_batch)
        return predict_dense_sharded_batch(self, vols, mesh,
                                           axis_name=axis_name,
                                           batch_axis=batch_axis)

    def sweep_knossos(self, karr, region=None, step=None, out=None,
                      verbose=False, mesh=None, axis_name="space",
                      slab_batch=1, batch_axis="data"):
        """Dense-predict a whole KNOSSOS dataset, slab by staged slab
        (optionally z-sharded over a mesh — pod-scale serving; or
        ``slab_batch`` slabs per dispatch with overlapped readback;
        both composed when mesh AND slab_batch are set: DP×SP)."""
        from elektronn2_tpu.neuromancer.inference import sweep_knossos
        return sweep_knossos(self, karr, region=region, step=step, out=out,
                             verbose=verbose, mesh=mesh,
                             axis_name=axis_name, slab_batch=slab_batch,
                             batch_axis=batch_axis)

    def tune_serving(self, steps=None, slab_batches=(1, 2), K=4,
                     include_bf16=True, include_int8=True, apply=True,
                     verbose=True):
        """Autotune the dense-serving configuration on the live device:
        measures the equivalent dilated lowerings × dtype (f32 / bf16 /
        int8-quantised) × slab size × slab batch with the
        sustained-dispatch protocol and (by default) applies the winner.
        Pass ``include_bf16=False, include_int8=False`` to restrict to
        parity-grade f32 lowerings. Returns ``{"best": ..., "table":
        ...}`` — feed ``best["step"]``/``best["slab_batch"]`` to
        ``sweep_knossos``."""
        from elektronn2_tpu.neuromancer.inference import tune_sweep
        return tune_sweep(self, steps=steps, slab_batches=slab_batches,
                          K=K, include_bf16=include_bf16,
                          include_int8=include_int8, apply=apply,
                          verbose=verbose)

    # ------------------------------------------------------------------ stats
    @property
    def param_count(self):
        return sum(int(np.prod(v.shape))
                   for nd in self.params.values() for v in nd.values())

    @property
    def kernel_lists(self):
        """``(filter_shapes, pool_shapes, mfp_flags)`` of the Conv chain
        under the prediction/loss node, in graph topological order — the
        triplet :func:`utils.cnncalculator.cnncalculator` consumes.
        Reference: ``model.py::kernel_lists``."""
        from elektronn2_tpu.neuromancer import neural
        root = self.prediction_node or self.loss_node
        order = (root.all_parents() if root is not None    # includes root
                 else list(self.nodes.values()))
        filters, pools, mfps = [], [], []
        for node in order:
            if isinstance(node, neural.Conv):
                filters.append(list(node.filter_shape))
                pools.append(list(node.pool_shape))
                mfps.append(bool(node.mfp))
        return filters, pools, mfps

    # ------------------------------------------------------- blowup recovery
    def snapshot_good(self):
        """Record the current params / optimiser / aux state as known-good
        (ON-DEVICE copies — one jitted dispatch, no device→host transfer:
        the Trainer calls this at every finite sync point / fused-chunk
        boundary, and a host readback of the whole param+opt tree there
        would tax the training loop with D2H bandwidth for a snapshot
        that is usually thrown away). :meth:`repair_fuckup` restores it."""
        self._good = (_tree_device_copy(self.params),
                      _tree_device_copy(self.opt_state),
                      _tree_device_copy(self.state))

    def repair_fuckup(self, lr_scale=None):
        """Roll back to the last :meth:`snapshot_good` after a training
        blowup (non-finite loss / exploded params).

        Reference: ``optimiser.py::repair_fuckup``. Restores params,
        optimiser slots (incl. step counter) and aux state; ``lr_scale``
        optionally multiplies the live learning rate (e.g. ``0.5`` to back
        off after the rollback — a mutation, no recompile). Returns True
        if a snapshot existed and was restored."""
        good = getattr(self, "_good", None)
        if good is None:
            return False
        p, o, s = good
        # restore COPIES: the restored arrays get donated to the next
        # trainingstep, and the snapshot must survive a second blowup
        # before the next finite sync point refreshes it
        self.params = _tree_device_copy(p)
        self.opt_state = _tree_device_copy(o)
        self.state = _tree_device_copy(s)
        if self._mesh is not None:
            # re-commit the mesh shardings (no-op for device snapshots,
            # which keep their shardings; load-bearing if a caller stuffed
            # host arrays into _good)
            self.params = jax.device_put(self.params,
                                         self._param_shardings())
            self.state = jax.device_put(self.state, self._repl_sharding())
            if self.opt_state is not None:
                self.opt_state = jax.device_put(self.opt_state,
                                                self._opt_shardings())
        if lr_scale is not None and self.optimiser is not None:
            self.optimiser.setlr(float(self.optimiser.hyperparams["lr"])
                                 * float(lr_scale))
        return True

    def paramstats(self):
        """Per-node parameter norm/min/max (reference: Model.paramstats)."""
        stats = {}
        for nname, pdict in self.params.items():
            for pname, v in pdict.items():
                a = np.asarray(v)
                stats[f"{nname}/{pname}"] = {
                    "shape": tuple(a.shape),
                    "mean": float(a.mean()), "std": float(a.std()),
                    "min": float(a.min()), "max": float(a.max())}
        return stats

    def measure_exectimes(self, data, target=None, n_warmup=2, n_runs=5):
        """Rough per-node forward timings (reference:
        ``Model.measure_exectimes`` via Theano profiling; here: incremental
        jitted subgraph timing — time(node) includes its ancestors)."""
        feed = self._feed(data, target)
        times = {}
        order = self.loss_node.all_parents() if self.loss_node \
            else list(self.nodes.values())
        for node in order:
            if isinstance(node, Input):
                continue
            try:
                fn = self._get_predict_fn(node, dense=False)
                for _ in range(n_warmup):
                    jax.block_until_ready(fn(self.params, self.state, feed))
                t0 = time.perf_counter()
                for _ in range(n_runs):
                    jax.block_until_ready(fn(self.params, self.state, feed))
                times[node.name] = (time.perf_counter() - t0) / n_runs
            except KeyError:
                continue  # node needs feeds not provided
        return times

    # ---------------------------------------------------------------- save/load
    def save(self, fname, backend="npz"):
        """Serialise spec + params (+ optimiser & aux state).

        ``backend='npz'`` (default): one ``.npz`` file containing a JSON
        node-spec (GraphManager contract: loading replays constructors) and
        flat host arrays. Reference: ``Model.save`` (pickle → here
        JSON+npz, SURVEY.md do-not-mirror).

        ``backend='orbax'``: a checkpoint DIRECTORY written through orbax —
        sharded arrays are saved shard-by-shard from their owning devices
        (no host gather), which is the multi-host / tensor-parallel path:
        every process calls save() collectively.
        """
        if backend == "orbax":
            return self._save_orbax(fname)
        if backend != "npz":
            raise ValueError(f"backend={backend!r}: expected 'npz' "
                             "or 'orbax'")
        spec_json, arg_arrays = self.gm.spec_json()
        payload = {"__spec__": np.frombuffer(spec_json.encode(), np.uint8)}
        for k, v in arg_arrays.items():
            payload[k] = v
        for nname, pdict in self.params.items():
            for pname, v in pdict.items():
                payload[f"param/{nname}/{pname}"] = np.asarray(v)
        for nname, st in self.state.items():
            # aux state entries are flat dicts name->array (e.g. BN mean/var)
            for k, v in st.items():
                payload[f"state/{nname}/{k}"] = np.asarray(v)
        if self.optimiser is not None:
            payload["__opt__"] = np.frombuffer(
                json.dumps(self._opt_meta()).encode(), np.uint8)
            leaves = jax.tree_util.tree_leaves(self.opt_state)
            for i, v in enumerate(leaves):
                payload[f"opt/{i}"] = np.asarray(v)
        buf = io.BytesIO()
        np.savez_compressed(buf, **payload)
        with open(fname, "wb") as f:
            f.write(buf.getvalue())
        logger.info(f"saved model to {fname} "
                    f"({self.param_count} params)")

    def _opt_meta(self):
        if self.optimiser is None:
            return None
        return {"cls": type(self.optimiser).__name__,
                "hyper": self.optimiser.hyperparams,
                "nesterov": bool(getattr(self.optimiser, "nesterov",
                                         False)),
                "step_count": self._step_count}

    def _save_orbax(self, dirname):
        import orbax.checkpoint as ocp
        spec_json, arg_arrays = self.gm.spec_json()
        dirname = os.path.abspath(dirname)
        tree = {"args": {k.replace("/", "|"): np.asarray(v)
                         for k, v in arg_arrays.items()},
                "params": self.params, "state": dict(self.state)}
        if self.optimiser is not None:
            tree["opt"] = list(jax.tree_util.tree_leaves(self.opt_state))
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.join(dirname, "arrays"), tree, force=True)
        meta = {"spec": json.loads(spec_json), "opt": self._opt_meta()}
        if jax.process_index() == 0:
            with open(os.path.join(dirname, "meta.json"), "w") as f:
                json.dump(meta, f)
        logger.info(f"saved orbax checkpoint to {dirname} "
                    f"({self.param_count} params)")

    def set_params(self, params):
        self.params = {n: {p: jnp.asarray(v) for p, v in d.items()}
                       for n, d in params.items()}

    def __repr__(self):
        return (f"<Model {self.name!r}: {len(self.nodes)} nodes, "
                f"{self.param_count} params>")

    def summary(self):
        lines = [f"Model {self.name!r}"]
        for node in self.nodes.values():
            mark = ""
            for attr in ("input_node", "target_node", "loss_node",
                         "prediction_node"):
                if getattr(self, attr) is node:
                    mark = f"  <- {attr}"
            lines.append(f"  {node!r}{mark}")
        return "\n".join(lines)


def modelload(fname, override_mfp_to_active=False, imposed_patch_size=None,
              **kwargs):
    """Load a model file by replaying its node spec.

    Reference: ``model.py::modelload``. Accepts both the ``.npz`` format
    and orbax checkpoint directories (``Model.save(..., backend='orbax')``).
    """
    if os.path.isdir(fname):
        import orbax.checkpoint as ocp
        with open(os.path.join(fname, "meta.json")) as f:
            meta = json.load(f)
        spec, opt_meta = meta["spec"], meta.get("opt")
        with ocp.StandardCheckpointer() as ckptr:
            tree = ckptr.restore(os.path.join(os.path.abspath(fname),
                                              "arrays"))
        arg_arrays = {k.replace("|", "/"): v
                      for k, v in tree.get("args", {}).items()}
        params = tree.get("params", {})
        state = {n: {k: jnp.asarray(v) for k, v in st.items()}
                 for n, st in tree.get("state", {}).items()}
        opt_leaves = dict(enumerate(tree.get("opt", []) or []))
    else:
        with np.load(fname, allow_pickle=False) as z:
            spec = json.loads(bytes(z["__spec__"].tobytes()).decode())
            arg_arrays = {k: z[k] for k in z.files
                          if k.startswith("__spec__/")}
            params, state, opt_leaves = {}, {}, {}
            for k in z.files:
                if k.startswith("param/"):
                    _, nname, pname = k.split("/", 2)
                    params.setdefault(nname, {})[pname] = z[k]
                elif k.startswith("state/"):
                    _, nname, sname = k.split("/", 2)
                    state.setdefault(nname, {})[sname] = jnp.asarray(z[k])
                elif k.startswith("opt/"):
                    opt_leaves[int(k.split("/")[1])] = z[k]
            opt_meta = (json.loads(bytes(z["__opt__"].tobytes()).decode())
                        if "__opt__" in z.files else None)
    gm = GraphManager.replay(spec["nodes"], arg_arrays)
    gm.designations = spec.get("designations", {})
    model = Model(gm, name=spec.get("graph", "model"))
    d = gm.designations

    def pick(key):
        n = d.get(key)
        return gm.nodes[n] if n else None

    model.designate_nodes(
        input_node=pick("input_node"), target_node=pick("target_node"),
        loss_node=pick("loss_node"), prediction_node=pick("prediction_node"),
        prediction_ext_node=pick("prediction_ext_node"),
        error_node=pick("error_node"),
        debug_outputs=[gm.nodes[n] for n in d.get("debug_outputs", [])],
        extra_inputs=[gm.nodes[n] for n in d.get("extra_inputs", [])])
    model.set_params(params)
    model.state = state
    if opt_meta is not None:
        model.set_opt(opt_meta["cls"], **opt_meta["hyper"])
        if opt_meta.get("nesterov"):
            model.optimiser.nesterov = True
        model._step_count = opt_meta.get("step_count", 0)
        if opt_leaves:
            init = model.opt_state
            leaves, treedef = jax.tree_util.tree_flatten(init)
            restored = [jnp.asarray(opt_leaves.get(i, l))
                        for i, l in enumerate(leaves)]
            model.opt_state = jax.tree_util.tree_unflatten(treedef, restored)
    if override_mfp_to_active or imposed_patch_size is not None:
        model = rebuild_model(model,
                              override_mfp_to_active=override_mfp_to_active,
                              imposed_patch_size=imposed_patch_size)
    logger.info(f"loaded model from {fname}: {model!r}")
    return model


def params_from_model_file(fname):
    """Extract just the parameter arrays from a model file (.npz or an
    orbax checkpoint directory — the same formats ``modelload`` accepts)."""
    if os.path.isdir(fname):
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            tree = ckptr.restore(os.path.join(os.path.abspath(fname),
                                              "arrays"))
        return {n: {p: np.asarray(v) for p, v in d.items()}
                for n, d in tree.get("params", {}).items()}
    params = {}
    with np.load(fname, allow_pickle=False) as z:
        for k in z.files:
            if k.startswith("param/"):
                _, nname, pname = k.split("/", 2)
                params.setdefault(nname, {})[pname] = z[k]
    return params


def kernel_lists(model):
    """Module-level alias of :attr:`Model.kernel_lists` —
    ``(filter_shapes, pool_shapes, mfp_flags)`` of the model's Conv chain,
    the triplet ``utils.cnncalculator.cnncalculator`` consumes.
    Reference: ``model.py::kernel_lists`` (a free function there)."""
    return model.kernel_lists


def rebuild_model(model, override_mfp_to_active=False,
                  imposed_patch_size=None):
    """Rebuild a model's graph from its own spec (e.g. to change patch size
    or activate MFP for inference). Reference: ``model.py::rebuild_model``.
    """
    def _input_fields(d):
        """(shape-list, tag-list) of an Input descriptor, normalising the
        {'__tuple__': [...]} encoding and string tags; writes back shape as
        a plain list so overrides round-trip through the decoder."""
        args = d["args"]
        shape = args[0] if args else d["kwargs"]["shape"]
        tags = args[1] if len(args) > 1 else d["kwargs"]["tags"]
        if isinstance(shape, dict) and "__tuple__" in shape:
            shape = list(shape["__tuple__"])
            if args:
                args[0] = shape
            else:
                d["kwargs"]["shape"] = shape
        if isinstance(tags, dict) and "__tuple__" in tags:
            tags = list(tags["__tuple__"])
        if isinstance(tags, str):
            tags = tags.split(",") if "," in tags else list(tags)
        return shape, tags

    def _set_spatial(d, sizes):
        shape, tags = _input_fields(d)
        sp_idx = [i for i, t in enumerate(tags) if t in ("z", "x", "y")]
        for i, ax in enumerate(sp_idx):
            shape[ax] = int(sizes[i])

    dd_old = model.gm.designations
    in_name = dd_old.get("input_node")
    tgt_name = dd_old.get("target_node")

    def _build(descriptors, arrays):
        gm = GraphManager.replay(descriptors, arrays)
        gm.designations = dict(dd_old)
        new = Model(gm, name=model.name)

        def pick(key):
            n = gm.designations.get(key)
            return gm.nodes[n] if n else None

        new.designate_nodes(
            input_node=pick("input_node"), target_node=pick("target_node"),
            loss_node=pick("loss_node"),
            prediction_node=pick("prediction_node"),
            prediction_ext_node=pick("prediction_ext_node"),
            error_node=pick("error_node"),
            debug_outputs=[gm.nodes[n] for n in
                           gm.designations.get("debug_outputs", [])],
            extra_inputs=[gm.nodes[n] for n in
                          gm.designations.get("extra_inputs", [])])
        return new

    descriptors, arrays = model.gm.get_descriptors()
    if imposed_patch_size is not None or override_mfp_to_active:
        for d in descriptors:
            # patch override applies ONLY to the designated data input —
            # the target Input's spatial dims are the network OUTPUT size
            # and get recomputed below
            if (d["cls"] == "Input" and imposed_patch_size is not None
                    and d["name"] == in_name):
                _set_spatial(d, imposed_patch_size)
            if override_mfp_to_active and d["cls"] in ("Conv", "Pool"):
                d["kwargs"]["mfp"] = True
    new = _build(descriptors, arrays)
    # second pass: resize the target Input to the new prediction geometry
    if tgt_name is not None and new.prediction_node is not None \
            and (imposed_patch_size is not None or override_mfp_to_active):
        pred_ts = new.prediction_node.shape
        tgt_node = new.nodes.get(tgt_name)
        if tgt_node is not None and (tuple(tgt_node.shape.spatial_shape)
                                     != tuple(pred_ts.spatial_shape)
                                     or tgt_node.shape["b"]
                                     != pred_ts["b"]):
            for d in descriptors:
                if d["name"] == tgt_name:
                    _set_spatial(d, pred_ts.spatial_shape)
                    shape, tags = _input_fields(d)
                    if "b" in tags:
                        shape[tags.index("b")] = int(pred_ts["b"])
            new = _build(descriptors, arrays)
    # copy over params and aux state where shapes still match — DEEP
    # copies: trainingstep donates its buffers, so sharing array refs
    # between old and new model would let training one invalidate the
    # other ("Array has been deleted")
    for nname, pdict in model.params.items():
        if nname in new.params:
            for pname, v in pdict.items():
                if (pname in new.params[nname]
                        and new.params[nname][pname].shape == v.shape):
                    new.params[nname][pname] = jnp.array(v)
    new.state = {k: {sk: jnp.array(sv) for sk, sv in v.items()}
                 for k, v in model.state.items()}
    # carry over the optimiser: params are patch-size-invariant, so the
    # restored slot state (Adam moments etc.) transfers — dropping it here
    # would silently restart a resumed run's moments from zero
    if model.optimiser is not None:
        meta = model._opt_meta()
        new.set_opt(meta["cls"], **meta["hyper"])
        if meta.get("nesterov"):
            new.optimiser.nesterov = True
        new._step_count = model._step_count
        old_leaves, _ = jax.tree_util.tree_flatten(model.opt_state)
        new_leaves, treedef = jax.tree_util.tree_flatten(new.opt_state)
        if len(old_leaves) == len(new_leaves):
            merged = [jnp.array(o)     # copy: donation safety (see above)
                      if getattr(o, "shape", None) == n.shape else n
                      for o, n in zip(old_leaves, new_leaves)]
            new.opt_state = jax.tree_util.tree_unflatten(treedef, merged)
    # carry the FULL serving configuration, not just the dtype — dropping
    # the lowering knobs silently reverted a tuned model to the default
    # 'direct' program on rebuild (review r2 s5)
    new._compute_dtype = model._compute_dtype
    new._compute_act = getattr(model, "_compute_act", False)
    new._remat = model._remat
    new._dilated_impl = getattr(model, "_dilated_impl", "direct")
    new._dilated_zfold = getattr(model, "_dilated_zfold", False)
    new._dilated_ztap = getattr(model, "_dilated_ztap", False)
    new._dilated_zmajor = getattr(model, "_dilated_zmajor", False)
    new._dilated_poolslice = getattr(model, "_dilated_poolslice", False)
    new._dilated_ptail = getattr(model, "_dilated_ptail", False)
    new._convdense_upconv = getattr(model, "_convdense_upconv", "dilate")
    new._convdense_zfold = getattr(model, "_convdense_zfold", False)
    new._convdense_ptail = getattr(model, "_convdense_ptail", False)
    new._convdense_poolslice = getattr(model, "_convdense_poolslice",
                                       False)
    new._convdense_skipsum = getattr(model, "_convdense_skipsum", False)
    # calibrated int8 scales are per-conv-INPUT maxima: params carry over
    # unchanged, but an imposed patch/mfp change alters the activation
    # distribution geometry only, not its magnitudes — still valid
    new._quant_scales = getattr(model, "_quant_scales", None)
    return new


def simple_cnn(batch_size, n_ch, n_lab, desired_input, filters, pools,
               nof_filters, activation_func="relu", mfp=False, ndim=3,
               target="nll", dropout_rates=None, batch_normalisation=False):
    """Convenience constructor for a plain conv stack (reference:
    ``model.py::simple_cnn``). Picks the closest valid patch size via
    cnncalculator and returns a designated Model."""
    from elektronn2_tpu.utils.cnncalculator import cnncalculator
    from elektronn2_tpu.neuromancer import node_basic as nb
    from elektronn2_tpu.neuromancer import neural, loss as loss_mod

    calc = cnncalculator(filters, pools, desired_input, mfp=mfp, ndim=ndim)
    patch = calc.input if ndim > 1 else [calc.input]
    tags = ["b", "f"] + list("zxy"[:ndim] if ndim == 3 else "xy"[:ndim])
    gm = graphmanager.current_manager()
    gm.reset()
    inp = nb.Input([batch_size, n_ch] + list(patch), tags, name="raw")
    x = inp
    dropout_rates = dropout_rates or [0.0] * len(filters)
    # zip() stops at the shortest list — a short nof_filters/dropout_rates
    # would silently TRUNCATE the network (review r2 s5)
    for nm_, seq in (("pools", pools), ("nof_filters", nof_filters),
                     ("dropout_rates", dropout_rates)):
        if len(seq) != len(filters):
            raise ValueError(
                f"simple_cnn: {nm_} has {len(seq)} entries but filters "
                f"has {len(filters)} — per-layer lists must align")
    for i, (f, p, nf, dr) in enumerate(
            zip(filters, pools, nof_filters, dropout_rates)):
        x = neural.Conv(x, nf, f, p, activation_func=activation_func,
                        mfp=mfp, dropout_rate=dr,
                        batch_normalisation=batch_normalisation,
                        name=f"conv{i}")
    out = neural.Conv(x, n_lab, 1, 1, activation_func="lin", name="class")
    tgt_sp = list(out.shape.spatial_shape)
    if target == "nll":
        probs = loss_mod.Softmax(out, name="probs")
        tgt = nb.Input([probs.shape["b"]] + tgt_sp, ["b"] + tags[2:],
                       dtype="int32", name="target")
        nll = loss_mod.MultinoulliNLL(probs, tgt, target_is_sparse=True,
                                      name="nll")
        agg = loss_mod.AggregateLoss(nll, name="loss")
        err = loss_mod.Errors(probs, tgt, target_is_sparse=True)
        pred = probs
    elif target in ("regression", "affinity"):
        pred = (loss_mod.Softmax(out, name="probs") if target == "affinity"
                else out)
        tgt = nb.Input([out.shape["b"], n_lab] + tgt_sp, tags,
                       name="target")
        sq = loss_mod.SquaredLoss(pred, tgt, name="sq")
        agg = loss_mod.AggregateLoss(sq, name="loss")
        err = None
    else:
        raise ValueError(f"unknown simple_cnn target {target!r}; "
                         "use 'nll', 'regression' or 'affinity'")
    model = gm.getmodel("simple_cnn")
    model.designate_nodes(input_node=inp, target_node=tgt, loss_node=agg,
                          prediction_node=pred, error_node=err)
    return model
