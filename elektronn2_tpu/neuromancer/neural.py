"""Neural layer nodes: dense, convolution, pooling, upconv, recurrent.

Reference: ``elektronn2/neuromancer/neural.py::Perceptron (Dot), Conv,
UpConv, Crop, Pool, FragmentsToDense, FaithlessMerge, GRU, LSTM``.

TPU-first notes: every layer lowers to a single XLA op chain
(``lax.conv_general_dilated`` on the MXU + fused VPU elementwise); MFP
fragment pooling stacks fragments into the batch axis so dense inference
keeps the MXU busy with big batched convs. Semantics preserved from the
reference: valid-mode convs, pooling applied *before* the activation, MFP
valid-size arithmetic (see ops/mfp.py and utils/cnncalculator.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from elektronn2_tpu.neuromancer.graphmanager import register_node_class
from elektronn2_tpu.neuromancer.graphutils import TaggedShape, floatX
from elektronn2_tpu.neuromancer.node_basic import Node
from elektronn2_tpu.neuromancer.variables import init_weight, init_bias
from elektronn2_tpu.ops import conv as ops_conv
from elektronn2_tpu.ops.conv import pooling as ops_pooling, upconv as ops_upconv, dot as ops_dot
from elektronn2_tpu.ops.mfp import fragmentpool, fragments2dense, mfp_offsets_product
from elektronn2_tpu.ops.activations import get_activation, validate_activation


def _validate_cell_activation(name):
    """Recurrent cells need plain elementwise activations (no maxout/prelu
    — those change shape / carry params)."""
    validate_activation(name)
    if isinstance(name, str) and (name.startswith("maxout")
                                  or name == "prelu"):
        raise ValueError(f"{name!r} is not usable inside GRU/LSTM cells")
    return name


def _maxout_factor(activation_func):
    if isinstance(activation_func, str) and activation_func.startswith("maxout"):
        return int(activation_func.split(":")[1]) if ":" in activation_func else 2
    return 1


def _apply_dropout(x, rate, ctx, node):
    """Inverted elementwise dropout, active only in training mode."""
    if not rate or not ctx.train:
        return x
    key = ctx.rng_for(node)
    if key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class _BNMixin:
    """Shared batch-norm machinery (train: batch stats + EMA update of
    running stats carried in model state; eval: running stats)."""

    BN_MOMENTUM = 0.99

    def _init_bn(self, n_f):
        self.register_param("bn_gamma", np.ones(n_f, floatX))
        self.register_param("bn_beta", np.zeros(n_f, floatX))
        self._bn_nf = n_f

    def _apply_bn(self, x, ctx, f_axis=1):
        shape = [1] * x.ndim
        shape[f_axis] = self._bn_nf
        gamma = ctx.param(self, "bn_gamma").reshape(shape)
        beta = ctx.param(self, "bn_beta").reshape(shape)
        red = tuple(i for i in range(x.ndim) if i != f_axis)
        st = ctx.state(self)
        if ctx.train or st is None:
            mean = jnp.mean(x, axis=red)
            var = jnp.var(x, axis=red)
            if st is None:
                st = {"mean": jnp.zeros(self._bn_nf, x.dtype),
                      "var": jnp.ones(self._bn_nf, x.dtype)}
            m = self.BN_MOMENTUM
            ctx.set_state(self, {"mean": m * st["mean"] + (1 - m) * mean,
                                 "var": m * st["var"] + (1 - m) * var})
        else:
            mean, var = st["mean"], st["var"]
            ctx.set_state(self, st)
        xn = (x - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + 1e-5)
        return gamma * xn + beta


@register_node_class
class Perceptron(Node, _BNMixin):
    """Fully-connected layer over the feature axis.

    Reference: ``neural.py::Perceptron`` (alias ``Dot``). With
    ``flatten=True`` the spatial axes are folded into features first
    (classic MLP head); otherwise the transform is applied per spatial
    position (equivalent to a 1×1 conv → MXU matmul).
    """

    def __init__(self, parent, n_f, activation_func="relu", flatten=False,
                 batch_normalisation=False, dropout_rate=0, w=None, b=None,
                 name="dot", print_repr=True):
        super().__init__(parent, name, print_repr)
        self.n_f = int(n_f)
        self.activation_func = validate_activation(activation_func)
        self.flatten = bool(flatten)
        self.batch_normalisation = bool(batch_normalisation)
        self.dropout_rate = float(dropout_rate)

        ps = parent.shape
        if self.flatten:
            f_in = int(np.prod([s for t, s in zip(ps.tags, ps.shape)
                                if t != "b"]))
            self.shape = TaggedShape((ps["b"], self.n_f), ("b", "f"))
        else:
            f_in = ps["f"]
            self.shape = ps.updateshape("f", self.n_f)
        self._f_ax = None if self.flatten else ps.tag2index("f")
        k = _maxout_factor(activation_func)
        if k > 1:
            self.shape = self.shape.updateshape("f", self.n_f // k)
        self._f_in = f_in
        rng = self._gm.init_rng()
        w = w if w is not None else init_weight(rng, (f_in, self.n_f),
                                                activation_func)
        b = b if b is not None else init_bias(self.n_f, activation_func)
        self.register_param("w", w)
        self.register_param("b", b, wd_mult=0.0)
        if activation_func == "prelu":
            self.register_param("alpha", np.full(self.n_f, 0.25, floatX),
                                wd_mult=0.0)
        if self.batch_normalisation:
            # BN runs before the activation → pre-maxout feature count
            self._init_bn(self.n_f)

    def _compute(self, ctx, x):
        if self.flatten:
            x = x.reshape(x.shape[0], -1)
        w = ctx.param(self, "w")
        b = ctx.param(self, "b")
        # mixed precision: matmul operands in compute_dtype (bf16 on the
        # MXU), elementwise tail back in f32 — same policy as Conv
        cd = ctx.compute_dtype
        xm = x.astype(cd) if cd is not None else x
        if x.ndim == 2 or (self._f_ax is not None
                           and self._f_ax == x.ndim - 1):
            y = jnp.dot(xm, w.astype(xm.dtype),
                        preferred_element_type=xm.dtype)
            y = (y.astype(jnp.float32) if cd is not None else y) + b
        else:
            ax = 1 if self._f_ax is None else self._f_ax
            y = ops_dot(xm, w, axis=ax)
            y = (y.astype(jnp.float32) if cd is not None else y) \
                + b.reshape((1,) * ax + (-1,) + (1,) * (x.ndim - ax - 1))
        f_ax = (1 if self.flatten else self._f_ax)
        if self.batch_normalisation:
            y = self._apply_bn(y, ctx, f_axis=f_ax)
        from elektronn2_tpu.ops.conv import apply_activation
        alpha = ctx.param(self, "alpha") if "alpha" in self.params else None
        y = apply_activation(y, self.activation_func, alpha=alpha,
                             axis=f_ax)
        y = _apply_dropout(y, self.dropout_rate, ctx, self)
        return y


Dot = Perceptron  # reference alias


def _norm_spatial(v, nsp, what):
    if np.isscalar(v):
        return (int(v),) * nsp
    v = tuple(int(x) for x in v)
    if len(v) != nsp:
        raise ValueError(f"{what} {v} does not match spatial rank {nsp}")
    return v


@register_node_class
class Conv(Node, _BNMixin):
    """Valid-mode N-D convolution with optional fused pooling / MFP.

    Reference: ``neural.py::Conv`` — conv (+bias) → max-pool (plain or MFP)
    → batch-norm → activation → dropout. Pooling before activation matches
    the reference (valid for its monotonic activations; documented there as
    a speed optimisation).

    With ``mfp=True`` the pooling evaluates all pool-offset fragments and
    stacks them into the batch axis (see ops/mfp.py); the TaggedShape tracks
    fragment offsets so ``FragmentsToDense``/``predict_dense`` can stitch a
    full-resolution map.
    """

    def __init__(self, parent, n_f, filter_shape, pool_shape=None,
                 activation_func="relu", mfp=False,
                 batch_normalisation=False, dropout_rate=0, w=None, b=None,
                 name="conv", print_repr=True):
        super().__init__(parent, name, print_repr)
        ps = parent.shape
        nsp = len(ps.spatial_axes)
        if nsp == 0:
            raise ValueError("Conv requires spatial axes; use Perceptron")
        self.n_f = int(n_f)
        self.filter_shape = _norm_spatial(filter_shape, nsp, "filter_shape")
        self.pool_shape = _norm_spatial(pool_shape if pool_shape is not None
                                        else 1, nsp, "pool_shape")
        self.activation_func = validate_activation(activation_func)
        self.mfp = bool(mfp)
        self.batch_normalisation = bool(batch_normalisation)
        self.dropout_rate = float(dropout_rate)

        # ---- shape propagation (the cnncalculator arithmetic) ----
        sp = list(ps.spatial_shape)
        strides = list(ps.strides)
        fov = list(ps.fov)
        offsets = ps.mfp_offsets
        batch = ps["b"]
        for d, (f, p) in enumerate(zip(self.filter_shape, self.pool_shape)):
            o = sp[d] - f + 1
            if o < 1:
                raise ValueError(
                    f"{self.name}: spatial dim {d} too small for filter "
                    f"{f} (size {sp[d]})")
            fov[d] += (f - 1) * strides[d]
            if p > 1:
                if self.mfp:
                    if (o + 1) % p:
                        raise ValueError(
                            f"{self.name}: MFP pool {p} needs size ≡ p-1 "
                            f"(mod p) in dim {d}, got {o}; use "
                            "utils.cnncalculator to pick a valid patch size")
                    o = (o + 1) // p - 1
                else:
                    if o % p:
                        raise ValueError(
                            f"{self.name}: pool {p} does not divide size {o} "
                            f"in dim {d}; use utils.cnncalculator")
                    o //= p
                fov[d] += (p - 1) * strides[d]
            sp[d] = o
        self._pre_pool_strides = tuple(strides)
        if self.mfp and any(p > 1 for p in self.pool_shape):
            new_offsets = []
            for dvec in mfp_offsets_product(self.pool_shape):
                new_offsets.append(offsets +
                                   np.asarray(dvec) * np.asarray(strides))
            offsets = np.concatenate(new_offsets, axis=0)
            batch = batch * int(np.prod(self.pool_shape))
        strides = [s * p for s, p in zip(strides, self.pool_shape)]

        out_f = self.n_f // _maxout_factor(activation_func)
        shape = list(ps.shape)
        shape[ps.tag2index("b")] = batch
        shape[ps.tag2index("f")] = out_f
        for ax, s in zip(ps.spatial_axes, sp):
            shape[ax] = s
        self.shape = TaggedShape(shape, ps.tags, strides, fov, offsets)

        rng = self._gm.init_rng()
        wshape = (self.n_f, ps["f"]) + self.filter_shape
        w = w if w is not None else init_weight(rng, wshape, activation_func)
        b = b if b is not None else init_bias(self.n_f, activation_func)
        self.register_param("w", w)
        self.register_param("b", b, wd_mult=0.0)
        if activation_func == "prelu":
            self.register_param("alpha", np.full(out_f, 0.25, floatX),
                                wd_mult=0.0)
        if self.batch_normalisation:
            # BN runs before the activation → pre-maxout feature count
            self._init_bn(self.n_f)
        self._parent_offsets = np.asarray(ps.mfp_offsets)

    def _serving_conv_fn(self, ctx, x):
        """Pick the conv lowering for this trace: ``conv_zfold2d`` when the
        conv-dense serving path requests the z-fold (kz=1 3D convs only —
        Model.set_convdense_impl(zfold=True)), else plain ``conv``.
        Exactly equivalent; serving-only (the flag exists only on
        conv-dense TraceCtxs)."""
        if getattr(ctx, "convdense_zfold", False) and x.ndim == 5 \
                and len(self.filter_shape) == 3 \
                and self.filter_shape[0] == 1:
            from elektronn2_tpu.ops.conv import conv_zfold2d
            return conv_zfold2d
        return ops_conv

    def _ptail_eligible(self, ctx, x):
        """Node-level eligibility for the conv-dense Pallas tail-conv
        kernel (``Model.set_convdense_impl(ptail=...)``): a plain (3,3,3)
        relu Conv of a 3D volume trace. Max pooling is allowed — the
        kernel's fused relu commutes exactly with max (both monotone, so
        ``max(relu(z)) == relu(max(z))`` element-for-element); BN is not
        (it sits between pool and activation). MFP stays on the XLA conv
        (conv-dense serves stride-1 decoder graphs; fragment bookkeeping
        is never exercised here and stays conservative)."""
        return (getattr(ctx, "convdense_ptail", False)
                and x.ndim == 5
                and tuple(self.filter_shape) == (3, 3, 3)
                and self.activation_func == "relu"
                and not self.batch_normalisation
                and not self.mfp
                and "alpha" not in self.params)

    def _compute(self, ctx, x):
        w = ctx.param(self, "w")
        b = ctx.param(self, "b")
        if self._ptail_eligible(ctx, x):
            from elektronn2_tpu.ops.pallas_tailconv import (
                conv3x3_dilated, tail_kernel_kwargs)
            kw = dict(dil=(1, 1, 1), relu=True,
                      **tail_kernel_kwargs(ctx.convdense_ptail))
            # the kernel is single-volume: slab batches run in a static
            # in-jit loop (one dispatch per chunk is what batching buys;
            # the kernels execute sequentially inside it — same policy as
            # the dilated path's batched serving)
            ys = [conv3x3_dilated(x[i:i + 1], w, b, **kw)
                  for i in range(int(x.shape[0]))]
            y = jnp.concatenate(ys, 0) if len(ys) > 1 else ys[0]
            # bias + relu are fused in the kernel; pool commutes (max)
            if any(p > 1 for p in self.pool_shape):
                y = ops_pooling(y, self.pool_shape)
            return _apply_dropout(y, self.dropout_rate, ctx, self)
        halo_axis = getattr(ctx, "halo_axis", None)
        if halo_axis is not None and len(self.filter_shape) == 3 \
                and self.filter_shape[0] > 1:
            # z-sharded training (parallel/spatial_train.py): fetch the
            # filter's z halo from the next rank; output keeps z_local rows
            from elektronn2_tpu.parallel.halo import halo_gather
            x = halo_gather(x, self.filter_shape[0] - 1, halo_axis)
        qc = getattr(ctx, "quant_calibrate", None)
        if qc is not None:          # eager f32 calibration pass
            qc[self.name] = float(jnp.max(jnp.abs(x)))
        if getattr(ctx, "quant_serving", False):
            # int8 quantised WHOLE-VOLUME serving (conv-dense path for
            # decoder graphs): one trace per volume, so the dynamic
            # activation scale is global — per-TILE scales would seam a
            # stitched output, which is why the tiled fallback never sets
            # this flag (inference.py::convolutional_dense_forward).
            # Calibrated static scales (ctx.quant_scales) take precedence
            # — they make slab sweeps seam-free and grid-invariant.
            from elektronn2_tpu.ops.conv import quantized_conv
            y = quantized_conv(
                x, w, x_absmax=(getattr(ctx, "quant_scales", None)
                                or {}).get(self.name)) \
                + b.reshape((1, -1) + (1,) * (x.ndim - 2))
        elif ctx.compute_dtype is not None:
            # mixed precision: bf16 operands on the MXU (internal f32
            # accumulation), cast back for the elementwise tail — the
            # explicit astype keeps the conv dtype-uniform so its gradient
            # transpose is well-typed
            cfn = self._serving_conv_fn(ctx, x)
            y = cfn(x.astype(ctx.compute_dtype),
                    w.astype(ctx.compute_dtype)).astype(jnp.float32)
            y = y + b.reshape((1, -1) + (1,) * (x.ndim - 2))
        else:
            cfn = self._serving_conv_fn(ctx, x)
            y = cfn(x, w) + b.reshape((1, -1) + (1,) * (x.ndim - 2))
        return self._conv_epilogue(ctx, y)

    def _conv_epilogue(self, ctx, y):
        """Post-conv tail shared by every Conv lowering: pool (or MFP
        fragment-pool), BN, activation, dropout."""
        if any(p > 1 for p in self.pool_shape):
            if self.mfp:
                y, _ = fragmentpool(y, self.pool_shape, self._parent_offsets,
                                    self._pre_pool_strides)
            elif getattr(ctx, "convdense_poolslice", False):
                # conv-dense serving lowering (set_convdense_impl
                # poolslice=True): strided-slice maxima — elementwise,
                # XLA-fusible — instead of reduce_window (exact)
                from elektronn2_tpu.ops.conv import pooling_slices
                y = pooling_slices(y, self.pool_shape)
            else:
                y = ops_pooling(y, self.pool_shape)
        if self.batch_normalisation:
            y = self._apply_bn(y, ctx)
        from elektronn2_tpu.ops.conv import apply_activation
        alpha = ctx.param(self, "alpha") if "alpha" in self.params else None
        y = apply_activation(y, self.activation_func, alpha=alpha)
        y = _apply_dropout(y, self.dropout_rate, ctx, self)
        return y

    def _compute_fused(self, ctx):
        """Fused-evaluation hook (node_basic.TraceCtx.get): under the
        conv-dense ``skipsum`` lowering, a Conv fed by a FaithlessMerge
        evaluates ``conv(concat(a, b)) == conv(a, w[:, :Ca]) +
        conv(b, w[:, Ca:])`` (exact: convolution is linear in channels)
        against the merge's CROPPED pieces — the skip concat is never
        materialised (the r5 wide-graph profile showed the concat
        lowering as pad/maximum kLoop fusions + layout copies). Returns
        None (declines) outside that exact situation."""
        if not getattr(ctx, "convdense_skipsum", False):
            return None
        p = self.parents[0]
        if (type(p).__name__ != "FaithlessMerge" or self.mfp
                or self.batch_normalisation
                or getattr(ctx, "quant_serving", False)
                or getattr(ctx, "quant_calibrate", None) is not None):
            return None
        a = ctx.get(p.parents[0])
        bb = ctx.get(p.parents[1])
        if self._ptail_eligible(ctx, a):
            return None            # keep the Pallas route decision simple
        a, bb = p._cropped_pieces(a, bb)
        w = ctx.param(self, "w")
        bias = ctx.param(self, "b")
        ca = int(p.parents[0].shape["f"])
        cfn = self._serving_conv_fn(ctx, a)
        if ctx.compute_dtype is not None:
            cd = ctx.compute_dtype
            y = (cfn(a.astype(cd), w[:, :ca].astype(cd))
                 + cfn(bb.astype(cd), w[:, ca:].astype(cd))
                 ).astype(jnp.float32)
        else:
            y = cfn(a, w[:, :ca]) + cfn(bb, w[:, ca:])
        y = y + bias.reshape((1, -1) + (1,) * (a.ndim - 2))
        return self._conv_epilogue(ctx, y)


@register_node_class
class Pool(Node):
    """Standalone pooling node (max/avg), optionally MFP.

    Reference: ``neural.py::Pool``.
    """

    def __init__(self, parent, pool_shape, mfp=False, mode="max",
                 name="pool", print_repr=True):
        super().__init__(parent, name, print_repr)
        ps = parent.shape
        nsp = len(ps.spatial_axes)
        self.pool_shape = _norm_spatial(pool_shape, nsp, "pool_shape")
        self.mfp = bool(mfp)
        self.mode = mode

        sp = list(ps.spatial_shape)
        strides = list(ps.strides)
        fov = list(ps.fov)
        offsets = ps.mfp_offsets
        batch = ps["b"]
        for d, p in enumerate(self.pool_shape):
            if p > 1:
                o = sp[d]
                if self.mfp:
                    if (o + 1) % p:
                        raise ValueError(f"{self.name}: invalid MFP size {o} "
                                         f"for pool {p} in dim {d}")
                    sp[d] = (o + 1) // p - 1
                else:
                    if o % p:
                        raise ValueError(f"{self.name}: pool {p} does not "
                                         f"divide {o} in dim {d}")
                    sp[d] = o // p
                fov[d] += (p - 1) * strides[d]
        self._pre_pool_strides = tuple(strides)
        if self.mfp and any(p > 1 for p in self.pool_shape):
            offsets = np.concatenate(
                [offsets + np.asarray(d) * np.asarray(strides)
                 for d in mfp_offsets_product(self.pool_shape)], axis=0)
            batch *= int(np.prod(self.pool_shape))
        strides = [s * p for s, p in zip(strides, self.pool_shape)]
        shape = list(ps.shape)
        shape[ps.tag2index("b")] = batch
        for ax, s in zip(ps.spatial_axes, sp):
            shape[ax] = s
        self.shape = TaggedShape(shape, ps.tags, strides, fov, offsets)
        self._parent_offsets = np.asarray(ps.mfp_offsets)

    def _compute(self, ctx, x):
        if all(p == 1 for p in self.pool_shape):
            return x
        if self.mfp:
            y, _ = fragmentpool(x, self.pool_shape, self._parent_offsets,
                                self._pre_pool_strides, mode=self.mode)
            return y
        return ops_pooling(x, self.pool_shape, mode=self.mode)


@register_node_class
class UpConv(Node):
    """Transposed convolution with kernel = stride = pool_shape.

    Reference: ``neural.py::UpConv`` — inverts a pooling in decoder paths
    (U-Net style). Spatial size multiplies by pool; the output stride
    divides (must be divisible — upconv past stride 1 is rejected).
    """

    def __init__(self, parent, n_f, pool_shape, activation_func="lin",
                 w=None, b=None, name="upconv", print_repr=True):
        super().__init__(parent, name, print_repr)
        ps = parent.shape
        nsp = len(ps.spatial_axes)
        if ps.n_frag > 1:
            raise ValueError("UpConv after MFP pooling is unsupported; "
                             "restitch with FragmentsToDense first")
        self.n_f = int(n_f)
        self.pool_shape = _norm_spatial(pool_shape, nsp, "pool_shape")
        self.activation_func = validate_activation(activation_func)
        sp = [s * p for s, p in zip(ps.spatial_shape, self.pool_shape)]
        strides = []
        for s, p in zip(ps.strides, self.pool_shape):
            if s % p:
                raise ValueError(f"{self.name}: upconv pool {p} does not "
                                 f"divide stride {s}")
            strides.append(s // p)
        shape = list(ps.shape)
        shape[ps.tag2index("f")] = self.n_f
        for ax, s in zip(ps.spatial_axes, sp):
            shape[ax] = s
        self.shape = TaggedShape(shape, ps.tags, strides, ps.fov,
                                 ps.mfp_offsets)
        rng = self._gm.init_rng()
        wshape = (self.n_f, ps["f"]) + self.pool_shape
        w = w if w is not None else init_weight(rng, wshape, activation_func)
        b = b if b is not None else init_bias(self.n_f, activation_func)
        self.register_param("w", w)
        self.register_param("b", b, wd_mult=0.0)

    def _compute(self, ctx, x):
        w = ctx.param(self, "w")
        b = ctx.param(self, "b")
        qc = getattr(ctx, "quant_calibrate", None)
        if qc is not None:          # eager f32 calibration pass
            qc[self.name] = float(jnp.max(jnp.abs(x)))
        if getattr(ctx, "quant_serving", False):
            # int8 whole-volume serving (see Conv._compute): transposed
            # convs quantise the same way — int8 operands, int32 accum
            from elektronn2_tpu.ops.conv import quantized_conv
            y = quantized_conv(x, w, conv_fn=ops_upconv,
                               pool_shape=self.pool_shape,
                               x_absmax=(getattr(ctx, "quant_scales",
                                                 None)
                                         or {}).get(self.name))
        elif getattr(ctx, "convdense_upconv_d2s", False):
            # conv-dense serving lowering (Model.set_convdense_impl):
            # 1×1 conv + depth-to-space — bit-identical, measured faster
            from elektronn2_tpu.ops.conv import upconv_d2s
            y = upconv_d2s(x, w, self.pool_shape)
        else:
            y = ops_upconv(x, w, self.pool_shape)
        y = y + b.reshape((1, -1) + (1,) * (x.ndim - 2))
        from elektronn2_tpu.ops.conv import apply_activation
        return apply_activation(y, self.activation_func)


@register_node_class
class Crop(Node):
    """Crop spatial borders.

    Reference: ``neural.py::Crop``. ``crop`` is per spatial dim: an int
    (both sides) or (lo, hi) pairs. Symmetric crops keep the centred-fov
    bookkeeping exact (fov += 2*lo*stride).
    """

    def __init__(self, parent, crop, name="crop", print_repr=True):
        super().__init__(parent, name, print_repr)
        ps = parent.shape
        nsp = len(ps.spatial_axes)
        if np.isscalar(crop):
            crop = [(int(crop), int(crop))] * nsp
        else:
            crop = [(int(c), int(c)) if np.isscalar(c) else (int(c[0]), int(c[1]))
                    for c in crop]
        if len(crop) != nsp:
            raise ValueError("crop spec rank mismatch")
        self.crop = crop
        sp = [s - lo - hi for s, (lo, hi) in zip(ps.spatial_shape, crop)]
        if any(s < 1 for s in sp):
            raise ValueError(f"crop {crop} exceeds spatial shape "
                             f"{ps.spatial_shape}")
        fov = list(ps.fov)
        for d, (lo, hi) in enumerate(crop):
            # symmetric crops keep the centred-fov model exact; asymmetric
            # ones shift the centre by (hi-lo)/2 voxels (approximation)
            fov[d] += (lo + hi) * ps.strides[d]
        shape = list(ps.shape)
        for ax, s in zip(ps.spatial_axes, sp):
            shape[ax] = s
        self.shape = TaggedShape(shape, ps.tags, ps.strides, fov,
                                 ps.mfp_offsets)

    def _compute(self, ctx, x):
        idx = [slice(None)] * x.ndim
        for ax, (lo, hi) in zip(self.parents[0].shape.spatial_axes, self.crop):
            idx[ax] = slice(lo, x.shape[ax] - hi)
        return x[tuple(idx)]


@register_node_class
class Pad(Node):
    """Zero/reflect-pad spatial borders (new convenience node)."""

    def __init__(self, parent, pad, mode="constant", name="pad",
                 print_repr=True):
        super().__init__(parent, name, print_repr)
        ps = parent.shape
        nsp = len(ps.spatial_axes)
        if np.isscalar(pad):
            pad = [(int(pad), int(pad))] * nsp
        else:
            pad = [(int(p), int(p)) if np.isscalar(p) else (int(p[0]), int(p[1]))
                   for p in pad]
        self.pad = pad
        self.mode = mode
        sp = [s + lo + hi for s, (lo, hi) in zip(ps.spatial_shape, pad)]
        shape = list(ps.shape)
        for ax, s in zip(ps.spatial_axes, sp):
            shape[ax] = s
        self.shape = TaggedShape(shape, ps.tags, ps.strides, ps.fov,
                                 ps.mfp_offsets)

    def _compute(self, ctx, x):
        widths = [(0, 0)] * x.ndim
        for ax, p in zip(self.parents[0].shape.spatial_axes, self.pad):
            widths[ax] = p
        return jnp.pad(x, widths, mode=self.mode)


@register_node_class
class Dropout(Node):
    """Standalone inverted-dropout node (train-mode only)."""

    def __init__(self, parent, rate=0.5, name="dropout", print_repr=True):
        super().__init__(parent, name, print_repr)
        self.rate = float(rate)
        self.shape = parent.shape.copy()

    def _compute(self, ctx, x):
        return _apply_dropout(x, self.rate, ctx, self)


@register_node_class
class BatchNorm(Node, _BNMixin):
    """Standalone batch normalisation over the feature axis."""

    def __init__(self, parent, name="batchnorm", print_repr=True):
        super().__init__(parent, name, print_repr)
        self.shape = parent.shape.copy()
        self._init_bn(parent.shape["f"])

    def _compute(self, ctx, x):
        return self._apply_bn(x, ctx, f_axis=self.shape.tag2index("f"))


@register_node_class
class LRN(Node):
    """Local response normalisation across features (reference-era op)."""

    def __init__(self, parent, size=5, alpha=1e-4, beta=0.75, k=2.0,
                 name="lrn", print_repr=True):
        super().__init__(parent, name, print_repr)
        self.size, self.alpha, self.beta, self.k = int(size), alpha, beta, k
        self.shape = parent.shape.copy()

    def _compute(self, ctx, x):
        sq = x * x
        half = self.size // 2
        pads = [(0, 0)] * x.ndim
        pads[1] = (half, half)
        sq = jnp.pad(sq, pads)
        window = [1] * x.ndim
        window[1] = self.size
        s = jax.lax.reduce_window(sq, 0.0, jax.lax.add, tuple(window),
                                  (1,) * x.ndim, "VALID")
        return x / jnp.power(self.k + self.alpha * s, self.beta)


@register_node_class
class FragmentsToDense(Node):
    """Restitch MFP fragments into a dense full-resolution map on device.

    Reference: ``neural.py::FragmentsToDense`` (via
    ``computations.fragments2dense``).
    """

    def __init__(self, parent, name="fragments_to_dense", print_repr=True):
        super().__init__(parent, name, print_repr)
        ps = parent.shape
        if ps.n_frag == 1:
            self.shape = ps.copy()
            self._n_off = (1,) * len(ps.spatial_axes)
            return
        from elektronn2_tpu.ops.mfp import _interleave_geometry
        g, n_off, _ = _interleave_geometry(ps.mfp_offsets)
        self._n_off = tuple(n_off)
        shape = list(ps.shape)
        shape[ps.tag2index("b")] = ps["b"] // ps.n_frag
        for ax, s, n in zip(ps.spatial_axes, ps.spatial_shape, n_off):
            shape[ax] = s * n
        strides = [st // n for st, n in zip(ps.strides, n_off)]
        self.shape = TaggedShape(shape, ps.tags, strides, ps.fov)

    def _compute(self, ctx, x):
        return fragments2dense(x, self.parents[0].shape.mfp_offsets)


@register_node_class
class FaithlessMerge(Node):
    """Concat features after centre-cropping parents to a common spatial
    shape ("faithless" about alignment — the reference uses it to merge
    feature maps whose shapes drifted apart). Reference:
    ``neural.py::FaithlessMerge`` (semantics partially unverified,
    SURVEY.md §3.1).
    """

    def __init__(self, hard_features, soft_features, name="faithless_merge",
                 print_repr=True):
        super().__init__([hard_features, soft_features], name, print_repr)
        s1, s2 = hard_features.shape, soft_features.shape
        if s1.tags != s2.tags:
            raise ValueError("FaithlessMerge parents must share tags")
        common = [min(a, b) for a, b in zip(s1.spatial_shape, s2.spatial_shape)]
        shape = list(s1.shape)
        shape[s1.tag2index("f")] = s1["f"] + s2["f"]
        for ax, c in zip(s1.spatial_axes, common):
            shape[ax] = c
        self.shape = TaggedShape(shape, s1.tags, s1.strides, s1.fov,
                                 s1.mfp_offsets)
        self._common = common

    def _cropped_pieces(self, a, b):
        """Centre-crop both parents to the common runtime spatial shape
        (the crop amounts are input-size invariant — shape-polymorphic,
        required by the whole-volume conv-dense path). Shared by
        ``_compute`` (which concats) and the conv-dense ``skipsum``
        lowering (Conv._compute_fused, which never concats)."""
        ax_a = self.parents[0].shape.spatial_axes
        ax_b = self.parents[1].shape.spatial_axes
        common = [min(a.shape[i], b.shape[j]) for i, j in zip(ax_a, ax_b)]

        def crop_to(x, sp_axes):
            idx = [slice(None)] * x.ndim
            for ax, c in zip(sp_axes, common):
                lo = (x.shape[ax] - c) // 2
                idx[ax] = slice(lo, lo + c)
            return x[tuple(idx)]
        return crop_to(a, ax_a), crop_to(b, ax_b)

    def _compute(self, ctx, a, b):
        a, b = self._cropped_pieces(a, b)
        return jnp.concatenate([a, b], axis=self.shape.tag2index("f"))


# --------------------------------------------------------------- recurrent

@register_node_class
class GRU(Node):
    """Gated recurrent unit cell: one step, (b, f) in, (b, n_hid) out.

    Reference: ``neural.py::GRU`` — the recurrent node of the tracing
    models; iterated by ``various.ScanN`` (→ ``lax.scan``).
    """

    def __init__(self, parent, memory_state, n_f, activation_func="tanh",
                 w=None, name="gru", print_repr=True):
        super().__init__([parent, memory_state], name, print_repr)
        self.n_f = int(n_f)
        self.activation_func = _validate_cell_activation(activation_func)
        f_in = parent.shape["f"]
        if memory_state.shape["f"] != self.n_f:
            raise ValueError(f"memory_state features "
                             f"{memory_state.shape['f']} != n_f {self.n_f}")
        self.shape = memory_state.shape.copy()
        rng = self._gm.init_rng()
        # fused kernels: [x, h] -> (z, r) gates and candidate
        self.register_param("w_gates", init_weight(
            rng, (f_in + self.n_f, 2 * self.n_f), "sig"))
        self.register_param("b_gates", np.zeros(2 * self.n_f, floatX),
                            wd_mult=0.0)
        self.register_param("w_cand", init_weight(
            rng, (f_in + self.n_f, self.n_f), activation_func))
        self.register_param("b_cand", np.zeros(self.n_f, floatX),
                            wd_mult=0.0)

    def _compute(self, ctx, x, h):
        # mixed precision: fused-gate matmuls in compute_dtype, f32 state
        cd = ctx.compute_dtype

        def mm(a, wname):
            am = a.astype(cd) if cd is not None else a
            y = jnp.dot(am, ctx.param(self, wname).astype(am.dtype),
                        preferred_element_type=am.dtype)
            return y.astype(jnp.float32) if cd is not None else y

        xh = jnp.concatenate([x, h], axis=-1)
        gates = jax.nn.sigmoid(mm(xh, "w_gates")
                               + ctx.param(self, "b_gates"))
        z, r = jnp.split(gates, 2, axis=-1)
        xrh = jnp.concatenate([x, r * h], axis=-1)
        cand = get_activation(self.activation_func)(
            mm(xrh, "w_cand") + ctx.param(self, "b_cand"))
        return (1.0 - z) * h + z * cand


@register_node_class
class LSTM(Node):
    """LSTM cell: one step. ``memory_state`` carries [h, c] concatenated
    (2*n_f features); the output likewise carries [h_new, c_new] — split
    with ``node_basic.split`` to use h alone.

    Reference: ``neural.py::LSTM``.
    """

    def __init__(self, parent, memory_state, n_f, activation_func="tanh",
                 name="lstm", print_repr=True):
        super().__init__([parent, memory_state], name, print_repr)
        self.n_f = int(n_f)
        self.activation_func = _validate_cell_activation(activation_func)
        f_in = parent.shape["f"]
        if memory_state.shape["f"] != 2 * self.n_f:
            raise ValueError("LSTM memory_state must carry 2*n_f features "
                             "([h, c] concatenated)")
        self.shape = memory_state.shape.copy()
        rng = self._gm.init_rng()
        self.register_param("w", init_weight(
            rng, (f_in + self.n_f, 4 * self.n_f), "sig"))
        b = np.zeros(4 * self.n_f, floatX)
        b[self.n_f:2 * self.n_f] = 1.0  # forget-gate bias
        self.register_param("b", b, wd_mult=0.0)

    def _compute(self, ctx, x, hc):
        h, c = jnp.split(hc, 2, axis=-1)
        xh = jnp.concatenate([x, h], axis=-1)
        cd = ctx.compute_dtype      # matmul in bf16, f32 cell state
        xhm = xh.astype(cd) if cd is not None else xh
        z = jnp.dot(xhm, ctx.param(self, "w").astype(xhm.dtype),
                    preferred_element_type=xhm.dtype)
        z = (z.astype(jnp.float32) if cd is not None else z) \
            + ctx.param(self, "b")
        i, f, g, o = jnp.split(z, 4, axis=-1)
        act = get_activation(self.activation_func)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * act(g)
        h_new = jax.nn.sigmoid(o) * act(c_new)
        return jnp.concatenate([h_new, c_new], axis=-1)
