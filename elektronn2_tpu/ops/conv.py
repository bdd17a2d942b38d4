"""Convolution / pooling / dense primitives on XLA.

Reference: ``elektronn2/neuromancer/computations.py::conv, dot, upconv,
pooling, unpooling, upsampling, maxout, softmax`` (Theano / cuDNN
``dnn_conv3d`` paths). Rebuilt on ``lax.conv_general_dilated`` /
``lax.reduce_window`` so XLA tiles the contraction onto the MXU; layouts are
left to XLA (we pass logical NC+spatial dimension numbers).

Array convention throughout: ``(b, f, *spatial)`` with 1–3 spatial dims,
matching the reference's TaggedShape tag order (b, f, z, x, y).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _dim_numbers(nsp):
    """Logical dimension numbers for (b, f, *spatial) arrays."""
    sp = "DHW"[-nsp:] if nsp <= 3 else None
    if sp is None:
        raise ValueError(f"unsupported spatial rank {nsp}")
    lhs = "NC" + sp
    rhs = "OI" + sp
    return lax.conv_dimension_numbers((1, 1) + (1,) * nsp,
                                      (1, 1) + (1,) * nsp,
                                      (lhs, rhs, lhs))


def conv(x, w, border_mode="valid", stride=None, dilation=None,
         precision=None, preferred_element_type=None):
    """N-D convolution (cross-correlation), valid mode by default.

    x: (b, f_in, *sp); w: (f_out, f_in, *filter). Lowers to one XLA
    convolution → MXU. ``precision`` forwards to lax (None → default;
    use ``lax.Precision.HIGHEST`` for float32 parity tests).
    """
    nsp = x.ndim - 2
    if w.ndim != nsp + 2:
        raise ValueError(f"weight rank {w.ndim} does not match input rank {x.ndim}")
    stride = (1,) * nsp if stride is None else tuple(stride)
    dilation = (1,) * nsp if dilation is None else tuple(dilation)
    if border_mode == "valid":
        pad = "VALID"
    elif border_mode == "same":
        pad = "SAME"
    elif border_mode == "full":
        # reference Theano 'full' convolution: output extends by the full
        # (dilated) kernel footprint minus one on each side
        pad = [(d * (k - 1), d * (k - 1))
               for d, k in zip(dilation, w.shape[2:])]
    else:
        raise ValueError(f"border_mode={border_mode!r}: expected 'valid', "
                         "'same' or 'full'")
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=pad,
        rhs_dilation=dilation, dimension_numbers=_dim_numbers(nsp),
        precision=precision, preferred_element_type=preferred_element_type)


def _s2b_split(x, d, pad_val=0.0):
    """(B, C, *sp) → (B·∏d, C, *(sp//d)): phase sub-volumes folded into the
    batch dim (each phase holds the positions congruent to it mod d).
    Spatial dims are tail-padded to multiples of d first."""
    nsp = x.ndim - 2
    B, C = x.shape[:2]
    pads = [(0, (-s) % dv) for s, dv in zip(x.shape[2:], d)]
    if any(p for _, p in pads):
        x = jnp.pad(x, [(0, 0), (0, 0)] + pads, constant_values=pad_val)
    spp = x.shape[2:]
    split = []
    for s, dv in zip(spp, d):
        split += [s // dv, dv]
    x = x.reshape((B, C) + tuple(split))
    phase_axes = tuple(3 + 2 * i for i in range(nsp))
    keep_axes = tuple(2 + 2 * i for i in range(nsp))
    x = x.transpose((0,) + phase_axes + (1,) + keep_axes)
    return x.reshape((B * int(np.prod(d)), C)
                     + tuple(s // dv for s, dv in zip(spp, d)))


def _s2b_split_zmajor(x, d, pad_val=0.0):
    """``_s2b_split`` for z-major activations: (B, Z, C, X, Y) →
    (B·∏d, Z/dz, C, X/dx, Y/dy), phase order identical to ``_s2b_split``
    (batch index = ((b·dz + pz)·dx + px)·dy + py), so ``_s2b_merge``
    inverts it after a transpose back to channel-major."""
    B, Z, C, X, Y = x.shape
    dz, dx, dy = (int(v) for v in d)
    pads = [(0, (-Z) % dz), (0, 0), (0, (-X) % dx), (0, (-Y) % dy)]
    if any(p for _, p in pads):
        x = jnp.pad(x, [(0, 0)] + pads, constant_values=pad_val)
    Zp, Xp, Yp = x.shape[1], x.shape[3], x.shape[4]
    x = x.reshape(B, Zp // dz, dz, C, Xp // dx, dx, Yp // dy, dy)
    x = x.transpose(0, 2, 5, 7, 1, 3, 4, 6)
    return x.reshape(B * dz * dx * dy, Zp // dz, C, Xp // dx, Yp // dy)


def _s2b_merge(y, d, B, valid):
    """Inverse of ``_s2b_split`` on the op's output: interleave the phases
    back and trim to the true dilated-VALID extent ``valid``."""
    nsp = y.ndim - 2
    C = y.shape[1]
    out_pp = y.shape[2:]
    y = y.reshape((B,) + tuple(d) + (C,) + out_pp)
    inv = (0, 1 + nsp)
    for i in range(nsp):
        inv += (2 + nsp + i, 1 + i)
    y = y.transpose(inv)
    y = y.reshape((B, C) + tuple(o * dv for o, dv in zip(out_pp, d)))
    return y[(slice(None), slice(None))
             + tuple(slice(0, v) for v in valid)]


def conv_s2b(x, w, dilation, precision=None, preferred_element_type=None):
    """Dilated VALID conv via space-to-batch: exactly equivalent to
    ``conv(x, w, dilation=d)``.

    A dilation-d conv mixes only positions congruent mod d, so the volume
    splits into ∏d phase sub-volumes that run UNdilated convs batched
    together — XLA's happiest conv form — and interleave back. Alternative
    lowering for the à-trous dense path (A/B against ``rhs_dilation`` on
    real hardware; some XLA/TPU versions lower rhs_dilation poorly).
    Outputs fed by the divisibility zero-pad lie beyond the valid extent
    and are trimmed by the merge.
    """
    nsp = x.ndim - 2
    d = tuple(int(v) for v in dilation)
    if all(v == 1 for v in d):
        return conv(x, w, precision=precision,
                    preferred_element_type=preferred_element_type)
    B = x.shape[0]
    valid = tuple(s - dv * (kv - 1)
                  for s, dv, kv in zip(x.shape[2:], d, w.shape[2:]))
    y = conv(_s2b_split(x, d), w, precision=precision,
             preferred_element_type=preferred_element_type)
    return _s2b_merge(y, d, B, valid)


def quantized_conv(x, w, conv_fn=None, **kw):
    """int8 serving convolution: per-output-channel symmetric weight
    quantisation + per-tensor dynamic activation quantisation, int8×int8
    MXU with exact int32 accumulation, dequantised f32 output.

    TPU-native serving lever the reference era had no counterpart for:
    v5e's MXU runs int8 at 2× the bf16 peak (394 vs 197 TOP/s), and int8
    operands halve HBM traffic again vs bf16. Scales are dynamic (one
    max-abs reduction per operand, fused by XLA into the producers), so
    no calibration pass is needed; weights round symmetrically per output
    channel (the standard accuracy-preserving granularity). The caller
    adds the bias AFTER dequantisation (exactly as the f32 path does).

    ``conv_fn``: any VALID-conv callable accepting
    ``preferred_element_type`` (``conv``, ``conv_s2b``); extra ``kw``
    (e.g. ``dilation``) forward to it. Accuracy is distribution-grade:
    bound locked by tests (max softmax deviation on the flagship-class
    net) and recorded in PARITY.md next to the bf16 serving mode.

    ``axis_name``: inside ``shard_map`` (spatially-sharded serving), the
    activation max-abs is reduced over that mesh axis (``lax.pmax``) so
    every shard quantises with the GLOBAL scale — per-shard scales would
    seam the stitched volume at shard boundaries. With the global scale
    the sharded int8 output equals the unsharded int8 output exactly
    (tests). ``x_absmax`` overrides the dynamic activation max-abs: the
    sharded dense path passes a masked max (invalid zero-halo tail rows
    excluded — review r2 s5: they polluted the scale), and calibrated
    static scales (``Model.calibrate_int8``) arrive here as constants.

    Weight scales ARE recomputed per dispatch on purpose: these nets
    carry <1 MB of weights vs GBs of activations per sweep, so the
    rounding work and f32 weight reads are noise, and keeping weights as
    plain traced f32 arguments means param updates never retrace the
    serving program.
    """
    axis_name = kw.pop("axis_name", None)
    x_absmax = kw.pop("x_absmax", None)
    conv_fn = conv_fn or conv
    # scale arithmetic stays f32 even for bf16-stored activations
    # (set_compute_dtype('int8', activations=True)): the quantise divide
    # then evaluates in f32 (fused elementwise), only the STORED buffers
    # are narrow
    s_x = (jnp.max(jnp.abs(x)).astype(jnp.float32) if x_absmax is None
           else jnp.asarray(x_absmax, jnp.float32))
    if axis_name is not None:
        s_x = lax.pmax(s_x, axis_name)
    s_x = jnp.maximum(s_x, 1e-12) / 127.0
    red = tuple(range(1, w.ndim))
    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=red), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(w / s_w.reshape((-1,) + (1,) * (w.ndim - 1))),
                  -127, 127).astype(jnp.int8)
    yq = conv_fn(xq, wq, preferred_element_type=jnp.int32, **kw)
    scale = (s_x * s_w).reshape((1, -1) + (1,) * (yq.ndim - 2))
    return yq.astype(jnp.float32) * scale


def conv_ztap(x, w, dilation=None, precision=None, accum="native"):
    """3D VALID conv lowered as a float32-accumulated sum of ``kz``
    z-shifted 2D convs with z folded into the conv batch dim.

    Mathematically ``y[:, :, z] = sum_t conv2d(x[:, :, z + t*dz], w[:, :, t])``
    — exactly the 3D conv, with XLA seeing only its happiest form: a large
    2D batched conv (batch = B·Z_out). Measured on v5e at the dense-sweep
    tail shape (16 phases, 30→40 ch, 3³): 55.1 ms vs 65.1 ms for the lax
    3D conv (scripts/exp_tail_conv.py; docs/tpu_performance.md r2 study).

    ``accum`` selects how the kz taps combine:
      * ``"native"`` — partial outputs in the input dtype, summed as-is
        (one extra rounding per tap in bf16; what the winning isolated
        measurement ran);
      * ``"f32"`` — ``preferred_element_type=float32`` partials summed in
        f32 (no extra rounding, but kz f32-sized intermediate writes —
        measured a net LOSS in-graph at 64×512×512 bf16 serving: the extra
        HBM traffic outweighs the MXU win);
      * ``"concat"`` — z-taps concatenated into channels (Cin·kz) and run
        as ONE 2D conv (single output write, 3× input read).
    Values match ``conv(x, w, dilation=d)`` up to sum reassociation
    (float32: ~1e-6 relative; locked by tests).

    x: (B, C, Z, X, Y); w: (Cout, C, kz, kx, ky); dilation: 3-tuple
    (dz, dx, dy) — z handled by the tap shifts, x/y forwarded to the 2D
    conv. Reference mechanism: SURVEY.md §3.1
    `elektronn2/neuromancer/computations.py::conv` (the dense-path conv).
    """
    nsp = x.ndim - 2
    if nsp != 3 or w.ndim != 5:
        raise ValueError("conv_ztap expects 3D inputs (B, C, Z, X, Y)")
    d = (1, 1, 1) if dilation is None else tuple(int(v) for v in dilation)
    B, C, Z = x.shape[:3]
    Cout, kz = w.shape[0], w.shape[2]
    dz = d[0]
    zo = Z - dz * (kz - 1)
    if accum == "concat":
        xz = jnp.concatenate(
            [lax.slice_in_dim(x, t * dz, t * dz + zo, axis=2)
             for t in range(kz)], axis=1)
        x2 = xz.transpose(0, 2, 1, 3, 4).reshape(
            (B * zo, C * kz) + tuple(x.shape[3:]))
        w2 = w.transpose(0, 2, 1, 3, 4).reshape(Cout, C * kz, *w.shape[3:])
        acc = conv(x2, w2, dilation=d[1:], precision=precision)
    else:
        pet = jnp.float32 if accum == "f32" else None
        acc = None
        for t in range(kz):
            xt = lax.slice_in_dim(x, t * dz, t * dz + zo, axis=2)
            x2 = xt.transpose(0, 2, 1, 3, 4).reshape(
                (B * zo, C) + tuple(x.shape[3:]))
            y = conv(x2, w[:, :, t], dilation=d[1:], precision=precision,
                     preferred_element_type=pet)
            acc = y if acc is None else acc + y
    Xo, Yo = acc.shape[2:]
    return acc.reshape(B, zo, Cout, Xo, Yo).transpose(0, 2, 1, 3, 4)


def pool_s2b(x, pool, dilation, mode="max"):
    """Window-dilated stride-1 pooling via space-to-batch (the dilated
    dense path's pooling form), exactly equivalent to ``reduce_window``
    with ``window_dilation=dilation``."""
    nsp = x.ndim - 2
    d = tuple(int(v) for v in dilation)
    pool = tuple(int(v) for v in pool)
    if all(v == 1 for v in d):
        return pooling(x, pool, mode=mode, stride=(1,) * nsp)
    B = x.shape[0]
    valid = tuple(s - dv * (pv - 1)
                  for s, dv, pv in zip(x.shape[2:], d, pool))
    y = pooling(_s2b_split(x, d, pad_val=-np.inf if mode == "max" else 0.0),
                pool, mode=mode, stride=(1,) * nsp)
    return _s2b_merge(y, d, B, valid)


def upconv(x, w, pool_shape, precision=None, preferred_element_type=None):
    """Transposed convolution ("upconv") with stride = kernel = pool_shape.

    Reference: ``computations.py::upconv`` — used by decoder paths to invert
    a pooling: output spatial size = input * pool. w: (f_out, f_in, *pool).
    Implemented as input dilation (lhs_dilation) so it lowers to a single XLA
    conv; with kernel == stride the outputs tile without overlap.
    """
    nsp = x.ndim - 2
    pool_shape = tuple(int(p) for p in pool_shape)
    # conv_general_dilated with lhs_dilation=p and VALID padding of (p-1) on
    # both sides of the dilated input gives the standard transposed conv.
    pad = [(p - 1, p - 1) for p in pool_shape]
    # w is (f_out, f_in, *pool); flip spatial axes so the op is the true
    # transpose of a forward `conv` with the same kernel
    w_flipped = jnp.flip(w, axis=tuple(range(2, 2 + nsp)))
    return lax.conv_general_dilated(
        x, w_flipped.astype(x.dtype), window_strides=(1,) * nsp, padding=pad,
        lhs_dilation=pool_shape, dimension_numbers=_dim_numbers(nsp),
        precision=precision, preferred_element_type=preferred_element_type)


def upconv_d2s(x, w, pool_shape, precision=None,
               preferred_element_type=None):
    """``upconv`` lowered as 1×1 conv + depth-to-space (pixel shuffle).

    With kernel == stride (always true for UpConv) every output position
    receives exactly ONE kernel tap, so the transposed conv factors into a
    feature matmul to ``f_out·∏pool`` channels followed by a phase
    interleave — zero wasted MACs, where the ``lhs_dilation`` form
    convolves the (∏pool−1)/∏pool zero fraction of the dilated input
    unless XLA rewrites it. Exactly equal to ``upconv`` (bit-identical on
    v5e, tests); measured 82.2 → 64.9 ms at the unet3d decoder's
    whole-volume shape (scripts/exp_convdense_ops.py). Selected for the
    conv-dense serving path via ``Model.set_convdense_impl``.
    """
    nsp = x.ndim - 2
    p = tuple(int(v) for v in pool_shape)
    co, ci = int(w.shape[0]), int(w.shape[1])
    P = int(np.prod(p))
    # (co, ci, *p) → (co·∏p, ci, *1): tap (i1..in) becomes output channel
    # co·∏p + row-major(i); no spatial flip — tap i of a kernel==stride
    # transposed conv lands at output offset i directly
    wm = w.reshape(co, ci, P).transpose(0, 2, 1) \
          .reshape((co * P, ci) + (1,) * nsp)
    y = conv(x, wm, precision=precision,
             preferred_element_type=preferred_element_type)
    b = y.shape[0]
    sp = y.shape[2:]
    y = y.reshape((b, co) + p + tuple(sp))
    perm = [0, 1]
    for i in range(nsp):                    # b co p1..pn s1..sn →
        perm += [2 + nsp + i, 2 + i]        # b co s1 p1 s2 p2 …
    y = y.transpose(perm)
    return y.reshape((b, co) + tuple(s * pv for s, pv in zip(sp, p)))


def conv_zfold2d(x, w, precision=None, preferred_element_type=None):
    """kz=1 3D conv as a 2D conv with z folded into the conv batch dim.

    XLA's small-Cin 3D conv lowering is pathological on TPU (the dilated
    path's ``zfold`` finding, docs/tpu_performance.md); the same fold
    applied at the conv-dense path's whole-volume shapes measured
    55→36 / 70→43 ms (scripts/exp_convdense_ops.py, v5e). Exactly
    equivalent — same contraction, same accumulation order per output.
    """
    b, c, z = x.shape[:3]
    x2 = x.transpose(0, 2, 1, 3, 4).reshape(b * z, c,
                                            x.shape[3], x.shape[4])
    y = conv(x2, w[:, :, 0], precision=precision,
             preferred_element_type=preferred_element_type)
    y = y.reshape(b, z, w.shape[0], y.shape[2], y.shape[3])
    return y.transpose(0, 2, 1, 3, 4)


def dot(x, w, axis=1, precision=None):
    """Feature-axis dense transform: (b, f_in, *sp) @ (f_in, f_out).

    Reference: ``computations.py::dot``. Applied per remaining position
    (equivalent to a 1x1 conv when spatial axes are present) → MXU matmul.
    """
    x_m = jnp.moveaxis(x, axis, -1)
    y = jnp.matmul(x_m, w.astype(x.dtype), precision=precision)
    return jnp.moveaxis(y, -1, axis)


def pooling(x, pool_shape, mode="max", stride=None):
    """Non-overlapping window pooling over the spatial axes.

    Reference: ``computations.py::pooling`` (ignore_border=True semantics:
    trailing elements that do not fill a window are dropped).
    """
    nsp = x.ndim - 2
    pool_shape = tuple(int(p) for p in pool_shape)
    if len(pool_shape) != nsp:
        raise ValueError("pool_shape rank mismatch")
    stride = pool_shape if stride is None else tuple(stride)
    window = (1, 1) + pool_shape
    strides = (1, 1) + stride
    # NOTE: init must be a PYTHON scalar — a traced array prevents JAX from
    # recognising the max/add monoid, breaking autodiff under jit
    if mode == "max":
        op = lax.max
        init = (-np.inf if jnp.issubdtype(x.dtype, jnp.floating)
                else np.iinfo(np.dtype(x.dtype)).min)
    elif mode in ("sum", "avg", "mean"):
        init, op = 0, lax.add
    else:
        raise ValueError(f"unknown pooling mode {mode!r}")
    y = lax.reduce_window(x, init, op, window, strides, "VALID")
    if mode in ("avg", "mean"):
        y = y / np.prod(pool_shape)
    return y


def pooling_slices(x, pool_shape, mode="max"):
    """``pooling`` lowered as elementwise max/sum of STRIDED SLICES
    instead of ``lax.reduce_window`` (r5, VERDICT r4 #1): the wide-graph
    profile shows reduce_window maxpools lowering to select/pad kLoop
    fusions plus layout copies around them; shifted strided slices are
    plain elementwise maxima XLA fuses into neighbours. Exactly
    equivalent for non-overlapping windows incl. the ignore_border
    trailing-drop (the slice limit trims to whole windows).
    """
    import itertools
    nsp = x.ndim - 2
    pool_shape = tuple(int(p) for p in pool_shape)
    if len(pool_shape) != nsp:
        raise ValueError("pool_shape rank mismatch")
    out = None
    for offs in itertools.product(*[range(p) for p in pool_shape]):
        idx = [slice(None), slice(None)] + [
            slice(o, (x.shape[2 + d] // p) * p, p)
            for d, (o, p) in enumerate(zip(offs, pool_shape))]
        piece = x[tuple(idx)]
        if out is None:
            out = piece
        elif mode == "max":
            out = jnp.maximum(out, piece)
        elif mode in ("sum", "avg", "mean"):
            out = out + piece
        else:
            raise ValueError(f"unknown pooling mode {mode!r}")
    if mode in ("avg", "mean"):
        out = out / np.prod(pool_shape)
    return out


def unpooling(x, pool_shape):
    """Nearest-neighbour unpooling (repeat each voxel pool times).

    Reference: ``computations.py::unpooling``.
    """
    for i, p in enumerate(pool_shape):
        x = jnp.repeat(x, p, axis=2 + i)
    return x


upsampling = unpooling  # reference alias


def apply_layer(x, w, b=None, activation=None, pool=None, conv_fn=None):
    """One {conv + bias → pool → activation} layer on a layer-dict stack.

    THE canonical ordering — pooling runs BEFORE the activation, exactly as
    in ``neural.Conv._compute`` (reference semantics; the two only commute
    for monotonic activations). Shared by ``parallel/halo.py`` and
    ``parallel/pipeline.py`` so the layer-list paths cannot drift from the
    node graph. ``conv_fn`` overrides the convolution (e.g. halo-exchanged).
    """
    y = (conv_fn or conv)(x, w)
    if b is not None:
        y = y + b.reshape((1, -1) + (1,) * (y.ndim - 2))
    if pool is not None and any(p > 1 for p in pool):
        y = pooling(y, pool)
    if activation is not None:
        from elektronn2_tpu.ops.activations import get_activation
        y = get_activation(activation)(y)
    return y


def maxout(x, factor, axis=1):
    """Maxout over groups of ``factor`` consecutive feature maps.

    Reference: ``computations.py::maxout``.
    """
    n_f = x.shape[axis]
    if n_f % factor:
        raise ValueError(f"feature count {n_f} not divisible by maxout {factor}")
    new_shape = x.shape[:axis] + (n_f // factor, factor) + x.shape[axis + 1:]
    return jnp.max(x.reshape(new_shape), axis=axis + 1)


def softmax(x, axis=1):
    """Numerically-stable softmax over the feature axis.

    Reference: ``computations.py::softmax``.
    """
    return jax.nn.softmax(x, axis=axis)


def apply_activation(x, activation_func, alpha=None, axis=1):
    """Apply an activation by reference name; see ops.activations.

    ``maxout:k`` reduces features by k; ``prelu`` uses learnable ``alpha``.
    ``axis``: the feature axis (for maxout grouping / prelu broadcasting).
    """
    from elektronn2_tpu.ops.activations import get_activation
    if axis < 0:
        axis += x.ndim
    if isinstance(activation_func, str) and activation_func.startswith("maxout"):
        k = int(activation_func.split(":")[1]) if ":" in activation_func else 2
        return maxout(x, k, axis=axis)
    if activation_func == "prelu":
        if alpha is None:
            raise ValueError("prelu requires alpha parameter")
        shape = [1] * x.ndim
        shape[axis] = -1
        a = alpha.reshape(shape).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)
    return get_activation(activation_func)(x)
