"""Dense (whole-volume) inference: overlap-tiled MFP sweep.

Reference: ``elektronn2/neuromancer/node_basic.py::Node.predict_dense`` +
``elektronn2/utils/cnncalculator.py`` geometry (SURVEY.md §4.B call stack):
choose tiles, run the compiled predict function per tile, restitch MFP
fragments, write into the big output map.

TPU-first redesign: fragment restitching happens ON DEVICE inside the jitted
tile function (one fused program per tile); tiles can be batched along the
batch axis to keep the MXU fed; host work is only slicing the source volume
and writing finished dense tiles into the output buffer.
"""

from __future__ import annotations

import itertools

import numpy as np
import jax

from elektronn2_tpu.log import logger


# default slab-size candidates for tune_sweep on 3D graphs: the
# sweep_knossos default plus the larger slab that measured fastest for the
# flagship net on v5e (BASELINE.md r2; 112x496x496 is the r2 s9 Pallas
# tail-conv champion geometry — 496-xy keeps the kernel's conv lanes at
# exact 128 multiples)
DEFAULT_TUNE_STEPS_3D = ((64, 384, 384), (96, 512, 512), (112, 496, 496),
                         (128, 512, 512))


class UnsupportedGraphError(ValueError):
    """Structural: this graph can never take the fused path (safe to
    negative-cache). State/shape-dependent failures raise plain
    ValueError and must NOT be cached — they may succeed later (BN stats
    arrive, a bigger volume comes in)."""


def _valid_period(pred, nsp):
    """Valid-size period per spatial dim: the largest cumulative stride
    anywhere in ``pred``'s graph. Input extents are shift-equivariantly
    valid in steps of M, so slab staging, pad_raw front pads and tuner
    step grids must all stay M-phase-aligned (one shared definition —
    a desynchronised copy silently phase-shifts the pooling grid)."""
    M = [1] * nsp
    for node in pred.all_parents():
        st = getattr(node.shape, "strides", None)
        if st is not None and len(st) == nsp:
            M = [max(m, int(s)) for m, s in zip(M, st)]
    return M


def _check_dense_geometry(pred):
    """Nodes whose alignment TaggedShape cannot express (padding makes the
    centred-fov model lie) are rejected for dense sweeps."""
    from elektronn2_tpu.neuromancer.neural import Pad
    for node in pred.all_parents():
        if isinstance(node, Pad):
            raise ValueError(
                f"dense prediction over a graph containing Pad node "
                f"{node.name!r} is unsupported: padding breaks the "
                "valid-mode fov/offset bookkeeping that tile alignment "
                "relies on")


def _functor_spatially_elementwise(node, n_ch):
    """Numerically probe whether an ApplyFunc functor is pointwise across
    SPACE (channel mixing is fine — e.g. a per-voxel softmax). The dilated
    dense path evaluates functors on full-resolution à-trous arrays (and,
    under 's2bg', on phase-decimated sub-volumes); that is only equivalent
    to the reference's fragment semantics when the functor commutes with
    spatial interleaving — i.e. is spatially pointwise. A spatial functor
    (flip/roll/shift/pooling) would silently produce a wrong stitched
    volume (review r2), so it must be rejected here and routed to the
    exact tiled fallback.

    Probe: f(concat(x, y, axis=sp)) == concat(f(x), f(y), axis=sp) for
    each spatial axis, on small random blocks. Elementwise ops satisfy
    this bitwise; spatially-dependent ops fail it (distinct x != y defeat
    symmetric cases like flip). Functors that raise on the probe shapes
    are conservatively rejected. Result is cached on the node.
    """
    cached = getattr(node, "_spatially_elementwise", None)
    if cached is not None:
        return cached
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    # probe at the node's ACTUAL rank: a 2D graph's functors see 4D
    # arrays — probing them with a 5D array would raise inside any
    # rank-sensitive (but genuinely pointwise) functor and wrongly
    # reject it (review r2 pass 2)
    nsp = len(node.parents[0].shape.spatial_axes)
    shape = (1, int(n_ch)) + (3, 4, 5)[-nsp:]  # distinct extents catch
    x = rng.rand(*shape).astype(np.float32)    # transposes
    y = rng.rand(*shape).astype(np.float32)
    ok = True
    try:
        fx = np.asarray(node.functor(jnp.asarray(x), *node.args,
                                     **node.kwargs))
        fy = np.asarray(node.functor(jnp.asarray(y), *node.args,
                                     **node.kwargs))
        if fx.shape[0] != 1 or fx.shape[2:] != x.shape[2:]:
            ok = False                    # spatial/batch shape change
        else:
            for ax in range(2, 2 + nsp):
                fb = np.asarray(node.functor(
                    jnp.asarray(np.concatenate([x, y], axis=ax)),
                    *node.args, **node.kwargs))
                want = np.concatenate([fx, fy], axis=ax)
                if fb.shape != want.shape or not np.allclose(
                        fb, want, rtol=1e-5, atol=1e-6):
                    ok = False
                    break
    except Exception:
        ok = False
    node._spatially_elementwise = ok
    return ok


def _tile_geometry(V, tile_in, g, dense_sp, fov, nsp, L=None):
    """Shared overlap-tiling arithmetic for the host (``predict_dense``)
    and device (``predict_dense_device`` fallback) tiled sweeps. Kept in
    ONE place on purpose: the device path is the oracle-equivalent of the
    host path only while this geometry stays bit-identical (review r2
    s5 — the two previously carried near-verbatim copies).

    ``L`` is the tile-ORIGIN alignment period (default ``g``): decoder
    (UpConv) graphs are shift-equivariant only modulo the valid-size
    period M, so their tile origins must stay on the lcm(g, M) grid — a
    clamped last tile at an off-grid origin phase-shifts its pooling grid
    and disagrees with the whole-volume conv-dense run (found by the r3
    graph fuzzer, seed 6: 5.9e-2 divergence). See ``_origin_period``.

    Returns ``(pad_r, out_total, origins, cov)``: right-alignment padding
    per dim (so the last, clamped tile lands on the L grid — which embeds
    the dense grid, L being a g-multiple), total dense output extents,
    the volume-clamped tile input origins, and ``cov`` — how many leading
    output rows of each tile the stitch may use. FaithlessMerge graphs
    can OVER-produce (per-tile dense extent beyond the valid
    ``(tile-fov)/g+1`` rows, computed from merge-cropped context that
    does not match the whole-volume program); stitching those trailing
    rows exposes them wherever the next tile does not overwrite (r3
    fuzzer campaign, seeds 49/133: up to 4.8e-1 pad_raw divergence), so
    the stitchers must write only ``cov`` rows per tile."""
    L = list(g) if L is None else L
    # R: output extent REQUIRED from the volume as given
    R_req = [(V[d] - fov[d]) // g[d] + 1 for d in range(nsp)]
    # usable rows per tile: over-produced (faithless) rows are excluded
    cov = [max(1, min(dense_sp[d], (tile_in[d] - fov[d]) // g[d] + 1))
           for d in range(nsp)]
    span = []
    single = [False] * nsp   # dims served by ONE origin-0 tile
    for d in range(nsp):
        s = cov[d] * g[d]               # input-units usable extent per tile
        if s >= L[d]:
            # step on the L grid, never past the tile's own coverage
            s = (s // L[d]) * L[d]
        elif R_req[d] > cov[d]:
            # the tile emits less than one phase period of outputs, so
            # L-aligned origins CANNOT cover the volume — and off-grid
            # origins compute a different pooling phase than the
            # whole-volume program (r3 fuzzer campaign, seeds 15/21/35/40:
            # up to 3.4e-1 divergence). Wrong numbers are worse than an
            # error: reject, naming the constraint.
            raise ValueError(
                f"tiled dense sweep: dim {d} produces only {cov[d]} "
                f"usable output row(s) per tile, less than the graph's "
                f"phase period {L[d]} — a decoder patch this small "
                f"cannot tile phase-consistently; use a patch whose "
                f"per-tile output covers >= {L[d]} rows (or serve the "
                f"volume whole)")
        else:
            # one origin-0 tile already covers everything required in
            # this dim — phase-exact as-is; extra clamped origins would
            # write wrong-phase rows, so pin the dim to a single tile
            L[d] = g[d]
            single[d] = True
        span.append(s)
    pad_r = [(L[d] - (V[d] - tile_in[d]) % L[d]) % L[d] for d in range(nsp)]
    Vp = [v + p for v, p in zip(V, pad_r)]
    # coverage guarantee: the farthest tile (origin Vp - tile_in) covers
    # outputs up to (Vp - tile_in)/g + cov - 1, which must reach R_req.
    # Merge-crop-deficit graphs (per-tile dense output smaller than the
    # per-tile valid extent) violate this without extra right padding —
    # the stitch buffer's np.empty tail then leaks garbage (latent
    # pre-r3 bug, exposed by the r3 verify drive). Pad right (reflect,
    # L-aligned) until the last tile reaches R_req.
    for d in range(nsp):
        if single[d]:
            continue
        lack = (R_req[d] - cov[d]) * g[d] - (Vp[d] - tile_in[d])
        if lack > 0:
            extra = -(-lack // L[d]) * L[d]
            pad_r[d] += extra
            Vp[d] += extra
    out_total = [(Vp[d] - fov[d]) // g[d] + 1 for d in range(nsp)]
    n_tiles = [1 if single[d] or not span[d]
               else 1 + max(0, -(-(Vp[d] - tile_in[d]) // span[d]))
               for d in range(nsp)]
    origins = []
    for idx in itertools.product(*[range(n) for n in n_tiles]):
        o = []
        for d in range(nsp):
            # the clamp lands on the L grid because pad_r aligned
            # Vp - tile_in to it; interior origins are span (L-multiple)
            # steps, so every origin keeps the whole-volume pooling phase
            i0 = min(idx[d] * span[d], Vp[d] - tile_in[d])
            o.append((i0 // g[d]) * g[d])
        origins.append(tuple(o))
    # drop duplicate origins (clamping can repeat the last tile)
    seen, uniq = set(), []
    for o in origins:
        if o not in seen:
            seen.add(o)
            uniq.append(o)
    return pad_r, out_total, uniq, cov


def _origin_period(pred, g, nsp):
    """Per-dim tile-origin alignment period for the tiled sweeps.

    MFP graphs (``n_frag > 1``) restitch EVERY pooling phase, so the
    fragment output is fully shift-equivariant and any g-aligned origin is
    exact. Decoder graphs (stride restored by UpConv, ``n_frag == 1``)
    compute one pooling phase only: they are shift-equivariant modulo the
    valid-size period M (max cumulative stride — ``_valid_period``), so
    origins must sit on the lcm(g, M) grid to agree with the whole-volume
    conv-dense program. Plain strided graphs have g == M, where this is a
    no-op."""
    import math
    if pred.shape.n_frag > 1:
        # pure-MFP graphs: fragment restitch covers every pooling phase.
        # HYBRID graphs (MFP pooling AND an UpConv-restored non-MFP leg)
        # are only phase-complete for the MFP'd strides — over-align to
        # lcm(g, M) anyway (always safe: MFP tolerates any origin, the
        # decoder leg needs the M grid — r3 review)
        from elektronn2_tpu.neuromancer.neural import UpConv
        if not any(isinstance(n, UpConv) for n in pred.all_parents()):
            return list(g)
    M = _valid_period(pred, nsp)
    return [math.lcm(int(gd), int(md)) for gd, md in zip(g, M)]


def _pad_raw_front(pred, g, fov, nsp):
    """Front/back reflect-pad extents for the tiled ``pad_raw`` legs, plus
    the post-stitch front trim.

    The natural front pad is the output centre offset ``(fov-1)//2`` — but
    decoder graphs are phase-sensitive (``_origin_period``): an unrounded
    front pad shifts the whole padded volume off the pooling grid and
    decoheres every voxel against the conv-dense ``pad_raw`` leg (which
    already rounds — r3 fuzzer follow-up). So the front pad is rounded UP
    to the origin period where that exceeds the output stride, and the
    surplus ``delta`` is trimmed off the stitched output (``delta`` is
    nonzero only where g == 1, so voxel units == output-grid units)."""
    off = [(f - 1) // 2 for f in fov]
    hi = [f - 1 - o for f, o in zip(fov, off)]
    L = _origin_period(pred, g, nsp)
    lo = [-(-o // l) * l if l > gd else o
          for o, l, gd in zip(off, L, g)]
    delta = [l - o for l, o in zip(lo, off)]
    return lo, hi, delta


def _dense_geometry(pred_shape):
    """(g, n_off, dense_sp) for a prediction TaggedShape: per-dim dense
    stride after stitching, fragment-offset counts, and per-tile dense size."""
    from elektronn2_tpu.ops.mfp import _interleave_geometry
    nsp = len(pred_shape.spatial_axes)
    if pred_shape.n_frag > 1:
        g, n_off, _ = _interleave_geometry(pred_shape.mfp_offsets)
    else:
        g = [int(s) for s in pred_shape.strides]
        n_off = [1] * nsp
    dense_sp = [k * n for k, n in zip(pred_shape.spatial_shape, n_off)]
    return g, n_off, dense_sp


def dilated_dense_forward(model, vol, batch=False, halo_axis=None,
                          params=None, state=None, impl=None,
                          quant_scale_axes=None, quant_shard=None,
                          quant_calibrate=None):
    """Dense prediction via the à-trous (dilated convolution) identity.

    MFP (fragment pooling + restitch) computes the network at every pooling
    offset. The mathematically identical TPU-native formulation: run each
    conv with ``rhs_dilation`` = the cumulative pool stride and replace each
    pooling with a stride-1 dilated window max — one big conv per layer over
    the full undecimated volume, keeping the MXU busy, with NO fragment
    batching and NO stitching. Output voxel j == MFP dense output voxel j
    (locked by tests/test_inference_device.py against predict_dense).

    Supports graphs of Conv/Pool/Softmax/Concat/elementwise nodes. Raises
    ``ValueError`` for unsupported node types (caller falls back to tiling).
    ``vol``: (f, Z, X, Y) or, with ``batch=True``, (b, f, Z, X, Y).

    With ``halo_axis`` set (inside ``shard_map`` over a z-sharded volume),
    every conv/pool first fetches its ``dilation·(k-1)`` halo slabs from the
    next rank via ``lax.ppermute`` — spatial context parallelism for the
    dense sweep (see ``predict_dense_sharded``). Each rank's output keeps
    z_local rows; the global trailing ``fov_z - 1`` rows are invalid and
    are trimmed by the caller.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from elektronn2_tpu.neuromancer import neural, loss as loss_mod
    from elektronn2_tpu.neuromancer.node_basic import Input
    from elektronn2_tpu.ops.conv import (conv as ops_conv, conv_s2b,
                                         conv_ztap, pool_s2b,
                                         apply_activation, quantized_conv)

    # dilated-op lowering: 'direct' = rhs_dilation / window_dilation;
    # 's2b' = space-to-batch around EVERY op (phases batched, undilated
    # ops); 's2bg' = GLOBAL space-to-batch — split ONCE where the dilation
    # reaches its final plateau (after the last pool), run the whole tail
    # (where ~95% of the FLOPs live for pool-early EM nets) as plain
    # undilated convs on the phase batch, merge ONCE at the output. All
    # exactly equivalent (tests); which is faster is hardware/XLA-version
    # dependent (bench A/Bs them). Halo-sharded runs always use 'direct'.
    impl = impl or getattr(model, "_dilated_impl", "direct")
    if impl not in ("direct", "s2b", "s2bg"):
        raise ValueError(f"unknown dilated impl {impl!r}")
    nsp_in = len(model.input_node.shape.spatial_axes)
    want = nsp_in + (2 if batch else 1)
    if vol.ndim != want:
        raise ValueError(
            f"dilated_dense_forward(batch={batch}) expects a "
            f"{want}-d volume ({'(b, f' if batch else '(f'}"
            f"{', Z' if nsp_in == 3 else ''}, X, Y) for this "
            f"{nsp_in}-d model), got shape {tuple(vol.shape)}")
    use_s2b = impl == "s2b" and halo_axis is None
    use_s2bg = impl == "s2bg" and halo_axis is None
    # kz=1 convs as 2D convs with z in the conv batch dim (XLA's small-Cin
    # 3D conv lowering is pathological — docs/tpu_performance.md r2 study)
    use_zfold = (bool(getattr(model, "_dilated_zfold", False))
                 and halo_axis is None and not use_s2b)
    pred = model.prediction_node
    inp = model.input_node
    nsp = len(inp.shape.spatial_axes)
    # kz>1 convs as a f32-accumulated sum of z-shifted 2D convs (the
    # tail convs hold ~92% of the sweep FLOPs in s2bg mode; measured 15%
    # faster than XLA's 3D conv at that shape — scripts/exp_tail_conv.py)
    ztap_mode = getattr(model, "_dilated_ztap", False)
    if ztap_mode is True:
        ztap_mode = "native"
    use_ztap = (bool(ztap_mode)
                and halo_axis is None and not use_s2b and nsp == 3)
    # z-major activation layout (B, Z, C, X, Y): every kz=1 conv folds to a
    # big-batch 2D conv and every kz>1 conv z-tap-decomposes via SLICES —
    # all the fold/unfold transposes of zfold/ztap become free reshapes
    # (docs/tpu_performance.md r2 study: the residual dense-path cost is
    # layout traffic, not arithmetic)
    use_zmajor = (bool(getattr(model, "_dilated_zmajor", False))
                  and halo_axis is None and not use_s2b and nsp == 3)
    if use_zmajor and not ztap_mode:
        ztap_mode = "native"
    cdtype = getattr(model, "_compute_dtype", None)
    # int8 quantised serving (set_compute_dtype('int8')): convs run
    # through ops.conv.quantized_conv (per-channel weight + dynamic
    # activation scales, int32 accumulation); everything between convs
    # stays f32, so cdtype-based casting is disabled here.
    # ``quant_calibrate``: a dict to fill with per-conv input max-abs —
    # the forward then runs plain f32 (eager calibration pass backing
    # Model.calibrate_int8's STATIC scales, which make slab sweeps
    # seam-free and shard-invariant by construction).
    quant = cdtype == "int8" and quant_calibrate is None
    qscales = getattr(model, "_quant_scales", None) if quant else None
    if quant or quant_calibrate is not None:
        if use_ztap or use_zmajor:      # set_* guards this; belt+braces
            raise ValueError("int8 serving: ztap/zmajor unsupported")
        cdtype = None
    # cumulative z rows consumed before each node's input — under halo
    # sharding the last rank's trailing rows past the global valid extent
    # hold zero-halo garbage; they must be masked OUT of the dynamic
    # activation max or the quantisation scale differs from the unsharded
    # program's (review r2 s5: reproduced 1e-2 divergence)
    zcons = {}
    # inter-layer activation STORAGE dtype (set_compute_dtype(
    # activations=True)): bf16 mode stores in cdtype (bit-identical for
    # conv/pool/relu chains: conv outputs are already cdtype-rounded since
    # the operands are); int8 mode stores in bf16 (convs still quantise to
    # int8; epilogues still evaluate f32 before the store — without this
    # the int8 program's inter-layer buffers are full f32, WIDER than the
    # bf16 serving mode's, which pushed the 96-z slab 216 MB past v5e HBM:
    # measured OOM, r2 s6). Halves inter-layer HBM traffic either way.
    sdtype = None
    if bool(getattr(model, "_compute_act", False)):
        if quant:
            sdtype = jnp.bfloat16
        elif cdtype is not None:
            sdtype = cdtype
    act_e2e = sdtype is not None
    # params/state must be passed as traced ARGUMENTS by cached jit wrappers
    # (closing over model.params would bake stale weights in as constants)
    params = model.params if params is None else params
    state = model.state if state is None else state

    # channel axis of internal activations (z-major keeps (B, Z, C, X, Y))
    ch_ax = 2 if use_zmajor else 1

    def _bn_affine(node, y, model):
        """Eval-mode BatchNorm is a per-channel affine (running stats) —
        position-independent, hence identical in the dilated domain."""
        import jax.numpy as jnp
        st = state.get(node.name)
        if st is None:
            raise ValueError("dilated dense path: BatchNorm without "
                             "trained running statistics")
        shape = [1] * (nsp + 2)
        shape[ch_ax] = -1
        shape = tuple(shape)
        gamma = params[node.name]["bn_gamma"].reshape(shape)
        beta = params[node.name]["bn_beta"].reshape(shape)
        mean = st["mean"].reshape(shape)
        var = st["var"].reshape(shape)
        return gamma * (y - mean) * jax.lax.rsqrt(var + 1e-5) + beta

    x = vol if batch else vol[None]
    if use_zmajor:
        x = x.transpose(0, 2, 1, 3, 4)
    values = {}    # node -> (array, dilation tuple, phase tuple | None)
    vext = {}      # node -> dense-space valid spatial extent (s2bg merge)

    d_max = (1,) * nsp
    if use_s2bg:
        # prepass: the final dilation plateau (dilation only grows along
        # the chain, so every evaluated node's dilation divides this)
        def _dil_of(node, memo):
            if node.name in memo:
                return memo[node.name]
            if isinstance(node, Input):
                d = (1,) * nsp
            else:
                d = _dil_of(node.parents[0], memo)
                if isinstance(node, (neural.Conv, neural.Pool)):
                    pool = getattr(node, "pool_shape", None)
                    if pool is not None and any(p > 1 for p in pool):
                        d = tuple(a * b for a, b in zip(d, pool))
            memo[node.name] = d
            return d

        d_max = _dil_of(pred, {})
        if all(v == 1 for v in d_max):
            use_s2bg = False            # no pooling: nothing to split
    if use_s2bg:
        from elektronn2_tpu.ops.conv import (_s2b_split, _s2b_merge,
                                             _s2b_split_zmajor)

    def _maybe_split(y, dil, ph):
        """Enter phase space at the dilation plateau (s2bg only)."""
        if use_s2bg and ph is None and dil == d_max:
            if use_zmajor:
                return _s2b_split_zmajor(y, d_max), d_max
            return _s2b_split(y, d_max), d_max
        return y, ph

    def halo(y, n_rows):
        if halo_axis is None or n_rows == 0 or nsp != 3:
            return y
        from elektronn2_tpu.parallel.halo import halo_gather
        return halo_gather(y, n_rows, halo_axis)

    # stride-1 dilated max-pools as shifted-slice maximums instead of
    # reduce_window (re-A/B on the zfold 2D graph; the r1 rejection was
    # measured on the pre-zfold 3D graph)
    use_poolslice = bool(getattr(model, "_dilated_poolslice", False))

    # hand-written Pallas MXU kernel for eligible tail convs (the
    # dense-path hot op) — dilated domain only, f32, unquantised
    use_ptail = (bool(getattr(model, "_dilated_ptail", False))
                 and not use_s2b and not use_zmajor
                 and nsp == 3 and not quant and quant_calibrate is None
                 and cdtype is None and not act_e2e)
    # (batch=True with a size-1 batch still routes to the kernel — the
    # per-node branch checks the actual leading extent; true multi-slab
    # batches fall back to the XLA lowering per conv. Under halo sharding
    # the kernel runs per-shard after the usual z halo_gather, with the
    # xzcy chaining disabled — each conv goes through nczxy so the halo
    # exchange sees the standard layout.)
    xzcy_nodes = set()   # nodes whose cached value is in kernel layout

    def _ptail_node_ok(node):
        """Graph-level eligibility of one Conv for the Pallas tail kernel
        (value-level conditions — ph, dil[0], batch — checked at use)."""
        if not isinstance(node, neural.Conv):
            return False
        w_ = params[node.name]["w"]
        return (w_.ndim == 5 and tuple(w_.shape[2:]) == (3, 3, 3)
                and all(p == 1 for p in node.pool_shape)
                and not node.batch_normalisation
                and node.activation_func == "relu"
                and "alpha" not in node.params)

    def _xzcy_1x1_ok(node):
        """A 1x1x1 Conv (the prediction head) can consume the kernel's
        xzcy layout directly — the expensive 40-channel transpose back to
        nczxy then happens on its FEW-channel output instead."""
        if not isinstance(node, neural.Conv):
            return False
        w_ = params[node.name]["w"]
        return (w_.ndim == 5 and tuple(w_.shape[2:]) == (1, 1, 1)
                and all(p == 1 for p in node.pool_shape))

    def _pool_slices(y, pool, dil, axes):
        """Max over the (stride-1, dilated) pool window as shifted slices:
        elementwise maximums XLA can fuse, vs a reduce_window call."""
        import itertools
        outs = [y.shape[a] - d * (p - 1)
                for a, d, p in zip(axes, dil, pool)]
        acc = None
        for offs in itertools.product(*(range(p) for p in pool)):
            idx = [slice(None)] * y.ndim
            for a, o, d, ext in zip(axes, offs, dil, outs):
                idx[a] = slice(o * d, o * d + ext)
            s = y[tuple(idx)]
            acc = s if acc is None else jnp.maximum(acc, s)
        return acc

    def dilated_pool(y, pool, dil, mode="max"):
        if use_poolslice and mode == "max" and halo_axis is None \
                and not use_s2b:
            if use_zmajor and y.ndim == nsp + 2:
                axes = (1,) + tuple(range(3, y.ndim))   # z, then x/y
            else:
                axes = tuple(range(y.ndim - len(pool), y.ndim))
            return _pool_slices(y, pool, dil, axes)
        if use_zmajor:
            # (B, Z, C, X, Y): the pool window skips the channel axis
            window = (1, pool[0], 1) + tuple(pool[1:])
            wdil = (1, dil[0], 1) + tuple(dil[1:])
            init = -np.inf if mode == "max" else 0
            op = lax.max if mode == "max" else lax.add
            out = lax.reduce_window(y, init, op, window, (1,) * y.ndim,
                                    "VALID", window_dilation=wdil)
            if mode in ("avg", "mean"):
                out = out / np.prod(pool)
            return out
        y = halo(y, dil[0] * (pool[0] - 1) if nsp == 3 else 0)
        if use_s2b:
            return pool_s2b(y, pool, dil, mode=mode)
        window = (1, 1) + tuple(pool)
        wdil = (1, 1) + tuple(dil)
        init = -np.inf if mode == "max" else 0
        op = lax.max if mode == "max" else lax.add
        out = lax.reduce_window(y, init, op, window, (1,) * y.ndim,
                                "VALID", window_dilation=wdil)
        if mode in ("avg", "mean"):
            out = out / np.prod(pool)
        return out

    def evaluate(node):
        if node.name in values:
            return values[node.name]
        if isinstance(node, Input):
            out = (x, (1,) * nsp, None)
            vext[node.name] = ((int(x.shape[1]),) + tuple(
                int(s) for s in x.shape[3:]) if use_zmajor
                else tuple(int(s) for s in x.shape[2:]))
        elif isinstance(node, neural.Conv):
            xin, dil, ph = evaluate(node.parents[0])
            w = params[node.name]["w"]
            b = params[node.name]["b"]
            if quant_calibrate is not None:
                # eager f32 calibration pass: record this conv's input
                # activation max-abs (== what the dynamic path would use)
                quant_calibrate[node.name] = float(jnp.max(jnp.abs(xin)))
            zcons_in = zcons.get(node.parents[0].name, 0)
            xin, ph = _maybe_split(xin, dil, ph)
            if ph is not None and any(p > 1 for p in node.pool_shape):
                raise UnsupportedGraphError(
                    "dilated dense path (s2bg): pooling past the dilation "
                    "plateau — dilation schedule is inconsistent")
            eff_dil = (1,) * nsp if ph is not None else dil
            zcons[node.name] = (
                zcons_in + (eff_dil[0] * (w.shape[2] - 1) if nsp == 3
                            else 0)
                + (dil[0] * (node.pool_shape[0] - 1)
                   if nsp == 3 and any(p > 1 for p in node.pool_shape)
                   else 0))
            v = tuple(s - d * (k - 1)
                      for s, d, k in zip(vext[node.parents[0].name], dil,
                                         w.shape[2:]))
            if use_zmajor:
                # (B, Z, C, X, Y) activations: kz=1 convs FOLD (free
                # reshape) to big-batch 2D convs; kz>1 convs z-tap via
                # contiguous z-SLICES — zero transposes in the whole tail
                kz, dz = w.shape[2], eff_dil[0]
                B2, Z2, C2 = xin.shape[:3]
                sp2 = tuple(xin.shape[3:])
                xi = xin.astype(cdtype) if cdtype is not None else xin
                wc = w.astype(cdtype) if cdtype is not None else w
                if kz == 1:
                    zo = Z2
                    x2 = xi.reshape((B2 * Z2, C2) + sp2)
                    y = ops_conv(x2, wc[:, :, 0], dilation=eff_dil[1:])
                elif ztap_mode == "fatn":
                    # fat-N tap batching: ONE 2D conv computes every
                    # z-tap's contribution (N = Cout·kz MXU lanes instead
                    # of Cout), combined by shifted slab adds —
                    # out[z] = Σ_t c_t[z + t·dz]. Reads the producer once
                    # (no per-tap cast duplication) and triples the MXU
                    # output-lane fill; measured 48.1 vs 65.2 ms isolated
                    # at the champion tail shape (scripts/exp_tail_conv.py)
                    zo = Z2 - dz * (kz - 1)
                    x2 = xi.reshape((B2 * Z2, C2) + sp2)
                    w2 = wc.transpose(2, 0, 1, 3, 4).reshape(
                        (kz * wc.shape[0],) + (C2,) + tuple(wc.shape[3:]))
                    c = ops_conv(x2, w2, dilation=eff_dil[1:])
                    c = c.reshape((B2, Z2, kz, wc.shape[0])
                                  + tuple(c.shape[2:]))
                    y = c[:, 0:zo, 0]
                    for t in range(1, kz):
                        y = y + c[:, t * dz:t * dz + zo, t]
                    y = y.reshape((B2 * zo,) + tuple(y.shape[2:]))
                elif ztap_mode == "conv3d":
                    # ONE lax 3D conv with z-major dimension numbers —
                    # no decomposition, no transposes: XLA's layout
                    # assignment handles the (B, Z, C, X, Y) operand
                    zo = Z2 - dz * (kz - 1)
                    y = lax.conv_general_dilated(
                        xi, wc, window_strides=(1,) * 3, padding="VALID",
                        rhs_dilation=tuple(eff_dil),
                        dimension_numbers=("NDCHW", "OIDHW", "NDCHW"))
                    # (B, zo, Cout, X', Y') → fold for the shared epilogue
                    y = y.reshape((B2 * zo,) + tuple(y.shape[2:]))
                elif ztap_mode == "concat":
                    zo = Z2 - dz * (kz - 1)
                    xz = jnp.concatenate(
                        [lax.slice_in_dim(xi, t * dz, t * dz + zo, axis=1)
                         for t in range(kz)], axis=2)
                    x2 = xz.reshape((B2 * zo, C2 * kz) + sp2)
                    w2 = wc.transpose(0, 2, 1, 3, 4).reshape(
                        (wc.shape[0], C2 * kz) + tuple(wc.shape[3:]))
                    y = ops_conv(x2, w2, dilation=eff_dil[1:])
                else:
                    zo = Z2 - dz * (kz - 1)
                    pet = jnp.float32 if ztap_mode == "f32" else None
                    acc = None
                    for t in range(kz):
                        xt = lax.slice_in_dim(xi, t * dz, t * dz + zo,
                                              axis=1)
                        x2 = xt.reshape((B2 * zo, C2) + sp2)
                        yt = ops_conv(x2, wc[:, :, t],
                                      dilation=eff_dil[1:],
                                      preferred_element_type=pet)
                        acc = yt if acc is None else acc + yt
                    y = acc
                y = y + b.reshape(1, -1, 1, 1)
                if cdtype is not None:
                    y = y.astype(jnp.float32)
                y = y.reshape((B2, zo) + tuple(y.shape[1:]))
                if any(p > 1 for p in node.pool_shape):
                    y = dilated_pool(y, node.pool_shape, dil)
                    v = tuple(s - d * (p - 1)
                              for s, d, p in zip(v, dil, node.pool_shape))
                    dil = tuple(d * p
                                for d, p in zip(dil, node.pool_shape))
            elif (node.parents[0].name in xzcy_nodes
                    and tuple(w.shape[2:]) == (1, 1, 1)):
                # 1x1x1 prediction head on a Pallas-tail xzcy value:
                # contract channels in place (one dot) and transpose the
                # FEW-channel result back to nczxy — ~Cout/Cin the bytes
                # of transposing the tail conv's output first
                Yv = int(vext[node.parents[0].name][-1])
                if xin.ndim == 5:      # batched multi-slab xzcy value
                    y = jnp.einsum("bxzcy,oc->bozxy",
                                   xin[:, :, :, :w.shape[1], :Yv],
                                   w[:, :, 0, 0, 0])
                    y = y + b.reshape(1, -1, 1, 1, 1)
                else:
                    y = jnp.einsum("xzcy,oc->ozxy",
                                   xin[:, :, :w.shape[1], :Yv],
                                   w[:, :, 0, 0, 0])
                    y = (y + b.reshape(-1, 1, 1, 1))[None]
            elif (use_zfold and nsp == 3 and w.shape[2] == 1
                    and node.pool_shape[0] == 1):
                # z never mixes (kz=1, pz=1): fold z into the conv batch
                # dim and run conv+bias+pool as 2D ops, unfold after
                B2, C2, Z2 = xin.shape[:3]
                x2 = xin.transpose(0, 2, 1, 3, 4).reshape(
                    (B2 * Z2, C2) + tuple(xin.shape[3:]))
                w2 = w[:, :, 0]
                if quant:
                    y = quantized_conv(x2, w2, conv_fn=ops_conv,
                                       dilation=eff_dil[1:],
                                       x_absmax=(qscales or {}).get(
                                           node.name))
                elif cdtype is not None:
                    y = ops_conv(x2.astype(cdtype), w2.astype(cdtype),
                                 dilation=eff_dil[1:]).astype(jnp.float32)
                else:
                    y = ops_conv(x2, w2, dilation=eff_dil[1:])
                y = y + b.reshape(1, -1, 1, 1)
                if any(p > 1 for p in node.pool_shape):
                    y = dilated_pool(y, node.pool_shape[1:], eff_dil[1:])
                    v = tuple(s - d * (p - 1)
                              for s, d, p in zip(v, dil, node.pool_shape))
                    dil = tuple(d * p
                                for d, p in zip(dil, node.pool_shape))
                y = y.reshape((B2, Z2) + tuple(y.shape[1:])
                              ).transpose(0, 2, 1, 3, 4)
            elif (use_ptail and ph is None and eff_dil[0] == 1
                    and _ptail_node_ok(node)):
                from elektronn2_tpu.ops.pallas_tailconv import \
                    conv3x3_dilated
                in_xz = node.parents[0].name in xzcy_nodes
                if halo_axis is not None:
                    # SP-sharded sweep: gather this conv's z context from
                    # the next rank, then run the kernel per shard
                    xin = halo(xin, eff_dil[0] * (w.shape[2] - 1))
                # chain in the kernel's native layout when this conv's
                # ONLY consumer is the next eligible tail conv — the
                # inter-conv transposes vanish
                # never emit the kernel-native layout from the designated
                # prediction node itself: its single child may live OFF
                # the evaluated subgraph (e.g. a loss), and the caller
                # expects nczxy (reproduced: (Xo, Zo, Cp, Yp) leaked out)
                kids = [c for c in getattr(node, "children", [])]
                out_xz = (halo_axis is None and node is not pred
                          and len(kids) == 1
                          and (_ptail_node_ok(kids[0])
                               or _xzcy_1x1_ok(kids[0])))
                from elektronn2_tpu.ops.pallas_tailconv import \
                    tail_kernel_kwargs
                ptkw = tail_kernel_kwargs(model._dilated_ptail)

                def _pt_one(x1):
                    return conv3x3_dilated(
                        x1, w, b,
                        dil=(1, int(eff_dil[1]), int(eff_dil[2])),
                        in_layout="xzcy" if in_xz else "nczxy",
                        out_layout="xzcy" if out_xz else "nczxy",
                        valid_y=(int(vext[node.parents[0].name][-1])
                                 if in_xz else None),
                        **ptkw)

                # slab_batch > 1 (batched multi-slab serving): the kernel
                # is single-volume, so run it per slab in a STATIC loop —
                # still ONE dispatch for the whole batch (the dispatch
                # amortisation that slab_batch buys), the kernels just
                # execute sequentially inside it. xzcy chain values carry
                # a leading slab dim ((B, X, Z, C, Yp)).
                if in_xz:
                    xs = ([xin[i] for i in range(int(xin.shape[0]))]
                          if xin.ndim == 5 else [xin])
                else:
                    xs = [xin[i:i + 1] for i in range(int(xin.shape[0]))]
                ys = [_pt_one(x1) for x1 in xs]
                if out_xz:
                    y = (jnp.stack(ys, 0)
                         if (len(ys) > 1 or (in_xz and xin.ndim == 5)
                             or (not in_xz and int(xin.shape[0]) > 1))
                         else ys[0])
                else:
                    y = (jnp.concatenate(ys, 0) if len(ys) > 1
                         else ys[0])
                if out_xz:
                    xzcy_nodes.add(node.name)
                # bias + relu are fused in the kernel; v/dil bookkeeping
                # continues below (no pool on eligible nodes)
            else:
                zl_pre = int(xin.shape[2]) if nsp == 3 else 0
                if nsp == 3:
                    xin = halo(xin, eff_dil[0] * (w.shape[2] - 1))
                if use_ztap and w.shape[2] > 1:
                    cfn = (lambda a, b, dilation:
                           conv_ztap(a, b, dilation=dilation,
                                     accum=ztap_mode))
                else:
                    cfn = conv_s2b if use_s2b else (
                        lambda a, b, dilation: ops_conv(
                            a, b, dilation=dilation))
                if quant:
                    # under sharding the activation scale reduces over
                    # every mesh axis the tensor is split on (pmax) —
                    # per-shard scales would seam the output at shard
                    # boundaries (z) or diverge from the unsharded
                    # batched program (slab batch)
                    sx = (qscales or {}).get(node.name)
                    if sx is None and halo_axis is not None:
                        # dynamic scale under halo sharding: rows past
                        # the global valid extent hold zero-halo garbage
                        # (and pad_z reflect rows the unsharded program
                        # never sees) — mask them out of the max, else
                        # the scale diverges from the unsharded program
                        qi = quant_shard or {}
                        r = lax.axis_index(halo_axis)
                        Zg = zl_pre * int(qi.get("n_z", 1)) \
                            - int(qi.get("pad_z", 0))
                        li = jnp.arange(int(xin.shape[2]))
                        gi = jnp.where(li < zl_pre, r * zl_pre + li,
                                       (r + 1) * zl_pre + (li - zl_pre))
                        msk = (gi < Zg - zcons_in).reshape(
                            (1, 1, -1, 1, 1))
                        sx = jnp.max(jnp.where(msk, jnp.abs(xin), 0.0))
                    y = quantized_conv(xin, w,
                                       conv_fn=(conv_s2b if use_s2b
                                                else ops_conv),
                                       dilation=eff_dil,
                                       axis_name=(quant_scale_axes
                                                  if quant_scale_axes
                                                  is not None
                                                  else halo_axis),
                                       x_absmax=sx)
                elif cdtype is not None:
                    y = cfn(xin.astype(cdtype), w.astype(cdtype),
                            dilation=eff_dil).astype(jnp.float32)
                else:
                    y = cfn(xin, w, dilation=eff_dil)
                y = y + b.reshape((1, -1) + (1,) * nsp)
                if any(p > 1 for p in node.pool_shape):
                    y = dilated_pool(y, node.pool_shape, dil)
                    v = tuple(s - d * (p - 1)
                              for s, d, p in zip(v, dil, node.pool_shape))
                    dil = tuple(d * p for d, p in zip(dil, node.pool_shape))
            if node.batch_normalisation:
                y = _bn_affine(node, y, model)
            alpha = (params[node.name].get("alpha")
                     if "alpha" in node.params else None)
            y = apply_activation(y, node.activation_func, alpha=alpha,
                                 axis=ch_ax)
            if act_e2e:
                y = y.astype(sdtype)     # f32 epilogue, narrow store
            out = (y, dil, ph)
            vext[node.name] = v
        elif isinstance(node, neural.Pool):
            xin, dil, ph = evaluate(node.parents[0])
            if ph is not None:
                raise UnsupportedGraphError(
                    "dilated dense path (s2bg): pooling past the dilation "
                    "plateau — dilation schedule is inconsistent")
            zcons[node.name] = (zcons.get(node.parents[0].name, 0)
                                + (dil[0] * (node.pool_shape[0] - 1)
                                   if nsp == 3 else 0))
            y = dilated_pool(xin, node.pool_shape, dil, mode=node.mode)
            vext[node.name] = tuple(
                s - d * (p - 1) for s, d, p in
                zip(vext[node.parents[0].name], dil, node.pool_shape))
            dil = tuple(d * p for d, p in zip(dil, node.pool_shape))
            out = (y, dil, ph)
        elif isinstance(node, loss_mod.Softmax):
            xin, dil, ph = evaluate(node.parents[0])
            if act_e2e:
                xin = xin.astype(jnp.float32)   # stable f32 softmax
            n_indep = int(getattr(node, "n_indep", 1))
            if n_indep > 1:
                # grouped softmax: independent groups along the f axis
                parts = jnp.split(xin, n_indep, axis=ch_ax)
                y = jnp.concatenate([jax.nn.softmax(p, axis=ch_ax)
                                     for p in parts], axis=ch_ax)
            else:
                y = jax.nn.softmax(xin, axis=ch_ax)
            out = (y, dil, ph)
            vext[node.name] = vext[node.parents[0].name]
        elif isinstance(node, neural.BatchNorm):
            xin, dil, ph = evaluate(node.parents[0])
            y = _bn_affine(node, xin, model)
            if act_e2e:
                y = y.astype(sdtype)
            out = (y, dil, ph)
            vext[node.name] = vext[node.parents[0].name]
        elif isinstance(node, neural.FragmentsToDense):
            out = evaluate(node.parents[0])  # already dense here
            vext[node.name] = vext[node.parents[0].name]
        elif type(node).__name__ == "Dropout":
            out = evaluate(node.parents[0])  # identity in eval mode
            vext[node.name] = vext[node.parents[0].name]
        elif type(node).__name__ in ("Concat",):
            f_ax = node.parents[0].shape.tag2index("f")
            if getattr(node, "axis", f_ax) not in (1, f_ax):
                raise UnsupportedGraphError(
                    "dilated dense path: Concat along a spatial axis is "
                    "unsupported (feature-axis concat only)")
            parts = [evaluate(p) for p in node.parents]
            dils = {p[1] for p in parts}
            if len(dils) != 1:
                raise UnsupportedGraphError(
                    "dilated dense path: Concat parents have "
                    "mismatched dilations")
            dil = parts[0][1]
            ph = None
            # mixed phase states (one branch split, another not yet):
            # bring every parent into phase space before concatenating
            if any(p[2] is not None for p in parts):
                arrs = []
                for a, d, p_ph in parts:
                    a, p_ph = _maybe_split(a, d, p_ph)
                    if p_ph is None:
                        raise UnsupportedGraphError(
                            "dilated dense path (s2bg): Concat parents at "
                            "mismatched phase states")
                    arrs.append(a)
                parts = [(a, dil, d_max) for a in arrs]
                ph = d_max
            out = (jnp.concatenate([p[0] for p in parts], axis=ch_ax),
                   dil, ph)
            vext[node.name] = vext[node.parents[0].name]
        elif type(node).__name__ == "ApplyFunc":
            if not _functor_spatially_elementwise(
                    node, node.parents[0].shape["f"]):
                raise UnsupportedGraphError(
                    f"dilated dense path: ApplyFunc {node.name!r} is not "
                    "spatially pointwise (probe) — its à-trous/"
                    "phase-split evaluation would differ from fragment "
                    "semantics; use the tiled predict_dense path")
            xin, dil, ph = evaluate(node.parents[0])
            if use_zmajor:
                # functors assume the (B, C, *sp) layout contract
                xin = xin.transpose(0, 2, 1, 3, 4)
            y = node.functor(xin, *node.args, **node.kwargs)
            if use_zmajor:
                y = y.transpose(0, 2, 1, 3, 4)
            out = (y, dil, ph)
            vext[node.name] = vext[node.parents[0].name]
        else:
            raise UnsupportedGraphError(
                f"dilated dense path: unsupported node type "
                f"{type(node).__name__}")
        # z-consumption inherits through passthrough nodes (Concat, BN,
        # Softmax, functors…); Conv/Pool set their own entry above.
        # Concat parents share one consumption (same valid extent).
        if node.name not in zcons:
            zcons[node.name] = (zcons.get(node.parents[0].name, 0)
                                if node.parents else 0)
        values[node.name] = out
        return out

    y, dil, ph = evaluate(pred)
    if act_e2e and y.dtype != jnp.float32:
        y = y.astype(jnp.float32)    # callers get f32 prediction maps
    if use_zmajor:
        # back to channel-major for the merge/caller (the prediction map
        # has few channels — this closing transpose is cheap)
        y = y.transpose(0, 2, 1, 3, 4)
    if ph is not None:
        y = _s2b_merge(y, ph, x.shape[0], vext[pred.name])
    return y if batch else y[0]


# node types whose _compute is shape-polymorphic (safe to evaluate on a
# volume larger than the design patch)
_CONV_DENSE_OK = {"Input", "Conv", "UpConv", "Crop", "Pool", "Concat",
                  "FaithlessMerge", "MultMerge", "Softmax", "BatchNorm",
                  "Dropout", "ApplyFunc", "LRN", "FromTensor"}


def check_conv_dense_supported(pred):
    """Raise ValueError unless ``pred``'s graph qualifies for the
    whole-volume convolutional dense path: shape-polymorphic nodes only,
    no MFP fragments, and output stride 1 (a full decoder)."""
    has_upconv = False
    for node in pred.all_parents():
        tname = type(node).__name__
        if tname not in _CONV_DENSE_OK:
            raise ValueError(f"convolutional dense path: unsupported node "
                             f"type {tname}")
        if getattr(node, "mfp", False):
            raise ValueError("convolutional dense path: MFP nodes belong "
                             "to the dilated path")
        has_upconv = has_upconv or tname == "UpConv"
    if not has_upconv:
        raise ValueError("no UpConv in graph: use the dilated path")
    if pred.shape.n_frag > 1 or any(int(s) != 1 for s in pred.shape.strides):
        raise ValueError("convolutional dense path requires output stride 1")


def convolutional_dense_forward(model, vol, params=None, state=None,
                                pad_raw=False, quant_calibrate=None,
                                batch=False):
    """Dense prediction for decoder (U-Net) graphs by whole-volume
    convolutional application.

    A valid-mode encoder/decoder net whose UpConvs restore output stride 1
    is dense *by construction* when applied to a larger input: all its node
    computations are shape-polymorphic, and (the classic overlap-tile
    arithmetic, reference: ``node_basic.py::predict_dense`` geometry +
    U-Net paper §3) crop amounts at skip merges are input-size invariant
    for sizes ``patch + k*M`` (M = bottleneck stride). So: pad the volume
    to the nearest valid size, run the graph ONCE — one fused XLA program,
    convs on the MXU at full width, zero tiling overhead, zero seams —
    and trim to the ``V - fov + 1`` dense-output convention shared with
    the tiled and dilated paths.

    ``vol``: (f, Z, X, Y) (or (f, X, Y) for 2D models). With
    ``batch=True``: (B, f, *sp) — the graph is batch-polymorphic, so B
    slabs of identical extent run as ONE program with the convs batched
    on the MXU batch dim (the conv-dense analog of
    ``dilated_dense_forward(batch=True)``; serves
    ``sweep_knossos(slab_batch=N)`` for decoder graphs). Returns
    (B, f_out, *out_sp).
    """
    import jax.numpy as jnp
    from elektronn2_tpu.neuromancer.node_basic import TraceCtx

    inp, pred = model.input_node, model.prediction_node
    params = model.params if params is None else params
    state = model.state if state is None else state
    nsp = len(inp.shape.spatial_axes)
    if batch:
        if vol.ndim != nsp + 2:
            raise ValueError(
                f"batch=True expects a (B, f, *spatial) volume of rank "
                f"{nsp + 2} for this {nsp}-D graph; got rank {vol.ndim}")
    else:
        if vol.ndim != nsp + 1:
            raise ValueError(
                f"expected a (f, *spatial) volume of rank {nsp + 1} for "
                f"this {nsp}-D graph (batch=True for a slab batch); got "
                f"rank {vol.ndim}")
        vol = vol[None]
    # from here on vol is (B, f, *sp); the graph is batch-polymorphic, so
    # the B slabs run as ONE program with the convs batched on the MXU
    patch0 = [int(s) for s in inp.shape.spatial_shape]
    out0 = [int(s) for s in pred.shape.spatial_shape]
    fov = [int(f) for f in pred.shape.fov]
    # valid-size period per dim: the largest cumulative stride in the graph
    M = _valid_period(pred, nsp)

    V = [int(s) for s in vol.shape[2:]]
    if pad_raw:
        # cover the whole volume: pad the front by the output's centre
        # offset ROUNDED UP to a multiple of M — shift-equivariance only
        # holds for M-multiples, so an unrounded pad would decohere every
        # voxel from the unpadded run — then slice the extent back
        off = [(f - 1) // 2 for f in fov]
        lo = [-(-o // m) * m for o, m in zip(off, M)]
        hi = [f - 1 - o for f, o in zip(fov, off)]
        if any(l + h > v - 1 for l, h, v in zip(lo, hi, V)):
            raise ValueError(f"volume {V} too small for pad_raw reflect pad")
        vol = jnp.pad(vol, [(0, 0), (0, 0)] + [(l, h)
                                               for l, h in zip(lo, hi)],
                      mode="reflect")
        y = convolutional_dense_forward(model, vol, params=params,
                                        state=state,
                                        quant_calibrate=quant_calibrate,
                                        batch=True)
        y = y[(slice(None), slice(None)) + tuple(
            slice(l - o, l - o + v) for l, o, v in zip(lo, off, V))]
        return y if batch else y[0]
    want_out = [v - f + 1 for v, f in zip(V, fov)]
    if any(w < 1 for w in want_out):
        raise ValueError(f"volume {V} smaller than model fov {fov}")
    # FaithlessMerge under-reports fov ("faithless"), so out0 may be less
    # than patch0-fov+1; pad extra so the trimmed output still covers the
    # conventional extent (tail voxels then see reflect-padded context —
    # the tiled path's clamped tiles make the same class of approximation)
    delta = [max(0, (p - f + 1) - o) for p, f, o in zip(patch0, fov, out0)]
    N = []
    for d in range(nsp):
        k = max(0, -(-(V[d] + delta[d] - patch0[d]) // M[d]))
        N.append(patch0[d] + k * M[d])
    pad = [n - v for n, v in zip(N, V)]
    if any(p > v - 1 for p, v in zip(pad, V)):
        raise ValueError(f"volume {V} too small to pad to valid size {N}")
    x = vol
    if any(pad):
        x = jnp.pad(x, [(0, 0), (0, 0)] + [(0, p) for p in pad],
                    mode="reflect")

    ctx = TraceCtx(params, {inp.name: x}, None, train=False,
                   state_in=state, node_index=model._node_index,
                   compute_dtype=getattr(model, "_compute_dtype", None))
    # int8 quantised serving extends to this path because it is
    # whole-volume (one trace, global activation scales — no tile seams);
    # the tiled fallback keeps f32 (see neural.Conv._compute).
    # ``quant_calibrate``: record per-conv input maxima in an EAGER f32
    # pass instead of quantising (Model.calibrate_int8's decoder-graph
    # leg); calibrated scales ride ctx.quant_scales into the conv nodes.
    ctx.quant_serving = (getattr(model, "_compute_dtype", None) == "int8"
                         and quant_calibrate is None)
    ctx.quant_calibrate = quant_calibrate
    ctx.quant_scales = getattr(model, "_quant_scales", None)
    # serving-only op lowerings (Model.set_convdense_impl): exactly
    # equivalent programs, selected per hardware/XLA-version measurement
    ctx.convdense_upconv_d2s = \
        getattr(model, "_convdense_upconv", "dilate") == "d2s"
    ctx.convdense_zfold = bool(getattr(model, "_convdense_zfold", False))
    ctx.convdense_poolslice = bool(
        getattr(model, "_convdense_poolslice", False))
    ctx.convdense_skipsum = bool(
        getattr(model, "_convdense_skipsum", False))
    # Pallas tail-conv kernel for eligible (3,3,3) relu Convs — f32
    # serving only (the kernel's f32 is the measured champion; int8/bf16
    # traces keep the XLA convs), 3D graphs only. Node-level eligibility
    # lives in neural.Conv._compute.
    ctx.convdense_ptail = (
        getattr(model, "_convdense_ptail", False)
        if (nsp == 3 and getattr(model, "_compute_dtype", None) is None
            and quant_calibrate is None)
        else False)
    y = ctx.get(pred)
    if any(int(y.shape[2 + d]) < w for d, w in enumerate(want_out)):
        # the delta pad above assumed the merge-crop deficit is input-size
        # invariant; graphs that merge across scales (e.g. FaithlessMerge
        # of an UpConv with a still-strided encoder map) lose MORE voxels
        # the bigger the input, so the whole-volume run cannot cover the
        # dense-output convention. Raising (at trace time — shapes are
        # static) routes predict_dense_device to the exact tiled fallback
        # instead of silently returning an under-sized map (r3 verify).
        raise ValueError(
            f"convolutional dense path under-produces "
            f"{tuple(int(s) for s in y.shape[2:])} vs the required "
            f"{want_out}: this graph's merge-crop deficit grows with "
            f"input size — use the tiled path")
    y = y[(slice(None), slice(None)) + tuple(slice(0, w)
                                             for w in want_out)]
    return y if batch else y[0]


def predict_dense_sharded(model, vol, mesh, axis_name="space",
                          pad_raw=False):
    """Spatially-sharded dense sweep: the z axis of the volume is split
    across a mesh axis; each conv/pool halo-exchanges over ICI
    (``lax.ppermute``) — the conv analog of ring attention (SURVEY.md §3.7),
    scaling dense inference to volumes larger than one chip's HBM.

    ``vol``: (f, Z, X, Y); Z (after optional fov padding) must be divisible
    by the mesh axis size. Output matches the unsharded dilated sweep
    exactly (tests). 3D models only.
    """
    import jax.numpy as jnp

    if pad_raw:
        pred = model.prediction_node
        fov = [int(f) for f in pred.shape.fov]
        off = [(f - 1) // 2 for f in fov]
        lo = list(off)
        try:
            # decoder graphs are shift-equivariant only modulo the
            # valid-size period M: round the front pad up to M-multiples
            # and trim the surplus after (same convention as the
            # conv-dense pad_raw leg — an unrounded pad phase-shifts the
            # pooling grid and decoheres every voxel)
            check_conv_dense_supported(pred)
            M = _valid_period(pred, len(fov))
            lo = [-(-o // m) * m for o, m in zip(off, M)]
        except (ValueError, TypeError):
            pass      # dilated graphs: phase-exact, centred pad suffices
        V = [int(s) for s in vol.shape[1:]]
        pads = [(0, 0)] + [(l, f - 1 - o)
                           for l, o, f in zip(lo, off, fov)]
        vol = jnp.pad(vol, pads, mode="reflect")
        y = predict_dense_sharded_batch(model, vol[None], mesh,
                                        axis_name=axis_name,
                                        batch_axis=None)[0]
        return y[(slice(None),) + tuple(
            slice(l - o, l - o + v) for l, o, v in zip(lo, off, V))]
    # single-slab case of the batched sharded sweep (review r2 pass 2:
    # the two paths duplicated the pad/shard_map/trim/cache logic)
    return predict_dense_sharded_batch(model, vol[None], mesh,
                                       axis_name=axis_name,
                                       batch_axis=None)[0]


def _sharded_batch_convdense(model, vols, mesh, axis_name, batch_axis):
    """``predict_dense_sharded_batch``'s decoder-graph leg: z-sharded
    conv-dense serving by INPUT-level halo exchange.

    Decoder (UpConv) graphs for anisotropic EM data pool only in x/y, so
    their z receptive field is exactly ``fov_z`` — each rank fetches
    ``fov_z - 1`` z-rows from its successor ONCE (``halo_gather`` over
    ICI) and then runs the whole local conv-dense program independently
    (valid in z). Exactly equal to the unsharded batched run (tests):
    per-conv halo exchange is unnecessary because no z stride ever
    coarsens the z grid. Graphs that pool/stride in z (M_z > 1) or whose
    FaithlessMerge under-covers z (delta_z > 0 — per-rank reflect pads
    would decohere interior voxels) are rejected as unsupported.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from elektronn2_tpu.parallel.halo import halo_gather

    inp, pred = model.input_node, model.prediction_node
    nsp = len(inp.shape.spatial_axes)
    if nsp != 3 or vols.ndim != 5:
        raise ValueError("sharded conv-dense serving expects a 3D model "
                         f"and (B, f, Z, X, Y) volumes; got rank "
                         f"{vols.ndim}")
    fov = [int(f) for f in pred.shape.fov]
    patch0 = [int(s) for s in inp.shape.spatial_shape]
    out0 = [int(s) for s in pred.shape.spatial_shape]
    M_z = _valid_period(pred, nsp)[0]
    delta_z = max(0, (patch0[0] - fov[0] + 1) - out0[0])
    if M_z != 1 or delta_z:
        raise UnsupportedGraphError(
            f"z-sharded conv-dense serving requires an unpooled z axis "
            f"(M_z={M_z}) and full z fov coverage (delta_z={delta_z}); "
            "this graph needs per-rank z padding that would decohere "
            "voxels from the unsharded run — use per-slab unsharded "
            "sweeps")
    if getattr(model, "_compute_dtype", None) == "int8" \
            and not getattr(model, "_quant_scales", None):
        raise ValueError(
            "z-sharded int8 conv-dense serving needs calibrated static "
            "activation scales (Model.calibrate_int8) — dynamic per-rank "
            "scales would seam values at shard boundaries "
            "(sweep_knossos auto-calibrates on its first slab)")
    n = mesh.shape[axis_name]
    if batch_axis is not None and vols.shape[0] % mesh.shape[batch_axis]:
        raise ValueError(f"slab batch {vols.shape[0]} not divisible by "
                         f"mesh axis {batch_axis!r}="
                         f"{mesh.shape[batch_axis]}")
    Z = int(vols.shape[2])
    pad_z = (n - Z % n) % n
    if pad_z:
        vols = jnp.pad(vols, [(0, 0), (0, 0), (0, pad_z), (0, 0), (0, 0)],
                       mode="reflect")
    z_loc = (Z + pad_z) // n
    # the local trace must not need z padding: local input z (shard +
    # halo) has to reach the design patch's z extent
    if z_loc + fov[0] - 1 < patch0[0]:
        raise ValueError(
            f"local z shard {z_loc} (+{fov[0] - 1} halo) is smaller than "
            f"the model's z patch {patch0[0]}: per-rank padding would "
            f"decohere the output — use fewer z shards or taller slabs")

    key = ("sharded_batch_conv", mesh, axis_name, batch_axis,
           tuple(int(s) for s in vols.shape), Z)
    run = model._dilated_fns.get(key)
    if run is None:
        shard_fn = jax.shard_map(
            lambda p, s, v: convolutional_dense_forward(
                model, halo_gather(v, fov[0] - 1, axis_name),
                batch=True, params=p, state=s),
            mesh=mesh,
            in_specs=(P(), P(), P(batch_axis, None, axis_name, None, None)),
            out_specs=P(batch_axis, None, axis_name, None, None),
            check_vma=False)

        @jax.jit
        def run(p, s, v):
            y = shard_fn(p, s, v)
            return y[:, :, :Z - fov[0] + 1]   # trim invalid z tail

        sh_keys = [k for k in model._dilated_fns
                   if isinstance(k, tuple) and k
                   and k[0] == "sharded_batch_conv"]
        if len(sh_keys) >= 4:                 # ragged shapes: FIFO-bound
            model._dilated_fns.pop(sh_keys[0])
        model._dilated_fns[key] = run

    return run(model.params, model.state, vols)


def predict_dense_sharded_batch(model, vols, mesh, axis_name="space",
                                batch_axis="data"):
    """DP×SP dense serving: a BATCH of slabs sharded over ``batch_axis``
    while each slab's z extent is sharded over ``axis_name`` (halo
    exchange over ICI) — the two-axis composition of
    ``predict_dense_sharded`` (SP) and ``sweep_knossos(slab_batch=N)``
    (serving DP). Output matches the unsharded batched sweep exactly
    (tests, virtual CPU mesh).

    ``vols``: (B, f, Z, X, Y); B must be divisible by the ``batch_axis``
    mesh size (z is reflect-padded to a multiple of the ``axis_name``
    size internally). ``batch_axis=None`` leaves the batch dim unsharded
    (``predict_dense_sharded`` is the B=1 case of this). 3D models only.

    Decoder (UpConv) graphs route to the conv-dense leg automatically
    (input-level z halo + local whole-volume trace —
    ``_sharded_batch_convdense``); the dilated leg below serves
    everything else.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    try:
        check_conv_dense_supported(model.prediction_node)
        is_decoder = True
    except (ValueError, TypeError):
        is_decoder = False
    if is_decoder:
        return _sharded_batch_convdense(model, vols, mesh, axis_name,
                                        batch_axis)
    _check_dense_geometry(model.prediction_node)
    n = mesh.shape[axis_name]
    if batch_axis is not None:
        b = mesh.shape[batch_axis]
        if vols.shape[0] % b:
            raise ValueError(f"slab batch {vols.shape[0]} not divisible "
                             f"by mesh axis {batch_axis!r}={b}")
    fov = list(model.prediction_node.shape.fov)
    Z = vols.shape[2]
    pad_z = (n - Z % n) % n
    if pad_z:
        vols = jnp.pad(vols, [(0, 0), (0, 0), (0, pad_z), (0, 0), (0, 0)],
                       mode="reflect")

    key = ("sharded_batch", mesh, axis_name, batch_axis,
           tuple(int(s) for s in vols.shape), int(Z))
    run = model._dilated_fns.get(key)
    if run is None:
        qaxes = ((batch_axis, axis_name) if batch_axis is not None
                 else axis_name)      # int8: global scales over BOTH axes
        qshard = {"n_z": int(mesh.shape[axis_name]), "pad_z": int(pad_z)}
        shard_fn = jax.shard_map(
            lambda p, s, v: dilated_dense_forward(model, v, batch=True,
                                                  halo_axis=axis_name,
                                                  params=p, state=s,
                                                  quant_scale_axes=qaxes,
                                                  quant_shard=qshard),
            mesh=mesh,
            in_specs=(P(), P(), P(batch_axis, None, axis_name, None, None)),
            out_specs=P(batch_axis, None, axis_name, None, None),
            check_vma=False)

        @jax.jit
        def run(p, s, v):
            y = shard_fn(p, s, v)
            return y[:, :, :Z - fov[0] + 1]   # trim invalid z tail

        sh_keys = [k for k in model._dilated_fns
                   if isinstance(k, tuple) and k
                   and k[0] == "sharded_batch"]
        if len(sh_keys) >= 4:                 # ragged shapes: FIFO-bound
            model._dilated_fns.pop(sh_keys[0])
        model._dilated_fns[key] = run

    return run(model.params, model.state, vols)


def sweep_knossos(model, karr, region=None, step=None, out=None,
                  verbose=False, mesh=None, axis_name="space",
                  slab_batch=1, batch_axis="data"):
    """Dense-predict a whole KNOSSOS dataset (or a region of it).

    Reference workflow: ``KnossosArray`` tiles feeding ``predict_dense``
    (SURVEY.md §4.B). Regions of ``step`` voxels (default ~8 Mvox slabs,
    grown by the model fov for seamless stitching) are staged from the
    lazily-loaded dataset, swept ON DEVICE via the dilated path, and
    written into ``out`` (a (f_out, *region_shape) array, allocated if
    None — pass a memory-mapped array for datasets larger than RAM).

    With ``mesh`` set, each slab is swept z-sharded over the mesh axis
    (``predict_dense_sharded``: halo exchange over ICI) — pod-scale
    serving for slabs larger than one chip's HBM. Output matches the
    single-chip sweep exactly (tests).

    ``slab_batch`` (VERDICT r1 #1b): sweep that many slabs per dispatch
    through ``dilated_dense_forward(batch=True)`` — a serving-batch axis
    that helps fill the MXU for narrow nets, with the D2H readback of
    chunk N overlapped against chunk N+1's device compute (JAX async
    dispatch). Falls back to per-slab sweeps for graphs the dilated path
    can't express.

    With BOTH ``mesh`` and ``slab_batch`` set, the sweep composes serving
    DP with spatial CP (``predict_dense_sharded_batch``): the slab batch
    shards over the ``batch_axis`` mesh axis and each slab's z extent
    over ``axis_name`` (halo exchange). ``slab_batch`` must then be a
    multiple of the ``batch_axis`` size; if the mesh has no such axis the
    sweep degrades to per-slab z-sharded dispatches with a warning.
    """
    import jax
    import jax.numpy as jnp

    if region is None:
        region = tuple((0, s) for s in karr.shape[-3:])
    region = [(int(a), int(b)) for a, b in region]
    rshape = [b - a for a, b in region]
    fov = list(model.prediction_node.shape.fov)
    f_out = model.prediction_node.shape["f"]
    # valid-size period M (the largest cumulative stride in the graph):
    # decoder (UpConv) graphs are shift-equivariant only MODULO M, so
    # every slab must start on the same M-grid as the whole-volume run —
    # the old (fov-1)//2 halo is odd for typical U-Nets, which silently
    # phase-shifted each slab's pooling grid (measured 0.36 max diff vs
    # the whole-volume sweep in f32; review r2 s5 follow-up). Slab
    # origins (multiples of step) and the front halo are therefore
    # rounded to M-multiples; write_back trims the delta. Dilated-path
    # graphs are phase-exact by construction — the extra ≤M-1 halo rows
    # are harmless there.
    M = _valid_period(model.prediction_node, 3)
    if step is None:
        # ptail models default to the measured champion slab (dilated:
        # 496-xy keeps the Pallas kernel's conv lanes at exact 128
        # multiples, 120-z fits v5e HBM — BASELINE.md r2 s9; conv-dense
        # decoder champion: 128x512x512, r2 s14 frontier); otherwise the
        # conservative ~8 Mvox slab. Explicit ``step`` (or ``tune_sweep``)
        # overrides.
        is_convdense = False
        if getattr(model, "_convdense_ptail", False):
            try:
                check_conv_dense_supported(model.prediction_node)
                is_convdense = True
            except (ValueError, TypeError):
                pass
        if is_convdense:
            default = (128, 512, 512)
        elif getattr(model, "_dilated_ptail", False):
            default = (112, 496, 496)
        else:
            default = (64, 384, 384)
        step = [min(r, s) for r, s in zip(rshape, default)]
    if any(int(s) % m for s, m in zip(step, M)):
        step = [min(r, -(-int(s) // m) * m)
                for s, m, r in zip(step, M, rshape)]
        logger.info(f"sweep_knossos: step rounded to the valid-size "
                    f"period {M} -> {step} (slab phase consistency)")
    if out is None:
        out = np.zeros([f_out] + rshape, np.float32)

    halo_lo = [-(-((f - 1) // 2) // m) * m for f, m in zip(fov, M)]
    delta = [h - (f - 1) // 2 for h, f in zip(halo_lo, fov)]
    halo_hi = [f - 1 - (f - 1) // 2 for f in fov]
    origins = [(z0, x0, y0)
               for z0 in range(0, rshape[0], step[0])
               for x0 in range(0, rshape[1], step[1])
               for y0 in range(0, rshape[2], step[2])]
    if not origins:     # degenerate region (a zero-size dimension)
        return out

    def stage(o):
        """Read slab + halo from the backing store, clamped to dataset
        bounds (missing halo at the edges is reflect-padded)."""
        lo_cut = [max(0, -(region[d][0] + o[d] - halo_lo[d]))
                  for d in range(3)]
        sub = [slice(max(0, region[d][0] + o[d] - halo_lo[d]),
                     min(region[d][0] + o[d] + step[d] + halo_hi[d],
                         karr.shape[-3:][d])) for d in range(3)]
        slab = np.asarray(karr[tuple(sub)] if karr.ndim == 3
                          else karr[(slice(None),) + tuple(sub)])
        if slab.ndim == 3:
            slab = slab[None]
        if slab.dtype == np.uint8:
            slab = slab.astype(np.float32) / 255.0
        elif not np.issubdtype(slab.dtype, np.floating):
            # integer datasets (e.g. uint16 KNOSSOS): cast, else the conv
            # would run in integer arithmetic with truncated weights
            slab = slab.astype(np.float32)
        pads = [(0, 0)]
        want = [step[d] + halo_lo[d] + halo_hi[d] for d in range(3)]
        for d in range(3):
            have = slab.shape[1 + d]
            pads.append((lo_cut[d], max(0, want[d] - have - lo_cut[d])))
        if any(p != (0, 0) for p in pads):
            slab = np.pad(slab, pads, mode="reflect")
        return slab

    def write_back(dense, o, i):
        dense = np.asarray(dense)       # materialise (D2H)
        n = [min(step[d], rshape[d] - o[d]) for d in range(3)]
        # dense voxel 0 sits delta rows BEFORE the origin (M-aligned halo)
        out[:, o[0]:o[0] + n[0], o[1]:o[1] + n[1], o[2]:o[2] + n[2]] = \
            dense[:, delta[0]:delta[0] + n[0], delta[1]:delta[1] + n[1],
                  delta[2]:delta[2] + n[2]]
        if verbose:
            logger.info(f"sweep_knossos: slab {i + 1}/{len(origins)}")

    from concurrent.futures import ThreadPoolExecutor

    if getattr(model, "_compute_dtype", None) == "int8" \
            and not getattr(model, "_quant_scales", None):
        # dynamic per-dispatch scales would quantise each slab
        # independently and step values at slab faces — calibrate static
        # scales on the first slab so the whole sweep shares them
        # (seam-free and slab-grid-invariant; Model.calibrate_int8)
        logger.info("sweep_knossos: calibrating int8 activation scales "
                    "on the first slab (static scales — seam-free)")
        try:
            model.calibrate_int8(stage(origins[0]))
        except Exception as e:   # noqa: BLE001 — degrade, don't die:
            # the eager single-device calibration pass can exhaust HBM
            # on exactly the large sharded slabs --mesh exists for
            # (RESOURCE_EXHAUSTED is not a ValueError; review r2 s6)
            logger.warning(f"sweep_knossos: int8 calibration failed "
                           f"({type(e).__name__}: {e}) — proceeding "
                           f"with dynamic scales")

    use_batch = slab_batch > 1
    if use_batch and mesh is not None:
        if batch_axis not in getattr(mesh, "axis_names", ()):
            logger.warning(
                f"sweep_knossos: slab_batch under a mesh needs a "
                f"{batch_axis!r} mesh axis (have {mesh.axis_names}) — "
                f"falling back to per-slab z-sharded sweeps")
            use_batch = False
        elif slab_batch % mesh.shape[batch_axis]:
            raise ValueError(
                f"slab_batch={slab_batch} must be a multiple of mesh "
                f"axis {batch_axis!r}={mesh.shape[batch_axis]}")
    if use_batch:
        # batched multi-slab sweep: stack ``slab_batch`` staged slabs into
        # the batch axis of ONE dilated dense program. Every slab is
        # reflect-padded to the identical (step + fov - 1) extent by
        # ``stage``, so chunks are uniform and the program compiles once
        # (the final partial chunk repeats its last slab — idempotent
        # writes). The device result of chunk N is materialised only
        # AFTER chunk N+1 is dispatched: JAX async dispatch overlaps the
        # D2H readback + host write with device compute. Under ``mesh``
        # the same loop dispatches the DP×SP sharded program instead.
        if mesh is not None:
            # matches the loop's fn(params, state, slabs) calling
            # convention; the sharded path reads model.params itself at
            # call time (same values) and manages its own jit cache
            def fn(p, s, v):
                return predict_dense_sharded_batch(
                    model, v, mesh, axis_name=axis_name,
                    batch_axis=batch_axis)
        else:
            impl = getattr(model, "_dilated_impl", "direct")
            key = ("sweep_batch", impl, int(slab_batch))
            fn = model._dilated_fns.get(key)
            if fn is None:
                try:
                    # decoder (UpConv) graphs: batched whole-volume
                    # convolutional application (same V-fov+1 output
                    # geometry, so write_back is path-agnostic)
                    check_conv_dense_supported(model.prediction_node)
                    fn = jax.jit(lambda p, s, v:
                                 convolutional_dense_forward(
                                     model, v, batch=True, params=p,
                                     state=s))
                except (ValueError, TypeError):
                    fn = jax.jit(lambda p, s, v: dilated_dense_forward(
                        model, v, batch=True, params=p, state=s,
                        impl=impl))
                model._dilated_fns[key] = fn
        chunks = [origins[i:i + slab_batch]
                  for i in range(0, len(origins), slab_batch)]
        try:
            with ThreadPoolExecutor(max_workers=2) as pool:
                stage_fut = pool.submit(
                    lambda c: [stage(o) for o in c], chunks[0])
                pending = None          # (device result, chunk, base idx)
                done = 0
                for ci, chunk in enumerate(chunks):
                    slabs = stage_fut.result()
                    if ci + 1 < len(chunks):
                        stage_fut = pool.submit(
                            lambda c: [stage(o) for o in c], chunks[ci + 1])
                    slabs = slabs + [slabs[-1]] * (slab_batch - len(slabs))
                    dense_b = fn(model.params, model.state,
                                 jnp.asarray(np.stack(slabs)))
                    if pending is not None:
                        db, pc, base = pending
                        for j, o in enumerate(pc):
                            write_back(db[j], o, base + j)
                        done += len(pc)
                    pending = (dense_b, chunk, done)
                if pending is not None:
                    db, pc, base = pending
                    for j, o in enumerate(pc):
                        write_back(db[j], o, base + j)
            return out
        except UnsupportedGraphError:
            logger.warning("sweep_knossos: graph unsupported by the "
                           "dilated batch path — falling back to per-slab")
        except Exception as e:      # noqa: BLE001 — OOM-graceful serving
            # slab_batch multiplies activation memory; if the batched
            # program exhausts HBM (measured: batch=2 at 64x512x512 slabs
            # OOMs on v5e), degrade to the per-slab sweep instead of
            # killing the run — writes are idempotent, so re-sweeping
            # already-written slabs is safe
            if "RESOURCE_EXHAUSTED" not in str(e) \
                    and "ResourceExhausted" not in str(e):
                raise
            logger.warning(
                f"sweep_knossos: slab_batch={slab_batch} exhausted device "
                f"memory — falling back to per-slab sweeps (use a smaller "
                f"step= or slab_batch for batched serving)")

    # double-buffered host prefetch: slab i+1 is read from disk (one
    # worker thread) while slab i runs on device — the reference's
    # KnossosArray prefetch workers, reduced to the one thread this
    # producer/consumer pattern needs
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(stage, origins[0])
        for i, o in enumerate(origins):
            slab = fut.result()
            if i + 1 < len(origins):
                fut = pool.submit(stage, origins[i + 1])
            if mesh is not None:
                dense = np.asarray(model.predict_dense_sharded(
                    jnp.asarray(slab), mesh, axis_name=axis_name))
            else:
                dense = np.asarray(model.predict_dense_device(
                    jnp.asarray(slab)))
            write_back(dense, o, i)
    return out


def _tune_measure_grid(model, steps, halo, slab_batches, K, configs,
                       apply_cfg, make_fn, row_tag, log_prefix, verbose):
    """The tuner's sustained-measurement scaffolding, shared by BOTH
    ``tune_sweep`` legs (dilated and conv-dense): staging volume
    (OOM-graceful), DOUBLE warm-up, K-dispatch checksum window closed by
    one float() sync, non-finite guard, failure rows. One protocol
    definition — a fix applied to one leg used to silently miss the
    other (review r2 s15).

    Why double warm-up: the first heavy dispatch after a compile carries
    a large one-off runtime/allocator penalty that ONE warm-up call does
    not flush (measured: the first-timed contender read 3-5 Mvox/s where
    its steady state was 40+, systematically penalising whichever config
    ran first — usually the incumbent). Why float() and not an assert:
    the sync that closes the timed region must survive ``python -O``.

    Returns ``(table, structural_stop)`` — ``structural_stop=True`` when
    an UnsupportedGraphError proved no contender can ever run.
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    f_in = int(model.input_node.shape["f"])
    table = []
    for step in steps:
        ext = tuple(s + h for s, h in zip(step, halo))
        for sb in slab_batches:
            sb = max(1, int(sb))
            try:
                vol = jax.random.uniform(jax.random.PRNGKey(0),
                                         (sb, f_in) + ext, jnp.float32)
                float(jnp.sum(vol))
            except Exception as e:   # noqa: BLE001 — OOM-graceful
                table.append({"step": step, "slab_batch": sb,
                              "failed": f"staging: {e}"[:120]})
                continue
            for cfg in configs:
                row = dict(cfg, slab_batch=sb, step=step)
                try:
                    apply_cfg(cfg)
                    fn = make_fn(cfg)
                    out = fn(model.params, model.state, vol)
                    float(jnp.sum(jnp.asarray(out, jnp.float32)))
                    float(jnp.sum(jnp.asarray(          # 2nd warm-up
                        fn(model.params, model.state, vol), jnp.float32)))
                    t0 = _time.perf_counter()
                    acc = jnp.float32(0)
                    for _ in range(K):
                        acc = acc + jnp.sum(jnp.asarray(
                            fn(model.params, model.state, vol),
                            jnp.float32))
                    checksum = float(acc)   # sync closes the window
                    dt = _time.perf_counter() - t0
                    if not np.isfinite(checksum):
                        raise FloatingPointError(
                            f"non-finite checksum ({checksum}) from "
                            f"contender {row}")
                except UnsupportedGraphError:
                    return table, True
                except Exception as e:   # noqa: BLE001 — skip contender
                    row["failed"] = str(e)[:120]
                    table.append(row)
                    continue
                # count VALID output voxels per second (what the sweep
                # writes into ``out`` per slab: the step volume)
                row["mvox_s"] = round(
                    float(np.prod(step)) * sb * K / dt / 1e6, 2)
                table.append(row)
                if verbose:
                    logger.info(f"{log_prefix}: {row_tag(cfg)} "
                                f"slab_batch={sb} step={step}: "
                                f"{row['mvox_s']} Mvox/s")
    return table, False


def _tune_sweep_convdense(model, steps, halo, slab_batches=(1, 2), K=4,
                          include_bf16=True, include_int8=True,
                          lowerings=None, apply=False, verbose=True):
    """``tune_sweep``'s decoder-graph leg: measure the conv-dense serving
    contenders (``Model.set_convdense_impl`` upconv/zfold lowerings ×
    serving dtype × slab geometry × slab batch) with the same sustained
    protocol. ``lowerings``: (upconv, zfold, dtype[, act[, ptail]])
    tuples. int8 runs with the default op lowerings (the quantised conv
    manages its own kernels — upconv/zfold knobs don't apply there)."""
    import jax

    def _cfg(upconv, zfold, dtype, act=False, ptail=False):
        return {"path": "convdense", "upconv": upconv,
                "zfold": bool(zfold), "dtype": dtype, "act": bool(act),
                "ptail": (dict(ptail) if isinstance(ptail, dict)
                          else bool(ptail))}

    if lowerings is None:
        # the r2 s13 study grid (docs/tpu_performance.md): d2s+zfold is
        # the measured v5e champion (+ the s14 Pallas tail-conv contender,
        # measured 2.6-2.9x per-op over lax at decoder shapes); default
        # and single-knob rows kept so regressions on other toolchains
        # surface in the table
        configs = [_cfg("dilate", False, None), _cfg("dilate", True, None),
                   _cfg("d2s", True, None),
                   _cfg("d2s", True, None, ptail=True)]
        if include_bf16:
            configs += [_cfg("d2s", True, "bfloat16")]
        if include_int8:
            configs += [_cfg("dilate", False, "int8", act=True)]
    else:
        configs = [_cfg(*low) for low in lowerings]
    saved = _cfg(getattr(model, "_convdense_upconv", "dilate"),
                 getattr(model, "_convdense_zfold", False),
                 getattr(model, "_compute_dtype", None),
                 act=getattr(model, "_compute_act", False),
                 ptail=getattr(model, "_convdense_ptail", False))
    saved_scales = getattr(model, "_quant_scales", None)
    if saved not in configs:
        configs.insert(0, saved)

    def _apply_cfg(cfg, with_scales=False):
        # dtype cleared FIRST (cross-guards in the setters). Contenders
        # measure with DYNAMIC int8 scales (with_scales=False — the
        # set_compute_dtype call clears calibration); restore/apply
        # reinstate the user's calibration, which stays valid (same
        # params, same graph).
        model.set_compute_dtype(None)
        model.set_convdense_impl(cfg["upconv"], zfold=cfg["zfold"],
                                 ptail=cfg["ptail"])
        model.set_compute_dtype(cfg["dtype"], activations=cfg["act"])
        if with_scales and cfg["dtype"] == "int8":
            model._quant_scales = saved_scales

    def _make_fn(cfg):
        return jax.jit(lambda p, s, v: convolutional_dense_forward(
            model, v, batch=True, params=p, state=s))

    def _tag(cfg):
        return (f"upconv={cfg['upconv']}"
                f"{'+zfold' if cfg['zfold'] else ''}"
                f"{'+ptail' if cfg['ptail'] else ''}"
                f"{'+' + cfg['dtype'] if cfg['dtype'] else ''}"
                f"{'+act' if cfg['act'] else ''}")

    try:
        table, _ = _tune_measure_grid(
            model, steps, halo, slab_batches, K, configs, _apply_cfg,
            _make_fn, _tag, "tune_sweep[convdense]", verbose)
    finally:
        _apply_cfg(saved, with_scales=True)
    ok = [r for r in table if "mvox_s" in r]
    if not ok:
        return {"best": None, "table": table}
    best = max(ok, key=lambda r: r["mvox_s"])
    if apply:
        _apply_cfg(best, with_scales=True)
    if verbose:
        logger.info(f"tune_sweep[convdense]: best {best}")
    return {"best": best, "table": table}


def tune_sweep(model, steps=None, slab_batches=(1, 2), K=4,
               include_bf16=True, include_int8=True, lowerings=None,
               apply=False, verbose=True):
    """Autotune the serving configuration for KNOSSOS sweeps ON THIS device.

    The dense path has several mathematically-equivalent lowerings
    (``Model.set_dilated_impl``: 'direct'/'s2bg', ``zfold``), a bf16
    serving mode (``set_compute_dtype``) and two sweep-shape knobs
    (slab ``step`` size and ``slab_batch``) whose relative speed is
    hardware- and XLA-version-dependent (measured spreads of 2× on v5e —
    docs/tpu_performance.md). This measures every contender on the live
    device with the sustained-dispatch protocol (K back-to-back
    dispatches, ONE sync — the ``sweep_knossos`` serving pattern) and
    returns the fastest, skipping contenders that exhaust device memory
    or fail to compile. The reference tuned this by hand via
    ``scripts/elektronn2-profile`` size sweeps (SURVEY.md §4.E); here it
    is a first-class API (cf. cuDNN algo autotuning / XLA autotuning).

    ``steps``: candidate slab sizes (z, x, y) — defaults to the
    ``sweep_knossos`` default plus the larger slab that measured fastest
    on v5e. ``lowerings``: (impl, zfold, dtype) triples; the default grid
    covers the repo-root ``bench.py`` contenders, PLUS the model's
    incumbent serving config with its FULL knob set (ztap/zmajor/
    poolslice/activation-storage included), so a hand-tuned setup is
    never displaced by an unmeasured "winner". ``apply=True`` leaves the
    winning contender's COMPLETE knob set applied to the model
    (otherwise prior settings are restored); since the incumbent is
    itself a contender, apply never makes the model slower than it was
    as measured.

    Returns ``{"best": {...}, "table": [...]}`` where ``best`` carries
    ``impl``/``zfold``/``dtype``/``slab_batch``/``step``/``mvox_s`` —
    feed ``step`` and ``slab_batch`` straight into ``sweep_knossos``.

    Decoder (UpConv) graphs route to the conv-dense leg automatically:
    the grid is then ``Model.set_convdense_impl``'s upconv/zfold
    lowerings (× dtype × slab geometry; ``lowerings`` triples become
    ``(upconv, zfold, dtype)``) and ``best`` carries ``upconv``/``zfold``
    with ``path='convdense'``. Returns ``best=None`` if no contender ran
    (a graph only the tiled fallback can serve has no lowering knobs).
    """
    import jax

    fov = [int(f) for f in model.prediction_node.shape.fov]
    if steps is None:
        steps = (list(DEFAULT_TUNE_STEPS_3D) if len(fov) == 3
                 else [(256,) * len(fov), (512,) * len(fov)])
    steps = [tuple(int(v) for v in s) for s in steps]
    for s in steps:
        if len(s) != len(fov):
            raise ValueError(f"step {s} has {len(s)} dims; the model "
                             f"graph has {len(fov)} spatial dims")
    # stage EXACTLY like sweep_knossos: steps round up to the valid-size
    # period M and the front halo is M-aligned — otherwise the tuner
    # times programs of different shapes than the sweep will dispatch
    # (review r2 s6)
    Mv = _valid_period(model.prediction_node, len(fov))
    steps = list(dict.fromkeys(
        tuple(-(-v // m) * m for v, m in zip(s, Mv)) for s in steps))
    halo = [-(-((f - 1) // 2) // m) * m + (f - 1 - (f - 1) // 2)
            for f, m in zip(fov, Mv)]
    try:
        check_conv_dense_supported(model.prediction_node)
        is_convdense = True
    except (ValueError, TypeError):
        is_convdense = False
    if is_convdense:
        # decoder (UpConv) graphs: their serving path is the whole-volume
        # convolutional trace, with its own lowering knobs
        # (Model.set_convdense_impl) — tune those instead of the dilated
        # grid (which such graphs cannot express)
        return _tune_sweep_convdense(
            model, steps, halo, slab_batches=slab_batches, K=K,
            include_bf16=include_bf16, include_int8=include_int8,
            lowerings=lowerings, apply=apply, verbose=verbose)
    # contenders carry the FULL serving knob set; the default grid varies
    # impl/zfold/dtype (the headline levers — BASELINE.md r2 table), the
    # rest stay at their fast defaults
    def _cfg(impl, zfold, dtype, ztap=False, zmajor=False, poolslice=False,
             act=False, ptail=False):
        return {"impl": impl, "zfold": bool(zfold), "dtype": dtype,
                "ztap": ztap, "zmajor": bool(zmajor),
                "poolslice": bool(poolslice), "act": bool(act),
                # a dict carries kernel tuning knobs (variant/z_block) —
                # preserve it verbatim (like the non-bool ztap modes) so
                # restore/apply don't silently reset a tuned kernel
                "ptail": (dict(ptail) if isinstance(ptail, dict)
                          else bool(ptail))}

    if lowerings is None:
        configs = [_cfg("direct", False, None), _cfg("s2bg", False, None),
                   # the r2 s9 headline: Pallas tail-conv kernel, f32
                   _cfg("direct", True, None, ptail=True)]
        if include_bf16:
            configs += [_cfg("s2bg", False, "bfloat16"),
                        _cfg("s2bg", True, "bfloat16")]
        if include_int8:
            # quantised serving (distribution-grade — PARITY.md);
            # include_int8=False (like include_bf16=False) restricts the
            # tune to parity-grade f32 lowerings. act=True (bf16
            # inter-layer storage): measured throughput-neutral on v5e
            # (64.3 vs 63.7 Mvox/s) but it halves the inter-layer
            # buffers — plain int8 OOMs at slab sizes the bf16 mode fits
            # (r2 s6 study, docs/tpu_performance.md)
            configs += [_cfg("s2bg", True, "int8", act=True)]
    else:
        configs = [_cfg(*low) for low in lowerings]
    saved = _cfg(getattr(model, "_dilated_impl", "direct"),
                 getattr(model, "_dilated_zfold", False),
                 getattr(model, "_compute_dtype", None),
                 ztap=getattr(model, "_dilated_ztap", False),
                 zmajor=getattr(model, "_dilated_zmajor", False),
                 poolslice=getattr(model, "_dilated_poolslice", False),
                 act=getattr(model, "_compute_act", False),
                 ptail=getattr(model, "_dilated_ptail", False))
    # calibrated int8 activation scales are cleared by every
    # set_compute_dtype call the grid makes — preserve them across the
    # tune (review r2 s5); contenders measure with dynamic scales
    saved_scales = getattr(model, "_quant_scales", None)
    # the incumbent is always measured (first), so a hand-tuned config
    # (e.g. ztap/zmajor from the r2 layout study) competes rather than
    # being silently displaced by apply=True
    if saved not in configs:
        configs.insert(0, saved)

    def _apply_cfg(cfg, with_scales=False):
        # dtype cleared FIRST: the int8↔ztap/zmajor cross-guards in the
        # setters would otherwise reject valid transitions between
        # contenders. Contenders measure with DYNAMIC int8 scales
        # (with_scales=False); restore/apply reinstate the user's
        # calibration, which stays valid (same params, same graph).
        model.set_compute_dtype(None)
        model.set_dilated_impl(cfg["impl"], zfold=cfg["zfold"],
                               ztap=cfg["ztap"], zmajor=cfg["zmajor"],
                               poolslice=cfg["poolslice"],
                               pallas_tail=cfg.get("ptail", False))
        model.set_compute_dtype(cfg["dtype"], activations=cfg["act"])
        if with_scales and cfg["dtype"] == "int8":
            model._quant_scales = saved_scales

    def _make_fn(cfg):
        return jax.jit(lambda p, s, v, _i=cfg["impl"]:
                       dilated_dense_forward(model, v, batch=True,
                                             params=p, state=s, impl=_i))

    def _tag(cfg):
        extras = "".join(f"+{k}" for k in ("zfold", "ztap", "zmajor",
                                           "poolslice", "act", "ptail")
                         if cfg[k])
        return (f"{cfg['impl']}{extras}"
                f"{'+' + cfg['dtype'] if cfg['dtype'] else ''}")

    try:
        table, structural = _tune_measure_grid(
            model, steps, halo, slab_batches, K, configs, _apply_cfg,
            _make_fn, _tag, "tune_sweep", verbose)
        if structural:
            # no contender can ever run on this graph — stop early
            if verbose:
                logger.info("tune_sweep: graph unsupported by the "
                            "dilated path — nothing to tune (the tiled "
                            "fallback has no lowering knobs)")
            return {"best": None, "table": table}
    finally:
        _apply_cfg(saved, with_scales=True)
    ok = [r for r in table if "mvox_s" in r]
    if not ok:
        return {"best": None, "table": table}
    best = max(ok, key=lambda r: r["mvox_s"])
    if apply:
        # apply EXACTLY the measured winner's knob set (the incumbent was
        # a contender, so this never regresses the model as measured)
        _apply_cfg(best, with_scales=True)
    if verbose:
        logger.info(f"tune_sweep: best {best}")
    return {"best": best, "table": table}


def predict_dense_device(model, vol, pad_raw=False, tile_batch=1):
    """Device-resident dense MFP sweep: volume in, dense map out — all HBM.

    ``vol``: (f, Z, X, Y) jnp array already on device. Tiles are cut with
    ``lax.dynamic_slice`` and stitched into a device output buffer; nothing
    crosses the host boundary (the production serving path: in deployment
    the volume is staged into HBM once and swept there; host↔device traffic
    is the non-goal the reference's MFP design also optimised against).
    Returns a device array (f_out, *out_spatial).
    """
    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.ops.mfp import fragments2dense

    inp, pred = model.input_node, model.prediction_node
    _check_dense_geometry(pred)
    nsp = len(inp.shape.spatial_axes)
    tile_in = list(inp.shape.spatial_shape)
    g, n_off, dense_sp = _dense_geometry(pred.shape)
    fov = list(pred.shape.fov)

    # a volume smaller than the fov would flow through the valid-mode
    # dilated convs into a silent 0-size output — reject it up front
    if not pad_raw and any(int(vol.shape[1 + d]) < fov[d]
                           for d in range(nsp)):
        raise ValueError(
            f"volume spatial shape {tuple(vol.shape[1:])} smaller than "
            f"the model fov {tuple(fov)}; pad_raw=True may help")

    # fast path: à-trous dilated formulation (one fused program, no tiling)
    # (a STRUCTURALLY unsupported graph is remembered — without the
    # negative cache a stream of volumes would re-trace just to re-raise
    # every call; state/shape-dependent ValueErrors (missing BN stats,
    # small volumes) are NOT cached since they may succeed later; cleared
    # with _dilated_fns on re-designation)
    if ("dense_unsupported",) not in model._dilated_fns:
        try:
            if pad_raw:
                pads = [(0, 0)] + [((f - 1) // 2, f - 1 - (f - 1) // 2)
                                   for f in fov]
                vol_p = jnp.pad(vol, pads, mode="reflect")
            else:
                vol_p = vol
            impl = getattr(model, "_dilated_impl", "direct")
            fn = model._dilated_fns.get(("dense", impl))
            if fn is None:
                fn = jax.jit(lambda p, s, v: dilated_dense_forward(
                    model, v, params=p, state=s, impl=impl))
                model._dilated_fns[("dense", impl)] = fn
            # NOTE: for models with non-MFP (decimating) pools this is a
            # strict improvement over the host path: genuinely dense
            # stride-1 output where predict_dense nearest-repeats the
            # strided map. Voxels at the strided positions are identical.
            return fn(model.params, model.state, vol_p)
        except UnsupportedGraphError:
            model._dilated_fns[("dense_unsupported",)] = True
        except ValueError:
            pass    # state/shape-dependent: retry next call

    # decoder (U-Net) graphs with stride-1 output: whole-volume
    # convolutional application (seam-free, one fused program)
    if ("conv_unsupported",) not in model._dilated_fns:
        try:
            check_conv_dense_supported(pred)
        except (ValueError, TypeError):
            # graph-level rejection: never eligible → cache the verdict
            model._dilated_fns[("conv_unsupported",)] = True
    try:
        if ("conv_unsupported",) in model._dilated_fns:
            raise TypeError("conv dense path rejected for this graph")
        key = ("conv", tuple(int(s) for s in vol.shape), bool(pad_raw))
        fn = model._dilated_fns.get(key)
        if fn is None:
            fn = jax.jit(lambda p, s, v: convolutional_dense_forward(
                model, v, params=p, state=s, pad_raw=pad_raw))
            # the cache is per volume SHAPE — bound it so a stream of
            # ragged volumes can't grow executables without limit
            conv_keys = [k for k in model._dilated_fns
                         if isinstance(k, tuple) and k and k[0] == "conv"]
            if len(conv_keys) >= 8:
                model._dilated_fns.pop(conv_keys[0])   # FIFO eviction
            model._dilated_fns[key] = fn
        return fn(model.params, model.state, vol)
    except (ValueError, TypeError):
        pass    # shape-dependent failure or rejected graph → tiled fallback

    if getattr(model, "_compute_dtype", None) == "int8" \
            and not getattr(model, "_warned_int8_tiled", False):
        # int8 covers the whole-volume paths only; falling through to the
        # overlap-tiled sweep silently running f32 would let the user
        # believe they are serving quantised (review r2 s5)
        model._warned_int8_tiled = True
        logger.warning(
            "int8 serving requested, but this graph/volume routes to the "
            "overlap-TILED fallback, which runs f32 (per-tile dynamic "
            "scales would seam the stitched output)")
    V_orig = list(vol.shape[1:])
    delta_lo = [0] * nsp
    if pad_raw:
        lo, hi, delta_lo = _pad_raw_front(pred, g, fov, nsp)
        vol = jnp.pad(vol, [(0, 0)] + list(zip(lo, hi)), mode="reflect")
    V = list(vol.shape[1:])
    for d in range(nsp):
        if V[d] < tile_in[d]:
            raise ValueError(
                f"volume dim {d} ({V[d]}) smaller than model patch "
                f"{tile_in[d]}; pad_raw=True may help")
    pad_r, out_total, origins, cov = _tile_geometry(
        V, tile_in, g, dense_sp, fov, nsp, L=_origin_period(pred, g, nsp))
    if any(pad_r):
        vol = jnp.pad(vol, [(0, 0)] + [(0, p) for p in pad_r],
                      mode="reflect")
        V = list(vol.shape[1:])
    f_out = pred.shape["f"]
    tb = max(1, int(tile_batch))
    if len(origins) % tb:   # pad with repeats: same origin → idempotent write
        origins += [origins[-1]] * (tb - len(origins) % tb)
    origins_arr = np.asarray(origins, np.int32).reshape(-1, tb, nsp)

    feed_name = inp.name
    cdtype = getattr(model, "_compute_dtype", None)

    # cache the jitted sweep per (tile batch, padded volume shape) — the
    # tiling geometry is a pure function of those — with params/state as
    # traced ARGUMENTS (re-creating the jit per call would recompile the
    # whole fori_loop program for every volume; closing over params would
    # bake them into the HLO). set_compute_dtype / designate_nodes clear
    # this cache.
    cache_key = ("tiled", tb, tuple(V))
    sweep = model._dilated_fns.get(cache_key)
    if sweep is None:
        def tile_fn(params, state, vol, origin):
            start = jnp.concatenate([jnp.zeros(1, jnp.int32), origin])
            tile = jax.lax.dynamic_slice(vol, start,
                                         (vol.shape[0], *tile_in))
            from elektronn2_tpu.neuromancer.node_basic import TraceCtx
            ctx = TraceCtx(params, {feed_name: tile[None]}, None,
                           train=False, state_in=state,
                           node_index=model._node_index,
                           compute_dtype=cdtype)
            y = ctx.get(pred)
            y = fragments2dense(y, pred.shape.mfp_offsets)[0]
            # only cov rows per tile (parity with the host stitcher):
            # over-produced faithless rows must never be written
            return y[(slice(None),) + tuple(slice(0, c) for c in cov)]

        @jax.jit
        def sweep(params, state, vol, origins):
            out = jnp.zeros((f_out, *out_total), jnp.float32)

            def body(i, out):
                group = origins[i]                   # (tb, nsp)
                dense = jax.vmap(
                    lambda o: tile_fn(params, state, vol, o))(group)
                o_out = group // jnp.asarray(g, jnp.int32)
                for b in range(tb):                  # static unroll
                    out = jax.lax.dynamic_update_slice(
                        out, dense[b], (jnp.int32(0),
                                        *tuple(o_out[b, d]
                                               for d in range(nsp))))
                return out

            return jax.lax.fori_loop(0, origins.shape[0], body, out)

        tiled_keys = [k for k in model._dilated_fns
                      if isinstance(k, tuple) and k and k[0] == "tiled"]
        if len(tiled_keys) >= 8:
            model._dilated_fns.pop(tiled_keys[0])   # FIFO eviction
        model._dilated_fns[cache_key] = sweep

    out = sweep(model.params, model.state, vol, jnp.asarray(origins_arr))
    for d in range(nsp):
        if g[d] > 1:   # align with predict_dense: repeat-upsample strided out
            out = jnp.repeat(out, g[d], axis=1 + d)
    # crop the alignment padding back off (parity with predict_dense);
    # delta_lo trims the phase-rounding surplus of the pad_raw front pad
    keep = [V_orig[d] if pad_raw else V_orig[d] - fov[d] + 1
            for d in range(nsp)]
    return out[(slice(None),) + tuple(slice(dl, dl + k)
                                      for dl, k in zip(delta_lo, keep))]


def predict_dense(model, raw_img, pad_raw=False, as_uint8=False,
                  tile_batch=1, verbose=False, prefer_device=True,
                  device_budget=4 << 30):
    """Predict a dense map over an arbitrarily large volume.

    Parameters mirror the reference: ``raw_img`` is (f, *spatial) or
    (*spatial,); ``pad_raw`` mirror-pads so the output grid covers the whole
    input volume; ``as_uint8`` rescales probabilities to uint8.

    With ``prefer_device`` (default) volumes whose estimated peak footprint
    fits ``device_budget`` bytes are routed through
    ``predict_dense_device`` (the fused dilated / whole-volume
    convolutional paths) — one device program instead of host-stitched
    tiles. Set ``prefer_device=False`` to force the overlap-tiled host
    sweep (the independent oracle the fused paths are tested against).

    Returns (f_out, *out_spatial) numpy; with every pooling MFP'd the output
    stride is 1 (full resolution). Non-unit residual stride g is upsampled by
    nearest-neighbour repetition to full resolution (documented deviation —
    the reference leaves strided outputs strided; the fused dilated path is
    instead genuinely dense, identical at the strided positions).
    """
    inp, pred = model.input_node, model.prediction_node
    if pred is None:
        raise RuntimeError("designate a prediction_node first")
    _check_dense_geometry(pred)
    in_ts = inp.shape
    nsp = len(in_ts.spatial_axes)
    tile_in = list(in_ts.spatial_shape)
    n_ch = in_ts["f"]

    # rank/channel validation + normalisation happens BEFORE any routing so
    # bad inputs get the clear error, not an opaque trace failure
    raw = np.asarray(raw_img)
    if raw.ndim == nsp:
        raw = raw[None]
    if raw.ndim != nsp + 1:
        raise ValueError(f"raw has rank {raw.ndim}, expected {nsp} or "
                         f"{nsp + 1} (f, *spatial)")
    if raw.shape[0] != n_ch:
        raise ValueError(f"raw channels {raw.shape[0]} != model input "
                         f"channels {n_ch}")
    if raw.dtype == np.uint8:
        raw = raw.astype(np.float32) / 255.0
    else:
        raw = raw.astype(np.float32, copy=False)

    if prefer_device:
        # peak footprint ≈ volume × widest feature map × f32 × (in+out live)
        max_f = max([int(n.shape["f"]) for n in pred.all_parents()
                     if n.shape is not None and "f" in n.shape.tags]
                    + [1])
        n_vox = int(np.prod(raw.shape[1:]))
        if n_vox * max_f * 4 * 2 <= device_budget:
            import jax.numpy as jnp
            out = np.asarray(predict_dense_device(
                model, jnp.asarray(raw), pad_raw=pad_raw,
                tile_batch=tile_batch))
            if as_uint8:
                out = np.clip(out * 255.0, 0, 255).astype(np.uint8)
            return out

    g, n_off, dense_sp = _dense_geometry(pred.shape)
    fov = list(pred.shape.fov)
    f_out = pred.shape["f"]

    V_orig = list(raw.shape[1:])
    delta_lo = [0] * nsp
    if pad_raw:
        lo, hi, delta_lo = _pad_raw_front(pred, g, fov, nsp)
        raw = np.pad(raw, [(0, 0)] + list(zip(lo, hi)), mode="reflect")
    V = list(raw.shape[1:])
    for d in range(nsp):
        if V[d] < tile_in[d]:
            raise ValueError(
                f"volume dim {d} ({V[d]}) smaller than model patch "
                f"{tile_in[d]}; pad_raw=True may help")

    # right-align the last tile on the dense grid + enumerate origins
    # (shared with the device tiled path — _tile_geometry)
    pad_r, out_total, origins, cov = _tile_geometry(
        V, tile_in, g, dense_sp, fov, nsp, L=_origin_period(pred, g, nsp))
    if any(pad_r):
        raw = np.pad(raw, [(0, 0)] + [(0, p) for p in pad_r], mode="reflect")
        V = list(raw.shape[1:])

    fn = model._get_predict_fn(pred, dense=True)

    out = np.empty([f_out] + out_total, dtype=np.float32)
    total = len(origins)
    tb = max(1, int(tile_batch))
    for start in range(0, total, tb):
        group = origins[start:start + tb]
        tiles = np.stack([
            raw[(slice(None),) + tuple(slice(o[d], o[d] + tile_in[d])
                                       for d in range(nsp))]
            for o in group])
        if len(group) < tb:  # pad group to keep one compiled shape
            tiles = np.concatenate(
                [tiles, np.repeat(tiles[-1:], tb - len(group), axis=0)])
        dense = np.asarray(fn(model.params, model.state,
                              {inp.name: tiles}))
        for bi, o in enumerate(group):
            o_out = [o[d] // g[d] for d in range(nsp)]
            sl_out, sl_src = [slice(None)], [slice(None)]
            for d in range(nsp):
                # only cov rows per tile: over-produced (faithless) rows
                # are merge-cropped context and must never be stitched
                n = min(cov[d], out_total[d] - o_out[d])
                sl_out.append(slice(o_out[d], o_out[d] + n))
                sl_src.append(slice(0, n))
            out[tuple(sl_out)] = dense[bi][tuple(sl_src)]
        if verbose:
            logger.info(f"predict_dense: {min(start + tb, total)}/{total} tiles")

    if any(gd > 1 for gd in g):
        # residual (non-MFP) stride: upsample to full resolution by
        # nearest-neighbour repetition (documented deviation)
        for d in range(nsp):
            if g[d] > 1:
                out = np.repeat(out, g[d], axis=1 + d)
    # crop the alignment padding back off: the output must cover exactly the
    # original volume (pad_raw) or its valid interior (no padding);
    # delta_lo trims the phase-rounding surplus of the pad_raw front pad
    keep = [V_orig[d] if pad_raw else V_orig[d] - fov[d] + 1
            for d in range(nsp)]
    out = out[(slice(None),) + tuple(slice(dl, dl + k)
                                     for dl, k in zip(delta_lo, keep))]
    if as_uint8:
        out = np.clip(out * 255.0, 0, 255).astype(np.uint8)
    return out
