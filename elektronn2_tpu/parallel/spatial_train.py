"""Combined data-parallel × spatial-context-parallel TRAINING.

Scale-out for volumes too large for one chip at training time: the batch is
sharded over a ``data`` mesh axis AND the volume's z axis over a ``space``
axis; every valid conv halo-exchanges with ``lax.ppermute`` (differentiable
— its transpose is the reverse permutation, so gradients flow through the
halos), per-voxel losses are masked to the globally-valid region, and
gradients are ``psum``-reduced over both axes before a replicated optimiser
update. The reference has no distributed training at all (SURVEY.md §3.7);
this is the TPU-native "pod scale-out training" path.

Contract (checked): the model is a 3D conv graph whose loss is
``AggregateLoss`` over one per-voxel loss map; no pooling/filtering along z
may decimate (z-pools must be 1) — x/y pooling is free. The target array
must be padded along z to the INPUT z extent so that shards align 1:1 with
input shards (rows in the pad are masked out of the loss).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from elektronn2_tpu.log import logger
from elektronn2_tpu.neuromancer.node_basic import TraceCtx


def pad_target_for_spatial(target, input_z):
    """Pad a (b, z_out, x, y) target along z to the input z extent (the
    pad rows fall in the masked invalid region)."""
    pad = input_z - target.shape[1]
    if pad <= 0:
        return target
    return np.pad(np.asarray(target),
                  [(0, 0), (0, pad)] + [(0, 0)] * (target.ndim - 2))


def make_spatial_dp_trainstep(model, mesh, data_axis="data",
                              space_axis="space", model_axis=None):
    """Build a jitted DP×SP training-step callable.

    Returns ``step(params, opt_state, state, data, target, hyper, rng) ->
    (loss, params, opt_state, state)``. ``data``: (B, f, Z, X, Y) with B
    divisible
    by the data-axis size and Z by the space-axis size; ``target``:
    (B, Z, X_out, Y_out) int (z-padded, see ``pad_target_for_spatial``).

    ``model_axis`` (3-axis DP×SP×TP): the ``shard_map`` goes manual over
    ``data``/``space`` only (``axis_names``), leaving ``model_axis`` in
    GSPMD's hands — params/optimiser slots are channel-sharded over it
    with the same rule as ``Model.use_mesh(model_axis=...)``, and XLA
    inserts the tensor-parallel collectives inside each manual shard.
    Pass params already placed with ``spatial_tp_shardings`` (or any
    layout; the jit in_shardings repartition them).
    """
    parts = _build_spatial_parts(model, mesh, data_axis, space_axis,
                                 model_axis)
    local_step, sm_kw = parts["local_step"], parts["sm_kw"]
    fov_z = parts["fov_z"]

    shard_step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(),
                  P(data_axis, None, space_axis, None, None),
                  P(data_axis, space_axis, None, None),
                  P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False, **sm_kw)

    jit_kw = {}
    if model_axis is not None:
        psh, osh = spatial_tp_shardings(model, mesh, model_axis)
        repl = NamedSharding(mesh, P())
        jit_kw = dict(in_shardings=(psh, osh, repl, None, None, repl, repl),
                      out_shardings=(repl, psh, osh, repl))

    @partial(jax.jit, **jit_kw)
    def step(params, opt_state, state, data, target, hyper, rng):
        return shard_step(params, opt_state, state, data, target, rng,
                          hyper)

    logger.info(f"spatial DP train step: mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}, "
                f"fov_z={fov_z}")
    return step


def _build_spatial_parts(model, mesh, data_axis, space_axis, model_axis):
    """Validation + the per-rank ``local_step`` shared by the per-step
    and fused (``make_fused_spatial_trainstep``) builders."""
    from elektronn2_tpu.neuromancer.loss import AggregateLoss

    if not isinstance(model.loss_node, AggregateLoss) \
            or len(model.loss_node.parents) != 1:
        raise ValueError("spatial training requires AggregateLoss over one "
                         "per-voxel loss map")
    loss_map_node = model.loss_node.parents[0]
    pred = model.prediction_node
    if len(model.input_node.shape.spatial_axes) != 3:
        raise ValueError("spatial training is for 3D models")
    for node in model.loss_node.all_parents():
        pool = getattr(node, "pool_shape", None)
        if pool is not None and pool[0] != 1:
            raise ValueError(f"node {node.name}: z-pooling is unsupported "
                             "under z-sharding")
        if getattr(node, "mfp", False):
            raise ValueError(f"node {node.name}: MFP training under "
                             "z-sharding is unsupported (train plain, "
                             "infer with predict_dense_sharded)")
        if type(node).__name__ == "FaithlessMerge":
            za = int(node.parents[0].shape.spatial_shape[0])
            zb = int(node.parents[1].shape.spatial_shape[0])
            if za != zb:
                # under z-sharding every halo-exchanged branch keeps
                # z_local rows, so the runtime centre-crop (which pairs
                # rows offset by (za-zb)//2 in the unsharded graph)
                # degenerates to a no-op and silently merges MISALIGNED
                # z rows
                raise ValueError(
                    f"node {node.name}: FaithlessMerge crops z (parent z "
                    f"extents {za} vs {zb}) — z-sharded training would "
                    "pair misaligned skip rows; train unsharded "
                    "(z-sharded SERVING of decoder graphs is supported: "
                    "predict_dense_sharded)")
        if type(node).__name__ == "Crop" \
                and tuple(node.crop[0]) != (0, 0):
            raise ValueError(
                f"node {node.name}: explicit z crop {node.crop[0]} is "
                "unsupported under z-sharding (per-rank crops remove "
                "z_local rows, not the global border)")
        if getattr(node, "batch_normalisation", False) \
                or type(node).__name__ == "BatchNorm":
            # train-mode BN statistics would include the last rank's
            # zero-halo garbage rows (loss masking protects the loss,
            # not the stats) — silently biased normalisation and running
            # stats (review r2 s5); reject instead
            raise ValueError(f"node {node.name}: BatchNorm training "
                             "under z-sharding is unsupported (batch "
                             "stats would include invalid halo rows); "
                             "train unsharded or drop BN")
    fov_z = pred.shape.fov[0]
    n_space = mesh.shape[space_axis]
    n_data = mesh.shape[data_axis]
    opt = model.optimiser
    lr_mults, wd_mults = model._lr_mults, model._wd_mults
    in_name = model.input_node.name
    tgt_name = model.target_node.name
    node_index = model._node_index
    cdtype = model._compute_dtype

    # global mean denominator is STATIC: batch × valid-out-z × out-x × out-y
    b_total = model.input_node.shape["b"]
    z_total = model.input_node.shape.spatial_shape[0]
    lmap_sp = loss_map_node.shape.spatial_shape
    count_global = float(b_total * (z_total - (fov_z - 1))
                         * int(np.prod(lmap_sp[1:])))

    def local_step(params, opt_state, state, data, target, rng, hyper):
        z_loc = data.shape[2]
        r_space = jax.lax.axis_index(space_axis)
        # decorrelate stochastic nodes (dropout) across ranks: the key is
        # replicated in, so fold both mesh coordinates into it — otherwise
        # every batch/z shard draws the identical mask
        if rng is not None:
            rng = jax.random.fold_in(
                jax.random.fold_in(rng, jax.lax.axis_index(data_axis)),
                r_space)
        # globally-valid output rows: z_global < Z_total - (fov_z - 1)
        row = r_space * z_loc + jnp.arange(z_loc)
        valid = (row < z_total - (fov_z - 1)).astype(jnp.float32)

        def loss_fn(train_params):
            # PURELY LOCAL loss (global mean via the static denominator):
            # psum inside the differentiated function would inflate
            # cotangents — its transpose under shard_map is another psum
            merged = {n: {**params.get(n, {}), **train_params.get(n, {})}
                      for n in set(params) | set(train_params)}
            ctx = TraceCtx(merged, {in_name: data, tgt_name: target},
                           rng, train=True, state_in=state,
                           node_index=node_index, compute_dtype=cdtype)
            ctx.halo_axis = space_axis
            lmap = ctx.get(loss_map_node)      # (b_loc, z_loc, x_o, y_o)
            mask = valid.reshape(1, -1, *([1] * (lmap.ndim - 2)))
            new_state = dict(state)
            new_state.update(ctx.state_out)
            return jnp.sum(lmap * mask) / count_global, new_state

        train_params = model._trainable(params)
        (loss_v, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(train_params)
        # per-rank partials (cross-rank halo terms route to their owning
        # rank through the transposed ppermute) → one psum = global grad
        grads = jax.lax.psum(grads, (data_axis, space_axis))
        loss_v = jax.lax.psum(loss_v, (data_axis, space_axis))
        # aux state (BN batch stats) differs per shard → average it so the
        # replicated output is consistent across ranks
        new_state = jax.lax.pmean(new_state, (data_axis, space_axis))
        new_train, new_opt = opt.update(train_params, grads, opt_state,
                                        hyper, lr_mults, wd_mults)
        new_params = {n: {**params.get(n, {}), **new_train.get(n, {})}
                      for n in set(params) | set(new_train)}
        return loss_v, new_params, new_opt, new_state

    sm_kw = {}
    if model_axis is not None:
        # manual over data/space only; the model axis stays auto (GSPMD)
        sm_kw["axis_names"] = frozenset({data_axis, space_axis})
    return {"local_step": local_step, "sm_kw": sm_kw, "fov_z": fov_z}


def make_fused_spatial_trainstep(model, mesh, n_inner, data_axis="data",
                                 space_axis="space", model_axis=None):
    """Fused K-step DP×SP training: ``n_inner`` halo-exchanged train steps
    inside ONE ``lax.scan`` dispatch — ``fused_steps`` composed with the
    spatial mesh (each inner step == ``make_spatial_dp_trainstep``'s,
    tested). The scan sits INSIDE the manual ``shard_map`` region, so the
    stacked batches are partitioned once per chunk, not per step.

    Returns ``chunk(params, opt_state, state, data_K, target_K, hyper,
    rng) -> (losses (K,), params, opt_state, state)`` (jitted).
    ``data_K``: (K, B, f, Z, X, Y); ``target_K``: (K, B, Z, X_out, Y_out)
    (z-padded, see ``pad_target_for_spatial``). ``rng`` is required (one
    split per inner step, rank-decorrelated inside).

    **params and opt_state are DONATED** (their HBM buffers are reused
    for the outputs, like ``FusedTrainLoop``): ALWAYS rebind from the
    return values (``losses, p, o, s = chunk(p, o, s, ...)``) — touching
    the donated arrays afterwards raises a deleted-buffer error on TPU
    (CPU ignores donation, so tests won't catch the misuse).
    """
    parts = _build_spatial_parts(model, mesh, data_axis, space_axis,
                                 model_axis)
    local_step, sm_kw = parts["local_step"], parts["sm_kw"]
    K = int(n_inner)
    if K < 1:
        raise ValueError(f"n_inner must be >= 1, got {n_inner}")

    def local_chunk(params, opt_state, state, data_K, target_K, rng, hyper):
        def body(carry, inp):
            params, opt_state, state, k = carry
            d, t = inp
            k, sub = jax.random.split(k)
            loss, params, opt_state, state = local_step(
                params, opt_state, state, d, t, sub, hyper)
            return (params, opt_state, state, k), loss

        (params, opt_state, state, _), losses = jax.lax.scan(
            body, (params, opt_state, state, rng), (data_K, target_K))
        return losses, params, opt_state, state

    shard_chunk = jax.shard_map(
        local_chunk, mesh=mesh,
        in_specs=(P(), P(), P(),
                  P(None, data_axis, None, space_axis, None, None),
                  P(None, data_axis, space_axis, None, None),
                  P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False, **sm_kw)

    jit_kw = {}
    if model_axis is not None:
        psh, osh = spatial_tp_shardings(model, mesh, model_axis)
        repl = NamedSharding(mesh, P())
        jit_kw = dict(in_shardings=(psh, osh, repl, None, None, repl, repl),
                      out_shardings=(repl, psh, osh, repl))

    @partial(jax.jit, donate_argnums=(0, 1), **jit_kw)
    def chunk(params, opt_state, state, data_K, target_K, hyper, rng):
        return shard_chunk(params, opt_state, state, data_K, target_K,
                           rng, hyper)

    logger.info(f"fused spatial DP train chunk: K={K}, mesh "
                f"{dict(zip(mesh.axis_names, mesh.devices.shape))}")
    return chunk


def spatial_tp_shardings(model, mesh, model_axis):
    """(param_shardings, opt_shardings) channel-sharded over
    ``model_axis`` — the same rule as ``Model.use_mesh(model_axis=...)``,
    computed WITHOUT mutating the model (a proxy carries just the
    attributes the Model sharding helpers read)."""
    import types
    from elektronn2_tpu.neuromancer.model import Model
    proxy = types.SimpleNamespace(
        _mesh=mesh, _model_axis=model_axis,
        params=model.params, nodes=model.nodes,
        opt_state=model.opt_state)
    proxy._param_shardings = lambda: Model._param_shardings(proxy)
    proxy._repl_sharding = lambda: Model._repl_sharding(proxy)
    return (Model._param_shardings(proxy), Model._opt_shardings(proxy))


def conv_supports_halo(ctx):
    """True when the trace is running z-sharded (set by the spatial step)."""
    return getattr(ctx, "halo_axis", None) is not None
