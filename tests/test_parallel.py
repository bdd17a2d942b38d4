"""Distributed tests on the 8-device virtual CPU mesh (SURVEY.md §5.d):
DP gradients equal single-device; halo-exchange conv equals unsharded."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import elektronn2_tpu.neuromancer as nm
from elektronn2_tpu.neuromancer import model_manager
from elektronn2_tpu.parallel import make_mesh, spatial_cp_stack, mesh_info


@pytest.fixture(autouse=True)
def fresh_graph():
    model_manager.reset(seed=11)
    yield


def build_model(batch):
    inp = nm.Input([batch, 1, 16, 16], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([batch, *probs.shape.spatial_shape], "b,x,y",
                   dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    return m


def test_mesh_construction():
    mesh = make_mesh({"data": 4, "space": 2})
    info = mesh_info(mesh)
    assert info["axes"] == {"data": 4, "space": 2}
    assert info["n_devices"] == 8


def test_dp_training_matches_single_device(rng):
    """Same batch, same init: 8-way DP step == single-device step."""
    B = 8
    x = rng.randn(B, 1, 16, 16).astype(np.float32)
    y = (rng.rand(B, 7, 7) > 0.5).astype(np.int32)

    m1 = build_model(B)
    m1.set_opt("SGD", lr=0.05, mom=0.0)
    model_manager.reset(seed=11)   # identical init
    m2 = build_model(B)
    m2.set_opt("SGD", lr=0.05, mom=0.0)
    m2.use_mesh(make_mesh({"data": 8}))

    for _ in range(3):
        l1, _ = m1.trainingstep(x, y)
        l2, _ = m2.trainingstep(x, y)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m1.params["c1"]["w"]),
                               np.asarray(m2.params["c1"]["w"]),
                               rtol=1e-4, atol=1e-6)


def test_dp_sharding_actually_distributes(rng):
    B = 8
    m = build_model(B)
    m.set_opt("Adam", lr=1e-3)
    mesh = make_mesh({"data": 8})
    m.use_mesh(mesh)
    x = rng.randn(B, 1, 16, 16).astype(np.float32)
    y = (rng.rand(B, 7, 7) > 0.5).astype(np.int32)
    m.trainingstep(x, y)
    # params replicated on all devices
    w = m.params["c1"]["w"]
    assert len(w.sharding.device_set) == 8


def test_halo_cp_stack_equals_unsharded(rng):
    """Spatial CP: z-sharded conv stack over 4 ranks == plain stack."""
    mesh = make_mesh({"space": 4}, n_devices=4)
    layers = [
        {"w": jnp.asarray(rng.randn(4, 1, 3, 3, 3).astype(np.float32)),
         "b": jnp.asarray(np.zeros(4, np.float32)), "activation": "relu"},
        {"w": jnp.asarray(rng.randn(4, 4, 3, 3, 3).astype(np.float32)),
         "b": jnp.asarray(np.zeros(4, np.float32)), "activation": "relu",
         "pool": (1, 2, 2)},
        {"w": jnp.asarray(rng.randn(2, 4, 2, 3, 3).astype(np.float32)),
         "b": jnp.asarray(np.zeros(2, np.float32)), "activation": "lin"},
    ]
    x = jnp.asarray(rng.randn(1, 1, 16, 20, 20).astype(np.float32))

    fn = spatial_cp_stack(layers, mesh)
    got = np.asarray(fn(x))

    # unsharded reference (canonical order: conv+bias -> pool -> activation)
    from elektronn2_tpu.ops.conv import apply_layer
    h = x
    for l in layers:
        h = apply_layer(h, l["w"], l["b"], l["activation"], l.get("pool"))
    want = np.asarray(h)
    assert got.shape[2] >= want.shape[2]
    np.testing.assert_allclose(got[:, :, :want.shape[2]], want,
                               rtol=1e-4, atol=1e-5)


def test_sharded_dilated_dense_equals_unsharded(rng):
    """Spatial-CP dense MFP sweep over 4 ranks == single-device sweep
    (the BASELINE.json 'pod scale-out' inference config)."""
    inp = nm.Input([1, 1, 11, 21, 21], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, (3, 3, 3), (1, 2, 2), mfp=True, name="c1")
    c2 = nm.Conv(c1, 2, (3, 3, 3), (1, 2, 2), mfp=True, name="c2")
    probs = nm.Softmax(c2)
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    vol = jnp.asarray(rng.rand(1, 32, 40, 40).astype(np.float32))
    un = np.asarray(m.predict_dense_device(vol))
    mesh = make_mesh({"space": 4}, n_devices=4)
    sh = np.asarray(m.predict_dense_sharded(vol, mesh))
    assert sh.shape == un.shape
    np.testing.assert_allclose(sh, un, atol=1e-6)
    # pad_raw variant: full-coverage output, z not divisible by ranks
    vol2 = jnp.asarray(rng.rand(1, 30, 40, 40).astype(np.float32))
    un2 = np.asarray(m.predict_dense_device(vol2, pad_raw=True))
    sh2 = np.asarray(m.predict_dense_sharded(vol2, mesh, pad_raw=True))
    np.testing.assert_allclose(sh2, un2, atol=1e-6)


def test_halo_cp_rejects_bad_shapes(rng):
    mesh = make_mesh({"space": 4}, n_devices=4)
    layers = [{"w": jnp.asarray(rng.randn(2, 1, 3, 3, 3).astype(np.float32))}]
    fn = spatial_cp_stack(layers, mesh)
    with pytest.raises(ValueError):
        fn(jnp.zeros((1, 1, 15, 10, 10), jnp.float32))  # 15 % 4 != 0


def test_sharded_dense_multihop_halo(rng):
    """Deep dilated stack on many ranks: per-layer halo exceeds one shard
    (z_local=2, dilated halo up to 8) → multi-hop gather must still match
    the single-device sweep exactly."""
    inp = nm.Input([1, 1, 11, 13, 13], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 3, (3, 3, 3), (2, 2, 2), mfp=True, name="c1")
    c2 = nm.Conv(c1, 2, (3, 3, 3), (1, 1, 1), mfp=True, name="c2")
    probs = nm.Softmax(c2)
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    vol = jnp.asarray(rng.rand(1, 16, 20, 20).astype(np.float32))
    un = np.asarray(m.predict_dense_device(vol))
    mesh = make_mesh({"space": 8}, n_devices=8)   # z_local = 2
    sh = np.asarray(m.predict_dense_sharded(vol, mesh))
    assert sh.shape == un.shape
    np.testing.assert_allclose(sh, un, atol=1e-6)


def test_spatial_dp_training_matches_single_device(rng):
    """Combined DP×SP train step (batch + z sharding, halo convs, psum
    grads) produces the same loss and parameter update as an unsharded
    reference step."""
    from elektronn2_tpu.parallel.spatial_train import (
        make_spatial_dp_trainstep, pad_target_for_spatial)
    from elektronn2_tpu.neuromancer.node_basic import TraceCtx

    B, Z, X, Y = 2, 8, 14, 14
    inp = nm.Input([B, 1, Z, X, Y], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, (3, 3, 3), (1, 2, 2), name="c1")
    c2 = nm.Conv(c1, 4, (3, 3, 3), (1, 1, 1), name="c2")
    probs = nm.Softmax(nm.Conv(c2, 2, 1, 1, activation_func="lin"),
                       name="probs")
    tgt = nm.Input([B, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True, name="nll")
    loss = nm.AggregateLoss(nll, name="loss")
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt("SGD", lr=0.05, mom=0.0)

    mesh = make_mesh({"data": 2, "space": 4})
    step = make_spatial_dp_trainstep(m, mesh)

    data = rng.rand(B, 1, Z, X, Y).astype(np.float32)
    z_out, x_out, y_out = probs.shape.spatial_shape
    target = (rng.rand(B, z_out, x_out, y_out) > 0.5).astype(np.int32)
    target_pad = pad_target_for_spatial(target, Z)

    loss_sh, new_params, _, _ = step(m.params, m.opt_state, m.state,
                                  jnp.asarray(data),
                                  jnp.asarray(target_pad),
                                  m.optimiser.current_hyper(),
                                  jax.random.PRNGKey(0))

    # unsharded reference: mean of the per-voxel map + plain SGD step
    def ref_loss(tp):
        merged = {n: {**m.params.get(n, {}), **tp.get(n, {})}
                  for n in set(m.params) | set(tp)}
        ctx = TraceCtx(merged, {"raw": data, "target": target}, None,
                       train=True, node_index=m._node_index)
        return jnp.mean(ctx.get(nll))

    tp = m._trainable(m.params)
    loss_ref, grads = jax.value_and_grad(ref_loss)(tp)
    ref_new, _ = m.optimiser.update(tp, grads, m.opt_state,
                                    m.optimiser.current_hyper(),
                                    m._lr_mults, m._wd_mults)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_params["c1"]["w"]),
                               np.asarray(ref_new["c1"]["w"]),
                               rtol=1e-4, atol=1e-6)


def test_spatial_dp_training_rejects_z_pool_and_mfp(rng):
    from elektronn2_tpu.parallel.spatial_train import make_spatial_dp_trainstep
    inp = nm.Input([2, 1, 8, 9, 9], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 2, (3, 3, 3), (2, 1, 1), name="c1")  # z-pool!
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([2, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt("SGD", lr=0.01)
    with pytest.raises(ValueError, match="z-pooling"):
        make_spatial_dp_trainstep(m, make_mesh({"data": 2, "space": 4}))


def test_spatial_dp_training_rejects_z_cropping_merge(rng):
    """A FaithlessMerge whose parents differ in z centre-crops z in the
    unsharded graph; under z-sharding the crop degenerates and would pair
    MISALIGNED skip rows — must be rejected with a named reason (serving
    such graphs sharded is supported; training is not)."""
    from elektronn2_tpu.parallel.spatial_train import \
        make_spatial_dp_trainstep
    inp = nm.Input([2, 1, 8, 16, 16], "b,f,z,x,y", name="raw")
    e0 = nm.Conv(inp, 4, (1, 3, 3), (1, 1, 1), name="e0")
    e1 = nm.Conv(e0, 6, (3, 3, 3), (1, 2, 2), name="e1")
    up = nm.UpConv(e1, 4, (1, 2, 2), activation_func="relu", name="up")
    mg = nm.FaithlessMerge(up, e0, name="mg")            # z 6 vs 8
    probs = nm.Softmax(nm.Conv(mg, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([2, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt("SGD", lr=0.01)
    with pytest.raises(ValueError, match="misaligned skip rows"):
        make_spatial_dp_trainstep(m, make_mesh({"data": 2, "space": 4}))
    # explicit z crop: same hazard class
    inp2 = nm.Input([2, 1, 8, 9, 9], "b,f,z,x,y", name="raw")
    c = nm.Conv(inp2, 2, (1, 3, 3), (1, 1, 1), name="c")
    cr = nm.Crop(c, [(1, 1), (0, 0), (0, 0)], name="cr")
    probs2 = nm.Softmax(nm.Conv(cr, 2, 1, 1, activation_func="lin"))
    tgt2 = nm.Input([2, *probs2.shape.spatial_shape], "b,z,x,y",
                    dtype="int32", name="target")
    loss2 = nm.AggregateLoss(nm.MultinoulliNLL(probs2, tgt2,
                                               target_is_sparse=True))
    m2 = model_manager.getmodel()
    m2.designate_nodes(input_node=inp2, target_node=tgt2, loss_node=loss2,
                       prediction_node=probs2)
    m2.set_opt("SGD", lr=0.01)
    with pytest.raises(ValueError, match="z crop"):
        make_spatial_dp_trainstep(m2, make_mesh({"data": 2, "space": 4}))


# -------------------------------------------------- tensor parallelism (TP)

def test_dp_tp_training_matches_single_device(rng):
    """2-way DP x 4-way TP step trajectory == single-device (GSPMD shards
    Conv output channels over the model axis; XLA inserts the collectives)."""
    B = 4
    x = rng.randn(B, 1, 16, 16).astype(np.float32)
    y = (rng.rand(B, 7, 7) > 0.5).astype(np.int32)

    m1 = build_model(B)
    m1.set_opt("Adam", lr=1e-3)
    model_manager.reset(seed=11)
    m2 = build_model(B)
    m2.set_opt("Adam", lr=1e-3)
    m2.use_mesh(make_mesh({"data": 2, "model": 4}), model_axis="model")

    for _ in range(3):
        l1, _ = m1.trainingstep(x, y)
        l2, _ = m2.trainingstep(x, y)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m1.params["c1"]["w"]),
                               np.asarray(m2.params["c1"]["w"]),
                               rtol=1e-4, atol=1e-6)


def test_tp_params_actually_sharded(rng):
    m = build_model(4)
    m.set_opt("Adam", lr=1e-3)
    mesh = make_mesh({"data": 2, "model": 4})
    m.use_mesh(mesh, model_axis="model")
    w = m.params["c1"]["w"]              # (4, 1, 3, 3): 4 % 4 == 0 → sharded
    spec = w.sharding.spec
    assert spec[0] == "model", spec
    # optimiser slots inherit the param sharding
    leaves = [l for l in jax.tree_util.tree_leaves(m.opt_state)
              if getattr(l, "shape", None) == w.shape]
    assert leaves and all(l.sharding.spec[0] == "model" for l in leaves)
    # the 2-channel output layer does not divide → replicated, still trains
    x = np.random.RandomState(0).randn(4, 1, 16, 16).astype(np.float32)
    y = (np.random.RandomState(1).rand(4, 7, 7) > 0.5).astype(np.int32)
    l0, _ = m.trainingstep(x, y)
    l1, _ = m.trainingstep(x, y)
    assert float(l1) < float(l0)


def test_tp_inference_works_with_sharded_params(rng):
    m = build_model(4)
    m.set_opt("Adam", lr=1e-3)
    m.use_mesh(make_mesh({"data": 2, "model": 4}), model_axis="model")
    x = rng.randn(4, 1, 16, 16).astype(np.float32)
    out = np.asarray(m.predict(x))
    assert out.shape == (4, 2, 7, 7) and np.isfinite(out).all()


def test_tp_composes_with_fused_loop(rng):
    """TP-sharded params flow through the fused K-step scan and stay
    sharded (mixing mesh-sharded params with augmenter arrays in one jit)."""
    from scipy import ndimage
    from elektronn2_tpu.data import DeviceBatchAugmenter
    from elektronn2_tpu.training.fused_loop import FusedTrainLoop

    raws = [ndimage.gaussian_filter(rng.randn(16, 32, 32), 2
                                    ).astype(np.float32)[None]]
    labs = [(raws[0][0] > 0).astype(np.int16)]
    inp = nm.Input([4, 1, 4, 12, 12], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 8, (1, 3, 3), (1, 1, 1), name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([4, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt("Adam", lr=1e-3)
    m.use_mesh(make_mesh({"data": 2, "model": 4}), model_axis="model")
    aug = DeviceBatchAugmenter(raws, labs, patch_size=(4, 12, 12),
                               target_size=tuple(probs.shape.spatial_shape),
                               seed=3)
    loop = FusedTrainLoop(m, aug, batch_size=4, n_inner=3, warp=0.5)
    losses, _ = loop.run_chunk()
    assert np.isfinite(losses).all() and len(losses) == 3
    assert m.params["c1"]["w"].sharding.spec[0] == "model"


# ------------------------------------------------------------- pipeline (PP)

def _pp_layers(rng):
    return [
        {"w": rng.randn(4, 1, 3, 3, 3).astype(np.float32) * 0.1,
         "b": np.zeros(4, np.float32), "activation": "relu"},
        {"w": rng.randn(6, 4, 1, 3, 3).astype(np.float32) * 0.1,
         "b": np.zeros(6, np.float32), "activation": "relu",
         "pool": (1, 2, 2)},
        {"w": rng.randn(6, 6, 3, 3, 3).astype(np.float32) * 0.1,
         "b": np.zeros(6, np.float32), "activation": "relu"},
        {"w": rng.randn(2, 6, 1, 1, 1).astype(np.float32) * 0.1,
         "b": np.zeros(2, np.float32), "activation": None},
    ]


@pytest.mark.parametrize("n_stages", [2, 4])
def test_gpipe_matches_sequential(rng, n_stages):
    """GPipe loss AND gradients == the unpipelined stack, exactly."""
    from elektronn2_tpu.parallel import (gpipe_stack, microbatch,
                                         gpipe_reference_loss)
    from elektronn2_tpu.parallel.pipeline import (_stage_apply,
                                                  extract_params)
    layers = _pp_layers(rng)

    def loss_fn(pred, tgt):
        return jnp.mean((pred - tgt) ** 2)

    M, b_mb = 4, 2
    x = rng.rand(M * b_mb, 1, 12, 20, 20).astype(np.float32)
    xm = microbatch(jnp.asarray(x), M)
    meta, params = extract_params(layers)
    y0 = _stage_apply(meta, params, range(len(layers)), xm[0])
    ym = jnp.stack([jnp.full_like(y0, 0.5)] * M)

    mesh = make_mesh({"pipe": n_stages},
                     devices=jax.devices()[:n_stages])
    loss_of, _, params_p = gpipe_stack(
        layers, mesh, loss_fn, mb_input_shape=(b_mb, 1, 12, 20, 20),
        n_micro=M)
    l_pipe = float(jax.jit(loss_of)(params_p, xm, ym))
    l_ref = float(gpipe_reference_loss(layers, loss_fn, xm, ym))
    np.testing.assert_allclose(l_pipe, l_ref, rtol=1e-5)

    g_pipe = jax.jit(jax.grad(loss_of))(params_p, xm, ym)

    def ref_loss(p):
        ls = [loss_fn(_stage_apply(meta, p, range(len(layers)), xm[m]),
                      ym[m]) for m in range(M)]
        return jnp.mean(jnp.stack(ls))

    g_ref = jax.grad(ref_loss)(params)
    assert len(g_pipe) == len(g_ref)        # zip must not truncate layers
    for gp, gr in zip(g_pipe, g_ref):
        for k in gr:
            np.testing.assert_allclose(np.asarray(gp[k]),
                                       np.asarray(gr[k]),
                                       rtol=1e-4, atol=1e-6)


def test_gpipe_training_decreases_loss(rng):
    """A few SGD steps through the pipelined grad actually train."""
    from elektronn2_tpu.parallel import gpipe_stack, microbatch
    from elektronn2_tpu.parallel.pipeline import (_stage_apply,
                                                  extract_params)
    layers = _pp_layers(rng)

    def loss_fn(pred, tgt):
        return jnp.mean((pred - tgt) ** 2)

    M, b_mb = 2, 2
    x = rng.rand(M * b_mb, 1, 12, 20, 20).astype(np.float32)
    xm = microbatch(jnp.asarray(x), M)
    meta, params0 = extract_params(layers)
    y0 = _stage_apply(meta, params0, range(len(layers)), xm[0])
    ym = jnp.stack([jnp.full_like(y0, 0.3)] * M)

    mesh = make_mesh({"pipe": 2}, devices=jax.devices()[:2])
    loss_of, _, params = gpipe_stack(
        layers, mesh, loss_fn, mb_input_shape=(b_mb, 1, 12, 20, 20),
        n_micro=M)
    vg = jax.jit(jax.value_and_grad(loss_of))
    losses = []
    for _ in range(8):
        l, g = vg(params, xm, ym)
        losses.append(float(l))
        params = jax.tree_util.tree_map(lambda p, gr: p - 0.5 * gr,
                                        params, g)
    assert losses[-1] < losses[0] * 0.9


def test_gpipe_validation_errors(rng):
    from elektronn2_tpu.parallel import gpipe_stack, microbatch
    layers = _pp_layers(rng)
    mesh = make_mesh({"pipe": 8})
    with pytest.raises(ValueError, match="stages"):
        gpipe_stack(layers, mesh, lambda a, b: jnp.sum(a),
                    mb_input_shape=(1, 1, 12, 20, 20), n_micro=2)
    with pytest.raises(ValueError, match="divisible"):
        microbatch(jnp.zeros((5, 1)), 2)


def test_gpipe_from_neuromancer_model(rng):
    """layers_from_model + gpipe == the model's own forward pass."""
    from elektronn2_tpu.parallel import gpipe_stack, microbatch
    from elektronn2_tpu.parallel.pipeline import (layers_from_model,
                                                  _stage_apply,
                                                  extract_params,
                                                  gpipe_reference_loss)
    model_manager.reset(seed=4)
    inp = nm.Input([2, 1, 10, 16, 16], "b,f,z,x,y", name="raw")
    h = nm.Conv(inp, 4, (3, 3, 3), (1, 2, 2), name="e0")
    h = nm.Conv(h, 6, (3, 3, 3), (1, 1, 1), name="e1")
    out = nm.Conv(h, 2, 1, 1, activation_func="lin", name="cls")
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=out)

    layers = layers_from_model(m)
    assert len(layers) == 3
    x = rng.rand(4, 1, 10, 16, 16).astype(np.float32)
    # model forward (batch 2 design; feed 2 microbatches of 2)
    ref0 = np.asarray(m.predict(x[:2]))
    meta, params = extract_params(layers)
    got0 = np.asarray(_stage_apply(meta, params, range(3), jnp.asarray(x[:2])))
    np.testing.assert_allclose(got0, ref0, atol=1e-5)

    def loss_fn(pred, tgt):
        return jnp.mean((pred - tgt) ** 2)

    xm = microbatch(jnp.asarray(x), 2)
    ym = jnp.zeros((2,) + got0.shape, jnp.float32)
    mesh = make_mesh({"pipe": 2}, devices=jax.devices()[:2])
    loss_of, _, pp = gpipe_stack(layers, mesh, loss_fn,
                                 mb_input_shape=(2, 1, 10, 16, 16),
                                 n_micro=2)
    np.testing.assert_allclose(
        float(jax.jit(loss_of)(pp, xm, ym)),
        float(gpipe_reference_loss(layers, loss_fn, xm, ym)), rtol=1e-5)


def test_gpipe_bf16(rng):
    """Mixed-precision stacks run through the pipeline (buffer dtype
    follows the weights)."""
    from elektronn2_tpu.parallel import gpipe_stack, microbatch
    layers = [
        {"w": (rng.randn(4, 1, 3, 3, 3) * 0.1).astype(jnp.bfloat16),
         "b": np.zeros(4, np.float32).astype(jnp.bfloat16),
         "activation": "relu"},
        {"w": (rng.randn(2, 4, 1, 1, 1) * 0.1).astype(jnp.bfloat16),
         "b": np.zeros(2, np.float32).astype(jnp.bfloat16),
         "activation": None},
    ]
    mesh = make_mesh({"pipe": 2}, devices=jax.devices()[:2])
    loss_of, _, params = gpipe_stack(
        layers, mesh,
        lambda p, t: jnp.mean((p.astype(jnp.float32) - t) ** 2),
        mb_input_shape=(1, 1, 8, 10, 10), n_micro=2)
    xm = microbatch(jnp.asarray(rng.rand(2, 1, 8, 10, 10), jnp.bfloat16), 2)
    ym = jnp.zeros((2, 1, 2, 6, 8, 8), jnp.float32)
    l, g = jax.jit(jax.value_and_grad(loss_of))(params, xm, ym)
    assert np.isfinite(float(l))
    assert g[0]["w"].dtype == jnp.bfloat16


def test_gpipe_composes_with_dp(rng):
    """DP×PP: microbatch batch dims sharded over 'data' while stages
    pipeline over 'pipe' — loss and grads == the sequential stack."""
    from elektronn2_tpu.parallel import (gpipe_stack, microbatch,
                                         gpipe_reference_loss)
    from elektronn2_tpu.parallel.pipeline import (_stage_apply,
                                                  extract_params)
    layers = _pp_layers(rng)

    def loss_fn(pred, tgt):
        return jnp.mean((pred - tgt) ** 2)

    M, b_mb = 2, 4                     # global microbatch of 4, 2 shards
    x = rng.rand(M * b_mb, 1, 12, 20, 20).astype(np.float32)
    xm = microbatch(jnp.asarray(x), M)
    meta, params = extract_params(layers)
    y0 = _stage_apply(meta, params, range(len(layers)), xm[0])
    ym = jnp.stack([jnp.full_like(y0, 0.5)] * M)

    mesh = make_mesh({"data": 2, "pipe": 2},
                     devices=jax.devices()[:4])
    loss_of, _, params_p = gpipe_stack(
        layers, mesh, loss_fn, mb_input_shape=(b_mb, 1, 12, 20, 20),
        n_micro=M, data_axis="data")
    l_pipe = float(jax.jit(loss_of)(params_p, xm, ym))
    l_ref = float(gpipe_reference_loss(layers, loss_fn, xm, ym))
    np.testing.assert_allclose(l_pipe, l_ref, rtol=1e-5)

    g_pipe = jax.jit(jax.grad(loss_of))(params_p, xm, ym)

    def ref_loss(p):
        ls = [loss_fn(_stage_apply(meta, p, range(len(layers)), xm[m]),
                      ym[m]) for m in range(M)]
        return jnp.mean(jnp.stack(ls))

    g_ref = jax.grad(ref_loss)(params)
    assert len(g_pipe) == len(g_ref)        # zip must not truncate layers
    for gp, gr in zip(g_pipe, g_ref):
        for k in gr:
            np.testing.assert_allclose(np.asarray(gp[k]),
                                       np.asarray(gr[k]),
                                       rtol=1e-4, atol=1e-6)


# ------------------------- Model-level PP training + 3-axis composition

def _flagship_like(B, name="pp_model"):
    """Small linear conv chain + softmax/NLL head (the flagship family)."""
    inp = nm.Input([B, 1, 9, 16, 16], "b,f,z,x,y", name="raw")
    h = inp
    for i, (nf, f, p) in enumerate([(4, (1, 3, 3), (1, 2, 2)),
                                    (6, (3, 3, 3), (1, 1, 1)),
                                    (6, (3, 3, 3), (1, 1, 1))]):
        h = nm.Conv(h, nf, f, p, name=f"c{i}")
    logits = nm.Conv(h, 2, 1, 1, activation_func="lin", name="logits")
    probs = nm.Softmax(logits, name="probs")
    tgt = nm.Input([B, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel(name)
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt("SGD", lr=0.05, mom=0.0)
    return m, probs


def test_model_gpipe_trainstep_matches_trainingstep(rng):
    """make_gpipe_trainstep (VERDICT r1 #5: Model API through PP): K
    pipelined training steps == K Model.trainingstep calls on the same
    batches — loss trajectory and final params."""
    from elektronn2_tpu.parallel import make_gpipe_trainstep, microbatch
    M, b_mb = 4, 1
    B = M * b_mb
    m_ref, probs = _flagship_like(B, "pp_ref")
    out_sp = probs.shape.spatial_shape
    batches = [(rng.rand(B, 1, 9, 16, 16).astype(np.float32),
                (rng.rand(B, *out_sp) > 0.5).astype(np.int32))
               for _ in range(3)]
    ref_losses = []
    for d, t in batches:
        lv, _ = m_ref.trainingstep(d, t)
        ref_losses.append(float(lv))

    model_manager.reset(seed=11)        # identical init
    m_pp, _ = _flagship_like(B, "pp_pipe")
    mesh = make_mesh({"pipe": 4}, devices=jax.devices()[:4])
    step = make_gpipe_trainstep(m_pp, mesh, n_micro=M, mb_batch=b_mb)
    pp_losses = []
    hyper = m_pp.optimiser.current_hyper()
    for d, t in batches:
        xm, ym = microbatch(jnp.asarray(d), M), microbatch(jnp.asarray(t), M)
        lv, m_pp.params, m_pp.opt_state = step(m_pp.params, m_pp.opt_state,
                                               xm, ym, hyper)
        pp_losses.append(float(lv))
    np.testing.assert_allclose(pp_losses, ref_losses, rtol=2e-5)
    for n in ("c0", "c2", "logits"):
        np.testing.assert_allclose(np.asarray(m_pp.params[n]["w"]),
                                   np.asarray(m_ref.params[n]["w"]),
                                   rtol=1e-4, atol=1e-6)


def test_model_gpipe_composes_with_dp(rng):
    """DP×PP through the Model API ({'data':2,'pipe':2})."""
    from elektronn2_tpu.parallel import make_gpipe_trainstep, microbatch
    M, b_mb = 2, 2                     # global mb batch 2, sharded 2-way
    B = M * b_mb
    m_ref, probs = _flagship_like(B, "dpp_ref")
    out_sp = probs.shape.spatial_shape
    d = rng.rand(B, 1, 9, 16, 16).astype(np.float32)
    t = (rng.rand(B, *out_sp) > 0.5).astype(np.int32)
    l_ref, _ = m_ref.trainingstep(d, t)

    model_manager.reset(seed=11)
    m_pp, _ = _flagship_like(B, "dpp_pipe")
    mesh = make_mesh({"data": 2, "pipe": 2}, devices=jax.devices()[:4])
    step = make_gpipe_trainstep(m_pp, mesh, n_micro=M, mb_batch=b_mb,
                                data_axis="data")
    xm, ym = microbatch(jnp.asarray(d), M), microbatch(jnp.asarray(t), M)
    lv, new_p, _ = step(m_pp.params, m_pp.opt_state, xm, ym,
                        m_pp.optimiser.current_hyper())
    np.testing.assert_allclose(float(lv), float(l_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(new_p["c1"]["w"]),
                               np.asarray(m_ref.params["c1"]["w"]),
                               rtol=1e-4, atol=1e-6)


def test_three_axis_dp_sp_tp_matches_single_device(rng):
    """3-axis mesh {'data':2,'space':2,'model':2} (VERDICT r1 #5): manual
    DP×SP shard_map with GSPMD TP on the auto axis == unsharded step."""
    from elektronn2_tpu.parallel.spatial_train import (
        make_spatial_dp_trainstep, pad_target_for_spatial,
        spatial_tp_shardings)
    from elektronn2_tpu.neuromancer.node_basic import TraceCtx

    B, Z, X, Y = 2, 8, 14, 14
    inp = nm.Input([B, 1, Z, X, Y], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, (3, 3, 3), (1, 2, 2), name="c1")
    c2 = nm.Conv(c1, 4, (3, 3, 3), (1, 1, 1), name="c2")
    probs = nm.Softmax(nm.Conv(c2, 2, 1, 1, activation_func="lin"),
                       name="probs")
    tgt = nm.Input([B, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True, name="nll")
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt,
                      loss_node=nm.AggregateLoss(nll, name="loss"),
                      prediction_node=probs)
    m.set_opt("SGD", lr=0.05, mom=0.0)

    mesh = make_mesh({"data": 2, "space": 2, "model": 2})
    psh, _ = spatial_tp_shardings(m, mesh, "model")
    assert psh["c1"]["w"].spec[0] == "model"   # channels really sharded
    step = make_spatial_dp_trainstep(m, mesh, model_axis="model")

    data = rng.rand(B, 1, Z, X, Y).astype(np.float32)
    z_out, x_out, y_out = probs.shape.spatial_shape
    target = (rng.rand(B, z_out, x_out, y_out) > 0.5).astype(np.int32)
    target_pad = pad_target_for_spatial(target, Z)
    loss_sh, new_params, _, _ = step(m.params, m.opt_state, m.state,
                                     jnp.asarray(data),
                                     jnp.asarray(target_pad),
                                     m.optimiser.current_hyper(),
                                     jax.random.PRNGKey(0))
    # TP sharding survives the update (opt state/params stay distributed)
    assert new_params["c1"]["w"].sharding.spec[0] == "model"

    def ref_loss(tp):
        merged = {n: {**m.params.get(n, {}), **tp.get(n, {})}
                  for n in set(m.params) | set(tp)}
        ctx = TraceCtx(merged, {"raw": data, "target": target}, None,
                       train=True, node_index=m._node_index)
        return jnp.mean(ctx.get(nll))

    tp = m._trainable(m.params)
    loss_ref, grads = jax.value_and_grad(ref_loss)(tp)
    ref_new, _ = m.optimiser.update(tp, grads, m.opt_state,
                                    m.optimiser.current_hyper(),
                                    m._lr_mults, m._wd_mults)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for n in ("c1", "c2"):
        np.testing.assert_allclose(np.asarray(new_params[n]["w"]),
                                   np.asarray(ref_new[n]["w"]),
                                   rtol=1e-4, atol=1e-6)


def test_model_gpipe_grouped_softmax_head(rng):
    """Grouped Softmax (n_indep=2) heads derive a faithful pipeline loss
    (review r2: the single log_softmax derivation silently trained a
    different objective) — pipelined step == Model.trainingstep."""
    from elektronn2_tpu.parallel import make_gpipe_trainstep, microbatch

    def build(name):
        inp = nm.Input([4, 1, 9, 16, 16], "b,f,z,x,y", name="raw")
        h = nm.Conv(inp, 4, (1, 3, 3), (1, 2, 2), name="c0")
        h = nm.Conv(h, 6, (3, 3, 3), (1, 1, 1), name="c1")
        h = nm.Conv(h, 6, (3, 3, 3), (1, 1, 1), name="c2")
        logits = nm.Conv(h, 4, 1, 1, activation_func="lin", name="logits")
        probs = nm.Softmax(logits, n_indep=2, name="probs")
        tgt = nm.Input([4, *probs.shape.spatial_shape], "b,z,x,y",
                       dtype="int32", name="target")
        loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                                  target_is_sparse=True))
        m = model_manager.getmodel(name)
        m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs)
        m.set_opt("SGD", lr=0.05, mom=0.0)
        return m, probs

    m_ref, probs = build("gp_ref")
    out_sp = probs.shape.spatial_shape
    d = rng.rand(4, 1, 9, 16, 16).astype(np.float32)
    t = rng.randint(0, 4, (4, *out_sp)).astype(np.int32)
    l_ref, _ = m_ref.trainingstep(d, t)

    model_manager.reset(seed=11)       # identical init
    m_pp, _ = build("gp_pipe")
    mesh = make_mesh({"pipe": 4}, devices=jax.devices()[:4])
    step = make_gpipe_trainstep(m_pp, mesh, n_micro=4, mb_batch=1)
    xm, ym = microbatch(jnp.asarray(d), 4), microbatch(jnp.asarray(t), 4)
    lv, new_p, _ = step(m_pp.params, m_pp.opt_state, xm, ym,
                        m_pp.optimiser.current_hyper())
    np.testing.assert_allclose(float(lv), float(l_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(new_p["c1"]["w"]),
                               np.asarray(m_ref.params["c1"]["w"]),
                               rtol=1e-4, atol=1e-6)


def test_fused_loop_composes_with_dp_mesh(rng):
    """FusedTrainLoop under Model.use_mesh (8-way DP): chunk losses and
    updated params are identical to the single-device fused loop — the
    committed NamedShardings on params propagate through the fused scan
    (GSPMD), so pod configs can combine mesh_axes with fused_steps."""
    from elektronn2_tpu.training.fused_loop import FusedTrainLoop
    from elektronn2_tpu.ops.warp import DeviceBatchAugmenter

    def build():
        r = np.random.RandomState(0)
        raws = [r.rand(1, 24, 40, 40).astype(np.float32) for _ in range(2)]
        labs = [(r.rand(24, 40, 40) > 0.5).astype(np.int16)
                for _ in range(2)]
        inp = nm.Input([8, 1, 5, 16, 16], "b,f,z,x,y", name="raw")
        c1 = nm.Conv(inp, 4, (1, 3, 3), (1, 2, 2), name="c1")
        probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
        tgt = nm.Input([8, *probs.shape.spatial_shape], "b,z,x,y",
                       dtype="int32", name="target")
        loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                                  target_is_sparse=True))
        m = model_manager.getmodel()
        m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs)
        m.set_opt("SGD", lr=0.05, mom=0.0)
        aug = DeviceBatchAugmenter(
            raws, labs, patch_size=(5, 16, 16),
            target_size=tuple(probs.shape.spatial_shape),
            target_strides=(1, 2, 2), grey_channels=[0], seed=0)
        return m, aug

    m1, aug1 = build()
    loop1 = FusedTrainLoop(m1, aug1, batch_size=8, n_inner=4, warp=0.3,
                           seed=3)
    l1a, _ = loop1.run_chunk()
    l1b, _ = loop1.run_chunk()

    model_manager.reset(seed=11)      # identical init (fixture seed)
    m2, aug2 = build()
    m2.use_mesh(make_mesh({"data": 8}))
    loop2 = FusedTrainLoop(m2, aug2, batch_size=8, n_inner=4, warp=0.3,
                           seed=3)
    l2a, _ = loop2.run_chunk()
    l2b, _ = loop2.run_chunk()
    np.testing.assert_allclose(l1a, l2a, rtol=1e-6)
    np.testing.assert_allclose(l1b, l2b, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m1.params["c1"]["w"]),
                               np.asarray(m2.params["c1"]["w"]),
                               rtol=1e-5, atol=1e-7)


def test_fused_spatial_trainstep_matches_per_step(rng):
    """make_fused_spatial_trainstep: K halo-exchanged DP×SP steps inside
    one lax.scan dispatch == K sequential make_spatial_dp_trainstep calls
    (loss trajectory + final params) — fused_steps composed with the
    spatial mesh."""
    from elektronn2_tpu.parallel import (make_spatial_dp_trainstep,
                                         make_fused_spatial_trainstep,
                                         pad_target_for_spatial)

    def build():
        B, Z, X, Y = 2, 8, 14, 14
        inp = nm.Input([B, 1, Z, X, Y], "b,f,z,x,y", name="raw")
        c1 = nm.Conv(inp, 4, (3, 3, 3), (1, 2, 2), name="c1")
        probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"),
                           name="probs")
        tgt = nm.Input([B, *probs.shape.spatial_shape], "b,z,x,y",
                       dtype="int32", name="target")
        nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True,
                                name="nll")
        m = model_manager.getmodel()
        m.designate_nodes(input_node=inp, target_node=tgt,
                          loss_node=nm.AggregateLoss(nll, name="loss"),
                          prediction_node=probs)
        m.set_opt("SGD", lr=0.05, mom=0.0)
        return m, (B, Z)

    K = 3
    mesh = make_mesh({"data": 2, "space": 4})
    m1, (B, Z) = build()
    step = make_spatial_dp_trainstep(m1, mesh)
    z_out = m1.prediction_node.shape.spatial_shape[0]
    xo, yo = m1.prediction_node.shape.spatial_shape[1:]
    r = np.random.RandomState(0)
    data_K = r.rand(K, B, 1, Z, 14, 14).astype(np.float32)
    tgt_K = np.stack([pad_target_for_spatial(
        (r.rand(B, z_out, xo, yo) > 0.5).astype(np.int32), Z)
        for _ in range(K)])

    key = jax.random.PRNGKey(7)
    keys = []
    k = key
    for _ in range(K):
        k, sub = jax.random.split(k)
        keys.append(sub)
    p, o, s = m1.params, m1.opt_state, m1.state
    ref_losses = []
    hyper = m1.optimiser.current_hyper()
    for i in range(K):
        lv, p, o, s = step(p, o, s, jnp.asarray(data_K[i]),
                           jnp.asarray(tgt_K[i]), hyper, keys[i])
        ref_losses.append(float(lv))

    model_manager.reset(seed=11)    # identical init
    m2, _ = build()
    chunk = make_fused_spatial_trainstep(m2, mesh, n_inner=K)
    losses, p2, o2, s2 = chunk(m2.params, m2.opt_state, m2.state,
                               jnp.asarray(data_K), jnp.asarray(tgt_K),
                               hyper, key)
    np.testing.assert_allclose(np.asarray(losses), ref_losses, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(p2["c1"]["w"]),
                               np.asarray(p["c1"]["w"]),
                               rtol=1e-5, atol=1e-7)


def test_fused_spatial_three_axis_matches_per_step(rng):
    """Fused DP×SP×TP: the K-step fused spatial chunk on a 3-axis mesh
    ({'data':2,'space':2,'model':2}, channels GSPMD-sharded on 'model')
    matches K sequential 3-axis per-step calls."""
    from elektronn2_tpu.parallel import (make_spatial_dp_trainstep,
                                         make_fused_spatial_trainstep,
                                         pad_target_for_spatial)

    def build():
        B, Z = 2, 8
        inp = nm.Input([B, 1, Z, 14, 14], "b,f,z,x,y", name="raw")
        c1 = nm.Conv(inp, 4, (3, 3, 3), (1, 2, 2), name="c1")
        probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"),
                           name="probs")
        tgt = nm.Input([B, *probs.shape.spatial_shape], "b,z,x,y",
                       dtype="int32", name="target")
        nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True,
                                name="nll")
        m = model_manager.getmodel()
        m.designate_nodes(input_node=inp, target_node=tgt,
                          loss_node=nm.AggregateLoss(nll, name="loss"),
                          prediction_node=probs)
        m.set_opt("SGD", lr=0.05, mom=0.0)
        return m, (B, Z)

    K = 2
    mesh = make_mesh({"data": 2, "space": 2, "model": 2})
    m1, (B, Z) = build()
    step = make_spatial_dp_trainstep(m1, mesh, model_axis="model")
    zo, xo, yo = m1.prediction_node.shape.spatial_shape
    r = np.random.RandomState(1)
    data_K = r.rand(K, B, 1, Z, 14, 14).astype(np.float32)
    tgt_K = np.stack([pad_target_for_spatial(
        (r.rand(B, zo, xo, yo) > 0.5).astype(np.int32), Z)
        for _ in range(K)])
    key = jax.random.PRNGKey(5)
    k, ks = key, []
    for _ in range(K):
        k, sub = jax.random.split(k)
        ks.append(sub)
    hyper = m1.optimiser.current_hyper()
    p, o, s = m1.params, m1.opt_state, m1.state
    ref = []
    for i in range(K):
        lv, p, o, s = step(p, o, s, jnp.asarray(data_K[i]),
                           jnp.asarray(tgt_K[i]), hyper, ks[i])
        ref.append(float(lv))

    model_manager.reset(seed=11)
    m2, _ = build()
    chunk = make_fused_spatial_trainstep(m2, mesh, n_inner=K,
                                         model_axis="model")
    losses, p2, _, _ = chunk(m2.params, m2.opt_state, m2.state,
                             jnp.asarray(data_K), jnp.asarray(tgt_K),
                             hyper, key)
    assert p2["c1"]["w"].sharding.spec[0] == "model"   # TP survives
    np.testing.assert_allclose(np.asarray(losses), ref, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(p2["c1"]["w"]),
                               np.asarray(p["c1"]["w"]),
                               rtol=1e-5, atol=1e-7)


def test_hostfed_fused_composes_with_dp_mesh(rng):
    """HostFedFusedLoop under Model.use_mesh (2-way DP): chunk losses and
    params match the single-device host-fed loop — host data sources get
    the same mesh composition as device-sampled ones."""
    from test_training import _fused_setup
    from elektronn2_tpu.training.fused_loop import HostFedFusedLoop

    m1, aug1 = _fused_setup(np.random.RandomState(5))
    aug1.reseed(7)
    loop1 = HostFedFusedLoop(m1, aug1, batch_size=2, n_inner=3,
                             batch_args={"warp": 0.0}, seed=3,
                             prefetch=False)
    l1a, _ = loop1.run_chunk()
    l1b, _ = loop1.run_chunk()
    loop1.close()

    m2, aug2 = _fused_setup(np.random.RandomState(5))   # resets seed=21
    aug2.reseed(7)
    m2.use_mesh(make_mesh({"data": 2}, n_devices=2))
    loop2 = HostFedFusedLoop(m2, aug2, batch_size=2, n_inner=3,
                             batch_args={"warp": 0.0}, seed=3,
                             prefetch=False)
    l2a, _ = loop2.run_chunk()
    l2b, _ = loop2.run_chunk()
    loop2.close()
    np.testing.assert_allclose(l1a, l2a, rtol=1e-6)
    np.testing.assert_allclose(l1b, l2b, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m1.params["c1"]["w"]),
                               np.asarray(m2.params["c1"]["w"]),
                               rtol=1e-5, atol=1e-7)


def test_gpipe_trainstep_depth_fuzz(rng):
    """Fuzz PP over random chain depths / microbatch counts: the
    pipelined Model step must equal Model.trainingstep on every draw."""
    from elektronn2_tpu.parallel import make_gpipe_trainstep, microbatch

    for draw in range(2):
        r = np.random.RandomState(50 + draw)
        depth = int(r.choice([2, 4]))
        M = depth                        # stages == n_micro == mesh width
        b_mb = int(r.choice([1, 2]))
        B = M * b_mb

        def build(name):
            inp = nm.Input([B, 1, 9, 16, 16], "b,f,z,x,y", name="raw")
            h = inp
            for i in range(depth - 1):
                h = nm.Conv(h, 4 + 2 * i, (1, 3, 3) if i == 0 else
                            (3, 3, 3),
                            (1, 2, 2) if i == 0 else (1, 1, 1),
                            name=f"c{i}")
            logits = nm.Conv(h, 2, 1, 1, activation_func="lin",
                             name="logits")
            probs = nm.Softmax(logits, name="probs")
            tgt = nm.Input([B, *probs.shape.spatial_shape], "b,z,x,y",
                           dtype="int32", name="target")
            loss = nm.AggregateLoss(nm.MultinoulliNLL(
                probs, tgt, target_is_sparse=True))
            m = model_manager.getmodel(name)
            m.designate_nodes(input_node=inp, target_node=tgt,
                              loss_node=loss, prediction_node=probs)
            m.set_opt("SGD", lr=0.05, mom=0.0)
            return m, probs

        model_manager.reset(seed=60 + draw)
        m_ref, probs = build(f"fz_ref{draw}")
        out_sp = probs.shape.spatial_shape
        d = r.rand(B, 1, 9, 16, 16).astype(np.float32)
        t = (r.rand(B, *out_sp) > 0.5).astype(np.int32)
        l_ref, _ = m_ref.trainingstep(d, t)

        model_manager.reset(seed=60 + draw)
        m_pp, _ = build(f"fz_pp{draw}")
        mesh = make_mesh({"pipe": M}, devices=jax.devices()[:M])
        step = make_gpipe_trainstep(m_pp, mesh, n_micro=M, mb_batch=b_mb)
        xm = microbatch(jnp.asarray(d), M)
        ym = microbatch(jnp.asarray(t), M)
        lv, new_p, _ = step(m_pp.params, m_pp.opt_state, xm, ym,
                            m_pp.optimiser.current_hyper())
        np.testing.assert_allclose(float(lv), float(l_ref), rtol=2e-5,
                                   err_msg=f"draw {draw}: depth={depth} "
                                           f"b_mb={b_mb}")
        np.testing.assert_allclose(np.asarray(new_p["c0"]["w"]),
                                   np.asarray(m_ref.params["c0"]["w"]),
                                   rtol=1e-4, atol=1e-6)


def test_spatial_training_rejects_batchnorm():
    """BN train-mode statistics would include the last rank's zero-halo
    garbage rows under z-sharding — construction must raise."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.parallel import (make_mesh,
                                         make_spatial_dp_trainstep)
    nm.model_manager.reset(seed=1)
    inp = nm.Input([2, 1, 8, 12, 12], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 1, batch_normalisation=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([2, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt("SGD", lr=1e-2)
    mesh = make_mesh({"data": 2, "space": 2}, n_devices=4)
    with pytest.raises(ValueError, match="BatchNorm"):
        make_spatial_dp_trainstep(m, mesh)


def test_repair_fuckup_under_mesh(rng):
    """Blowup rollback preserves committed shardings + optimiser state
    under a DP mesh, and survives a SECOND blowup before the next
    snapshot (restore hands out copies, not the snapshot itself)."""
    B = 8
    m = build_model(B)
    m.set_opt("Adam", lr=1e-2)
    m.use_mesh(make_mesh({"data": 8}))
    x = rng.randn(*m.input_node.shape.shape).astype(np.float32)
    y = (rng.rand(*m.target_node.shape.shape) > 0.5).astype(np.int32) \
        if m.target_node.shape.shape[-1] != 2 else \
        rng.randn(*m.target_node.shape.shape).astype(np.float32)
    l0, _ = m.trainingstep(x, y)
    m.snapshot_good()
    good_w = np.asarray(jax.tree_util.tree_leaves(m.params)[0]).copy()
    good_step = int(np.asarray(m.opt_state["step"]))
    for attempt in range(2):      # second rollback reuses the snapshot
        bad = jax.tree_util.tree_map(lambda a: jnp.full_like(a, np.nan),
                                     m.params)
        m.params = jax.device_put(bad, m._param_shardings())
        assert m.repair_fuckup(lr_scale=0.5) is True
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(m.params)[0]), good_w)
        assert int(np.asarray(m.opt_state["step"])) == good_step
    # training continues finitely, still sharded
    lv, _ = m.trainingstep(x, y)
    assert np.isfinite(float(lv))
    assert m.optimiser.hyperparams["lr"] == pytest.approx(2.5e-3)


def test_sharded_checkpoint_restart(rng, tmp_path):
    """Restart-from-checkpoint ACROSS a mesh (SURVEY §6, VERDICT r3 #5):
    a DP×TP-sharded model trains 2 steps, saves through orbax, a fresh
    model restores from the directory, re-shards onto the same mesh and
    continues — final params equal the uninterrupted 4-step run. A second
    restore onto a DIFFERENT mesh shape (pure DP over all 8 devices) must
    converge identically too: sharding is layout, not math."""
    from elektronn2_tpu.neuromancer.model import modelload

    B = 8
    xs = [rng.randn(B, 1, 16, 16).astype(np.float32) for _ in range(2)]
    ys = [(rng.rand(B, 7, 7) > 0.5).astype(np.int32) for _ in range(2)]
    mesh = make_mesh({"data": 2, "model": 4})

    def build():
        model_manager.reset(seed=11)
        m = build_model(B)
        m.set_opt("Adam", lr=1e-3)
        return m

    m_full = build()
    m_full.use_mesh(mesh, model_axis="model")
    for i in range(4):
        m_full.trainingstep(xs[i % 2], ys[i % 2])

    m_a = build()
    m_a.use_mesh(mesh, model_axis="model")
    for i in range(2):
        m_a.trainingstep(xs[i % 2], ys[i % 2])
    ck = str(tmp_path / "ck.mdl")
    m_a.save(ck, backend="orbax")

    # same mesh shape
    m_b = modelload(ck)
    assert m_b._step_count == 2           # optimiser step carried
    m_b.use_mesh(mesh, model_axis="model")
    for i in range(2, 4):
        m_b.trainingstep(xs[i % 2], ys[i % 2])
    for nname, pd in m_full.params.items():
        for pname, v in pd.items():
            np.testing.assert_allclose(
                np.asarray(m_b.params[nname][pname]), np.asarray(v),
                rtol=1e-5, atol=1e-7, err_msg=f"{nname}/{pname} (same mesh)")

    # different mesh shape (4x2 DPxTP checkpoint -> 8-way DP restore)
    m_c = modelload(ck)
    m_c.use_mesh(make_mesh({"data": 8}))
    for i in range(2, 4):
        m_c.trainingstep(xs[i % 2], ys[i % 2])
    for nname, pd in m_full.params.items():
        for pname, v in pd.items():
            np.testing.assert_allclose(
                np.asarray(m_c.params[nname][pname]), np.asarray(v),
                rtol=1e-5, atol=1e-7,
                err_msg=f"{nname}/{pname} (re-meshed)")


def test_trainer_resume_with_mesh(rng, tmp_path):
    """Trainer(resume=True) + mesh_axes (VERDICT r3 #5): a meshed run's
    rolling checkpoint is an orbax DIRECTORY (collective multi-host-safe
    save); a fresh Trainer restores it, re-shards onto the configured
    mesh, and continues from the saved step."""
    import os
    from scipy import ndimage
    from elektronn2_tpu.data import DeviceBatchAugmenter
    from elektronn2_tpu.training.trainer import Trainer

    def setup():
        model_manager.reset(seed=21)
        r = np.random.RandomState(3)
        raws = [ndimage.gaussian_filter(r.randn(24, 40, 40), 2
                                        ).astype(np.float32)[None]]
        labs = [(ndimage.gaussian_filter(r.randn(24, 40, 40), 4) > 0
                 ).astype(np.int16)]
        inp = nm.Input([8, 1, 8, 16, 16], "b,f,z,x,y", name="raw")
        c1 = nm.Conv(inp, 6, (3, 3, 3), (1, 2, 2), name="c1")
        probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
        tgt = nm.Input([8, *probs.shape.spatial_shape], "b,z,x,y",
                       dtype="int32", name="target")
        loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                                  target_is_sparse=True))
        m = model_manager.getmodel()
        m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs)
        m.set_opt("Adam", lr=1e-3)
        aug = DeviceBatchAugmenter(
            raws, labs, patch_size=(8, 16, 16),
            target_size=tuple(probs.shape.spatial_shape),
            target_strides=tuple(probs.shape.strides), warp_amount=0.5,
            seed=5)
        return m, aug

    m, aug = setup()
    tr1 = Trainer(model=m, data=aug, batch_size=8, n_steps=2,
                  mesh_axes={"data": 8}, history_freq=0, save_freq=0,
                  n_workers=0, save_path=str(tmp_path), save_name="mres",
                  data_batch_args={"warp": 0.0})
    tr1.run()
    ck = os.path.join(str(tmp_path), "mres-LAST.mdl")
    assert os.path.isdir(ck), "meshed checkpoint should be an orbax dir"

    _, aug2 = setup()
    tr2 = Trainer(data=aug2, batch_size=8, n_steps=4, resume=True,
                  mesh_axes={"data": 8}, history_freq=0, save_freq=0,
                  n_workers=0, save_path=str(tmp_path), save_name="mres",
                  data_batch_args={"warp": 0.0})
    assert tr2.step == 2
    assert getattr(tr2.model, "_mesh", None) is not None
    tr2.run()
    assert tr2.step == 4
    w = np.asarray(tr2.model.params["c1"]["w"])
    assert np.isfinite(w).all()
