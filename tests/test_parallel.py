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

    # unsharded reference
    from elektronn2_tpu.ops.conv import conv, pooling
    from elektronn2_tpu.ops.activations import get_activation
    h = x
    for l in layers:
        h = conv(h, l["w"]) + l["b"].reshape(1, -1, 1, 1, 1)
        h = get_activation(l["activation"])(h)
        if l.get("pool"):
            h = pooling(h, l["pool"])
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
