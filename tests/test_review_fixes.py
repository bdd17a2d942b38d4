"""Regression tests for code-review findings (round-1 review pass)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import elektronn2_tpu.neuromancer as nm
from elektronn2_tpu.neuromancer import model_manager


@pytest.fixture(autouse=True)
def fresh_graph():
    model_manager.reset(seed=13)
    yield


def test_elastic_applies_to_target_host(rng):
    """Labels must follow the image's elastic deformation (host path)."""
    from elektronn2_tpu.data.transformations import (
        warp_slice, make_elastic_field, warp_coords,
        map_coordinates_nearest)
    vol = rng.rand(1, 30, 30, 30).astype(np.float32)
    lab = np.arange(30 ** 3).reshape(30, 30, 30).astype(np.int32)
    field = make_elastic_field(rng, (8, 8, 8), grid=3, sigma=2.0)
    pos = np.array([15.0, 15.0, 15.0])
    d, t = warp_slice(vol, (8, 8, 8), position=pos, target=lab,
                      target_patch_size=(8, 8, 8), elastic=field)
    coords, _ = warp_coords((8, 8, 8), None, pos, field)
    want = map_coordinates_nearest(lab, coords).reshape(8, 8, 8)
    np.testing.assert_array_equal(t, want)


def test_elastic_applies_to_target_device(rng):
    from elektronn2_tpu.data.transformations import make_elastic_field
    from elektronn2_tpu.data.transformations import warp_slice
    from elektronn2_tpu.ops.warp import warp_patch
    vol = rng.rand(1, 30, 30, 30).astype(np.float32)
    lab = rng.randint(0, 9, (30, 30, 30)).astype(np.int32)
    field = make_elastic_field(rng, (8, 8, 8), grid=3, sigma=1.5)
    pos = np.array([15.0, 15.0, 15.0])
    hd, ht = warp_slice(vol, (8, 8, 8), position=pos, target=lab,
                        target_patch_size=(8, 8, 8), elastic=field)
    dd, dt = warp_patch(jnp.asarray(vol), jnp.eye(4),
                        jnp.asarray(pos, jnp.float32), (8, 8, 8),
                        target=jnp.asarray(lab),
                        target_patch_size=(8, 8, 8),
                        elastic=jnp.asarray(field, jnp.float32))
    np.testing.assert_allclose(np.asarray(dd), hd, atol=1e-4)
    assert (np.asarray(dt) == ht).mean() > 0.97


def test_warp_args_not_mutated(rng):
    from elektronn2_tpu.data import BatchCreatorImage
    raws = [rng.rand(1, 32, 32, 32).astype(np.float32)]
    labs = [(raws[0][0] > 0.5).astype(np.int16)]
    bc = BatchCreatorImage(input_data=raws, target_data=labs)
    bc.set_geometry((9, 9, 9), (3, 3, 3))
    wa = {"amount": 0.2}
    bc.getbatch(batch_size=4, warp=1.0, warp_args=wa)
    assert wa == {"amount": 0.2}


def test_griddata_pairing_with_nonsuffix_valid(rng):
    from elektronn2_tpu.data import GridData
    raws = [rng.rand(1, 16, 16, 16).astype(np.float32) for _ in range(3)]
    labs = [np.zeros((16, 16, 16), np.int16) for _ in range(3)]
    pts = [np.array([[2.0, 2, 2]]), np.array([[8.0, 8, 8]]),
           np.array([[12.0, 12, 12]])]
    gd = GridData(input_data=raws, target_data=labs, valid_cubes=[0],
                  grid_points=pts, point_radius=1)
    # cube 0 (valid) gets point (2,2,2); cube 1 gets (8,8,8); cube 2 (12,..)
    assert gd.valid_l[0][2, 2, 2] == 1 and gd.valid_l[0][8, 8, 8] == 0
    assert gd.train_l[0][8, 8, 8] == 1
    assert gd.train_l[1][12, 12, 12] == 1


def test_dilated_avg_pool_matches_tiled(rng):
    inp = nm.Input([1, 1, 17, 17], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 1, name="c1")
    p = nm.Pool(c1, 2, mfp=True, mode="avg", name="avgpool")
    probs = nm.Softmax(nm.Conv(p, 2, 1, 1, activation_func="lin"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    raw = rng.rand(1, 25, 25).astype(np.float32)
    host = m.predict_dense(raw, prefer_device=False)
    dev = np.asarray(m.predict_dense_device(jnp.asarray(raw)))
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_tiled_fallback_crops_alignment_padding(rng):
    """Fallback (unsupported graph) output shape == host predict_dense."""
    inp = nm.Input([1, 1, 21, 21], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    bn = nm.BatchNorm(c1)             # no trained stats → dilated rejects
    probs = nm.Softmax(nm.Conv(bn, 2, 1, 1, activation_func="lin"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    # volume size chosen so (V - tile) % g != 0
    for V, pad_raw in [(29, False), (30, True)]:
        raw = rng.rand(1, V, V).astype(np.float32)
        host = m.predict_dense(raw, pad_raw=pad_raw, prefer_device=False)
        dev = np.asarray(m.predict_dense_device(jnp.asarray(raw),
                                                pad_raw=pad_raw))
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host, atol=1e-5)


def test_perceptron_bn_prelu_on_sequence_layout(rng):
    seq = nm.Input([4, 2, 6], "s,b,f", name="seq")
    p = nm.Perceptron(seq, 8, activation_func="prelu",
                      batch_normalisation=True, name="p")
    m = model_manager.getmodel()
    v = rng.randn(4, 2, 6).astype(np.float32)
    outs, _ = m._apply([p], m.params, {}, {"seq": v}, None, True)
    out = np.asarray(outs[0])
    assert out.shape == (4, 2, 8)
    assert np.isfinite(out).all()


def test_modelload_override_mfp(rng, tmp_path):
    inp = nm.Input([1, 1, 16, 16], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    f = str(tmp_path / "m.mdl")
    m.save(f)
    m2 = nm.modelload(f, override_mfp_to_active=True,
                      imposed_patch_size=[17, 17])
    assert m2.input_node.shape.spatial_shape == (17, 17)
    assert m2.nodes["c1"].mfp is True
    np.testing.assert_array_equal(np.asarray(m.params["c1"]["w"]),
                                  np.asarray(m2.params["c1"]["w"]))


def test_malis_custom_aff_gt():
    """Custom ground-truth affinities steer the constrained positive pass:
    capping an edge's gt affinity re-routes maximin pairs to other edges."""
    from elektronn2_tpu.malis import malis_weights
    seg = np.array([[[1, 1, 1]]], np.int32)     # one object, chain of 3
    nh = np.array([[0, 0, -1]], np.int32)
    aff = np.zeros((1, 1, 1, 3), np.float32)
    aff[0, 0, 0] = [0, 0.5, 0.9]
    pos_default, _ = malis_weights(aff, seg, nh)
    # default (gt all-connected): e2 (0.9) merges first → pos=[_,2,1]
    np.testing.assert_array_equal(pos_default[0, 0, 0], [0, 2, 1])
    custom = np.zeros((1, 1, 1, 3), np.float32)
    custom[0, 0, 0] = [0, 1, 0]                # cap e2's gt affinity to 0
    pos_custom, _ = malis_weights(aff, seg, nh, aff_gt=custom)
    # constrained aff = [_, .5, 0]: e1 merges first → pos=[_,1,2]
    np.testing.assert_array_equal(pos_custom[0, 0, 0], [0, 1, 2])


def test_sgd_nesterov_roundtrip(rng, tmp_path):
    inp = nm.Input([1, 4], "b,f", name="raw")
    p = nm.Perceptron(inp, 2, activation_func="lin", name="p")
    tgt = nm.Input([1, 2], "b,f", name="t")
    loss = nm.AggregateLoss(nm.SquaredLoss(p, tgt))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=p)
    m.set_opt("SGD", lr=0.1, nesterov=True)
    assert m.optimiser.nesterov
    f = str(tmp_path / "m.mdl")
    m.save(f)
    m2 = nm.modelload(f)
    assert m2.optimiser.nesterov is True


def test_device_augmenter_valid_split(rng):
    from elektronn2_tpu.data import DeviceBatchAugmenter
    raws = [np.full((1, 16, 16, 16), float(i), np.float32)
            for i in range(3)]
    labs = [np.full((16, 16, 16), i, np.int16) for i in range(3)]
    aug = DeviceBatchAugmenter(raws, labs, patch_size=(6, 6, 6),
                               target_size=(6, 6, 6), grey_channels=[0],
                               valid_cubes=[2])
    d, t = aug.getbatch(8, warp=0.5, source="train")
    assert not np.any(np.asarray(t) == 2)        # valid cube never sampled
    dv, tv = aug.getbatch(4, warp=0.5, source="valid")
    assert np.all(np.asarray(tv) == 2)
    # validation data is unaugmented (constant cube stays constant)
    np.testing.assert_allclose(np.asarray(dv), 2.0, atol=1e-6)


def test_device_augmenter_float_targets(rng):
    from elektronn2_tpu.data import DeviceBatchAugmenter
    raws = [rng.rand(1, 16, 16, 16).astype(np.float32)]
    labs = [rng.rand(16, 16, 16).astype(np.float32)]
    aug = DeviceBatchAugmenter(raws, labs, patch_size=(6, 6, 6))
    d, t = aug.getbatch(2, warp=0.0)
    assert np.asarray(t).dtype == np.float32
    assert 0 < np.asarray(t).max() < 1


def test_helpful_error_messages(rng):
    """Common user mistakes produce actionable errors."""
    inp = nm.Input([1, 1, 16, 16], "b,f,x,y", name="raw")
    with pytest.raises(ValueError, match="cnncalculator"):
        nm.Conv(inp, 4, 3, 3, name="badpool")     # 14 % 3 != 0
    c1 = nm.Conv(inp, 4, 3, 2, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    aux = nm.GenericInput(name="aux")
    merged = nm.ApplyFunc(aux, lambda v: v, name="aux_passthrough")
    with pytest.raises(KeyError, match="no value fed|aux"):
        m.get_activations(rng.rand(1, 1, 16, 16).astype(np.float32),
                          ["aux_passthrough"])    # aux not fed
    with pytest.raises(ValueError, match="rank"):
        m.predict(rng.rand(16, 16).astype(np.float32))  # rank mismatch
    with pytest.raises(ValueError, match="unknown optimiser"):
        m.set_opt("Adamm")
    with pytest.raises(ValueError, match="unknown hyperparams"):
        m.set_opt("Adam", momentum=0.9)
    with pytest.raises(ValueError, match="activation"):
        nm.Conv(c1, 2, 1, 1, activation_func="rellu")


def test_param_init_determinism():
    """Same manager seed → identical parameter initialisation."""
    model_manager.reset(seed=42)
    inp = nm.Input([1, 1, 9, 9], "b,f,x,y", name="raw")
    c = nm.Conv(inp, 4, 3, 1, name="c1")
    w1 = np.asarray(c.params["w"]).copy()
    model_manager.reset(seed=42)
    inp = nm.Input([1, 1, 9, 9], "b,f,x,y", name="raw")
    c = nm.Conv(inp, 4, 3, 1, name="c1")
    np.testing.assert_array_equal(w1, np.asarray(c.params["w"]))
    model_manager.reset(seed=43)
    inp = nm.Input([1, 1, 9, 9], "b,f,x,y", name="raw")
    c = nm.Conv(inp, 4, 3, 1, name="c1")
    assert not np.array_equal(w1, np.asarray(c.params["w"]))


def test_model_seed_reproducible_dropout(rng):
    inp = nm.Input([1, 8], "b,f", name="raw")
    d = nm.Dropout(inp, rate=0.5)
    p = nm.Perceptron(d, 4, activation_func="lin")
    tgt = nm.Input([1, 4], "b,f", name="t")
    loss = nm.AggregateLoss(nm.SquaredLoss(p, tgt))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=p)
    m.set_opt("SGD", lr=0.1, mom=0.0)
    x = rng.randn(1, 8).astype(np.float32)
    y = rng.randn(1, 4).astype(np.float32)
    m.seed(7)
    l1 = [float(m.trainingstep(x, y)[0]) for _ in range(3)]
    w1 = np.asarray(m.params["dot"]["w"]).copy()
    # reset params + rng → identical trajectory
    model_manager.reset(seed=13)
    inp = nm.Input([1, 8], "b,f", name="raw")
    d = nm.Dropout(inp, rate=0.5)
    p = nm.Perceptron(d, 4, activation_func="lin")
    tgt = nm.Input([1, 4], "b,f", name="t")
    loss = nm.AggregateLoss(nm.SquaredLoss(p, tgt))
    m2 = model_manager.getmodel()
    m2.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                       prediction_node=p)
    m2.set_opt("SGD", lr=0.1, mom=0.0)
    m2.seed(7)
    l2 = [float(m2.trainingstep(x, y)[0]) for _ in range(3)]
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


def test_dilated_cache_tracks_training(rng):
    """predict_dense_device must reflect CURRENT weights — the cached jit
    wrapper takes params as arguments, not trace-time constants."""
    from elektronn2_tpu.utils import cnncalculator
    calc = cnncalculator([3], [2], desired_patch_size=13, mfp=True, ndim=1)
    n = calc.input
    inp = nm.Input([1, 1, n, n], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"),
                       name="probs")
    tgt = nm.Input([probs.shape["b"], *probs.shape.spatial_shape],
                   "b,x,y", dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt("SGD", lr=0.5, mom=0.0)
    raw = rng.rand(1, 20, 20).astype(np.float32)
    before = np.asarray(m.predict_dense_device(jnp.asarray(raw)))
    x = rng.rand(4, 1, n, n).astype(np.float32)
    y = (rng.rand(16, *probs.shape.spatial_shape) > 0.5).astype(np.int32)
    for _ in range(3):
        m.trainingstep(x, y)
    after = np.asarray(m.predict_dense_device(jnp.asarray(raw)))
    assert not np.allclose(before, after)          # weights moved
    host = m.predict_dense(raw, prefer_device=False)                    # host path, fresh params
    np.testing.assert_allclose(after, host, atol=1e-5)


def test_rebuild_model_resizes_target_input(rng):
    """imposed_patch_size must not blindly overwrite the target Input —
    its spatial dims are recomputed from the new prediction geometry."""
    model = nm.simple_cnn(batch_size=1, n_ch=1, n_lab=2,
                          desired_input=[16, 16], filters=[3, 3],
                          pools=[2, 1], nof_filters=[4, 4], ndim=2)
    new = nm.rebuild_model(model, imposed_patch_size=[20, 20])
    assert new.input_node.shape.spatial_shape == (20, 20)
    assert (tuple(new.target_node.shape.spatial_shape)
            == tuple(new.prediction_node.shape.spatial_shape))
    x = rng.rand(*new.input_node.shape).astype(np.float32)
    y = (rng.rand(new.target_node.shape["b"],
                  *new.target_node.shape.spatial_shape) > 0.5
         ).astype(np.int32)
    new.set_opt("SGD", lr=1e-3)
    l, _ = new.trainingstep(x, y)
    assert np.isfinite(float(l))


def test_rebuild_model_tuple_encoded_input(rng):
    """Inputs constructed with tuple shape/tags still honour the patch
    override (the {'__tuple__': ...} encoding is normalised)."""
    inp = nm.Input((1, 1, 12, 12), ("b", "f", "x", "y"), name="raw")
    c1 = nm.Conv(inp, 2, 3, 1, name="c1")
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=c1)
    new = nm.rebuild_model(m, imposed_patch_size=[16, 16])
    assert new.input_node.shape.spatial_shape == (16, 16)


def test_rebuild_model_keeps_bn_state(rng):
    inp = nm.Input([1, 1, 12, 12], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 1, batch_normalisation=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([1, *probs.shape.spatial_shape], "b,x,y",
                   dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt("SGD", lr=1e-3)
    x = rng.rand(1, 1, 12, 12).astype(np.float32)
    y = (rng.rand(1, *probs.shape.spatial_shape) > 0.5).astype(np.int32)
    m.trainingstep(x, y)
    assert "c1" in m.state
    new = nm.rebuild_model(m, imposed_patch_size=[14, 14])
    assert "c1" in new.state          # BN running stats carried over


def test_bn_with_maxout(rng):
    """BN before a maxout activation is sized for pre-maxout channels."""
    inp = nm.Input([2, 1, 10, 10], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 8, 3, 1, activation_func="maxout:2",
                 batch_normalisation=True, name="c1")
    assert c1.shape["f"] == 4
    tgt = nm.Input([2, *c1.shape.spatial_shape], "b,x,y", dtype="int32",
                   name="target")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt("SGD", lr=1e-3)
    x = rng.rand(2, 1, 10, 10).astype(np.float32)
    y = (rng.rand(2, 8, 8) > 0.5).astype(np.int32)
    l, _ = m.trainingstep(x, y)
    assert np.isfinite(float(l))


def test_gru_rejects_bad_activation():
    x_t = nm.Input([2, 3], "b,f", name="x_t")
    h0 = nm.InitialState_like(x_t, override_f=4, name="h0")
    with pytest.raises(ValueError, match="activation"):
        nm.GRU(x_t, h0, n_f=4, activation_func="tanhh")
    with pytest.raises(ValueError, match="GRU/LSTM"):
        nm.GRU(x_t, h0, n_f=4, activation_func="maxout:2")


def test_pad_rejected_in_dense_prediction(rng):
    inp = nm.Input([1, 1, 12, 12], "b,f,x,y", name="raw")
    pad = nm.Pad(inp, 1)
    c1 = nm.Conv(pad, 2, 3, 1, name="c1")
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=c1)
    with pytest.raises(ValueError, match="Pad"):
        m.predict_dense(rng.rand(1, 20, 20).astype(np.float32))


def test_simple_cnn_regression_target(rng):
    m = nm.simple_cnn(batch_size=1, n_ch=1, n_lab=3,
                      desired_input=[14, 14], filters=[3], pools=[1],
                      nof_filters=[4], ndim=2, target="regression")
    x = rng.rand(*m.input_node.shape).astype(np.float32)
    y = rng.rand(*m.target_node.shape).astype(np.float32)
    m.set_opt("Adam", lr=1e-3)
    l, _ = m.trainingstep(x, y)
    assert np.isfinite(float(l))
    with pytest.raises(ValueError, match="simple_cnn target"):
        nm.simple_cnn(batch_size=1, n_ch=1, n_lab=2, desired_input=[14, 14],
                      filters=[3], pools=[1], nof_filters=[4], ndim=2,
                      target="bogus")


def test_perspective_warp_usable(rng):
    """get_random_warp_params(perspective_on=True) → make_warp_matrix
    (kwarg used to shadow the module function and crash)."""
    from elektronn2_tpu.data.transformations import (
        get_random_warp_params, make_warp_matrix, warp_slice)
    params = get_random_warp_params(np.random.RandomState(0), amount=0.3,
                                    perspective_on=True)
    assert "perspective" in params
    M = make_warp_matrix(**params)
    assert M.shape == (4, 4) and M[3, :3].any()
    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    out = warp_slice(vol, (6, 6, 6), M=M,
                     position=np.array([12.0, 12.0, 12.0]))
    assert np.isfinite(out).all()


def test_knossos_backed_warp_direct(rng, tmp_path):
    """warp_slice directly over a KnossosArray (the documented lazy path,
    which indexes with Ellipsis)."""
    from test_data import write_knossos
    from elektronn2_tpu.data import KnossosArray
    from elektronn2_tpu.data.transformations import warp_slice
    vol = (rng.rand(24, 24, 24) * 255).astype(np.uint8)
    path = write_knossos(tmp_path, vol, cube_edge=8)
    ka = KnossosArray(path, cube_edge=8)
    out = warp_slice(ka, (8, 8, 8))
    want = warp_slice(vol.astype(np.float32), (8, 8, 8))
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_aniso_factor_scales_warp(rng):
    from elektronn2_tpu.data.transformations import (aniso_warp_matrix,
                                                     rotate_axis)
    # a physical 90° rotation about y maps z→x; with 2:1 z-anisotropy the
    # voxel-space matrix must halve/double accordingly
    M = rotate_axis([0, 0, 1], np.pi / 2)   # rotate about the y axis
    Ma = aniso_warp_matrix(M, 2.0)
    # column scaling: voxel-z input (physical 2z) lands on x at 2×
    v = Ma[:3, :3] @ np.array([1.0, 0, 0])
    assert abs(abs(v[1]) - 2.0) < 1e-9      # z-voxel → 2 x-voxels
    assert abs(aniso_warp_matrix(M, 1.0) - M).max() == 0


def test_griddata_4d_targets(rng):
    from elektronn2_tpu.data import GridData
    raws = [rng.rand(1, 16, 16, 16).astype(np.float32)]
    labs = [np.zeros((2, 16, 16, 16), np.int16)]   # multi-channel target
    gd = GridData(input_data=raws, target_data=labs,
                  grid_points=[np.array([[8.0, 8, 8]])], point_radius=1)
    assert gd.train_l[0][0, 8, 8, 8] == 1
    assert gd.train_l[0][1, 8, 8, 8] == 1


def test_worker_error_flag_with_full_queue():
    from elektronn2_tpu.training.parallelisation import BackgroundProc
    bg = BackgroundProc(_slow_then_boom, n_proc=1, queue_size=1,
                        mode="process")
    import time
    time.sleep(1.0)     # let the worker fill the queue and then fail
    first = bg.get(timeout=5)           # queued good item drains first
    assert np.asarray(first).shape == (3,)
    with pytest.raises(RuntimeError):
        bg.get(timeout=5)
        bg.get(timeout=5)               # error surfaces within 2 gets
    bg.shutdown()


def _slow_then_boom():
    if not hasattr(_slow_then_boom, "n"):
        _slow_then_boom.n = 0
    _slow_then_boom.n += 1
    if _slow_then_boom.n > 1:
        raise ValueError("boom")
    return np.zeros(3)


# ---- session review batch 4 ------------------------------------------------

def test_s2b_sum_pooling_matches_direct(rng):
    """Pool(mode='sum') through the s2b lowering must NOT be averaged."""
    import jax.numpy as jnp
    from jax import lax
    from elektronn2_tpu.ops.conv import pool_s2b
    x = jnp.asarray(rng.randn(1, 2, 13, 13).astype(np.float32))
    direct = lax.reduce_window(x, 0.0, lax.add, (1, 1, 2, 2),
                               (1,) * 4, "VALID",
                               window_dilation=(1, 1, 2, 2))
    s2b = pool_s2b(x, (2, 2), (2, 2), mode="sum")
    np.testing.assert_allclose(np.asarray(direct), np.asarray(s2b),
                               atol=1e-6)


def test_tp_perceptron_sharded_on_output_dim(rng):
    import jax
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer import model_manager
    from elektronn2_tpu.parallel import make_mesh
    model_manager.reset(seed=2)
    inp = nm.Input([4, 12], "b,f", name="raw")
    h = nm.Perceptron(inp, 16, name="fc1")      # w: (12, 16)
    out = nm.Perceptron(h, 8, activation_func="lin", name="fc2")
    tgt = nm.Input([4, 8], "b,f", name="target")
    loss = nm.AggregateLoss(nm.SquaredLoss(out, tgt))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=out)
    m.set_opt("Adam", lr=1e-3)
    m.use_mesh(make_mesh({"data": 2, "model": 4}), model_axis="model")
    # output dim (16) divides 4 → sharded on dim 1, NOT dim 0
    assert m.params["fc1"]["w"].sharding.spec[1] == "model"
    assert m.params["fc1"]["w"].sharding.spec[0] is None
    x = rng.randn(4, 12).astype(np.float32)
    y = rng.randn(4, 8).astype(np.float32)
    l0, _ = m.trainingstep(x, y)
    assert np.isfinite(float(l0))


def test_fused_steps_rejects_tracing_trainer(rng, tmp_path):
    from elektronn2_tpu.training.trainer import Trainer

    class CarryTrainer(Trainer):
        def _step_kwargs(self):
            return {}       # empty NOW, but the subclass injects later

    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer import model_manager
    from elektronn2_tpu.data import DeviceBatchAugmenter
    model_manager.reset(seed=4)
    inp = nm.Input([2, 1, 4, 8, 8], "b,f,z,x,y", name="raw")
    probs = nm.Softmax(nm.Conv(inp, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([2, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    aug = DeviceBatchAugmenter([np.zeros((1, 8, 16, 16), np.float32)],
                               [np.zeros((8, 16, 16), np.int16)],
                               patch_size=(4, 8, 8),
                               target_size=(4, 8, 8))
    tr = CarryTrainer(model=m, data=aug, n_steps=4, fused_steps=2,
                      save_path=str(tmp_path), save_name="x")
    with pytest.raises(ValueError):
        tr.run()


def test_shim_propagates_inner_import_errors():
    """A dependency failing INSIDE a real module must not be reported as
    'no module named elektronn2.X'."""
    import sys
    import elektronn2  # installs the finder
    # fabricate a real module whose import fails on a missing dependency
    import elektronn2_tpu
    import os
    path = os.path.join(os.path.dirname(elektronn2_tpu.__file__),
                        "_shimtest_dep.py")
    with open(path, "w") as f:
        f.write("import definitely_not_a_module_xyz\n")
    try:
        with pytest.raises(ModuleNotFoundError) as ei:
            import elektronn2._shimtest_dep  # noqa: F401
        assert "definitely_not_a_module_xyz" in str(ei.value)
    finally:
        os.remove(path)
        sys.modules.pop("elektronn2_tpu._shimtest_dep", None)


def test_predict_dense_validates_before_device_routing(rng):
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer import model_manager
    model_manager.reset(seed=5)
    inp = nm.Input([1, 2, 16, 16], "b,f,x,y", name="raw")   # 2 channels
    probs = nm.Softmax(nm.Conv(inp, 2, 3, 1, activation_func="lin"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    bad = rng.rand(1, 20, 20).astype(np.float32)            # 1 channel
    with pytest.raises(ValueError, match="channels"):
        m.predict_dense(bad)


def test_device_tiled_fallback_tile_batch(rng):
    """tile_batch>1 in the device tiled fallback gives identical output."""
    import jax.numpy as jnp
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer import model_manager
    model_manager.reset(seed=6)
    inp = nm.Input([1, 1, 21, 21], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    bn = nm.BatchNorm(c1)            # untrained BN → tiled fallback
    probs = nm.Softmax(nm.Conv(bn, 2, 1, 1, activation_func="lin"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    raw = jnp.asarray(rng.rand(1, 29, 29).astype(np.float32))
    a = np.asarray(m.predict_dense_device(raw, tile_batch=1))
    b = np.asarray(m.predict_dense_device(raw, tile_batch=4))
    np.testing.assert_allclose(a, b, atol=1e-6)


# ---- session review batch 5 ------------------------------------------------

def test_fused_trainer_exact_step_budget(rng, tmp_path):
    """n_steps not divisible by fused_steps: EXACTLY n_steps updates."""
    from test_training import _fused_setup
    from elektronn2_tpu.training.trainer import Trainer
    m, aug = _fused_setup(rng)
    tr = Trainer(model=m, data=aug, batch_size=2, n_steps=10,
                 fused_steps=4, history_freq=0, save_freq=0,
                 save_path=str(tmp_path), save_name="budget",
                 data_batch_args={"warp": 0.0})
    hist = tr.run()
    assert tr.step == 10
    assert m._step_count == 10
    assert [int(r[1]) for r in hist.timeline] == list(range(1, 11))


def test_resume_reseeds_data_stream(rng, tmp_path):
    """A resumed run must not replay the batch sequence from step 1."""
    import jax
    from test_training import _fused_setup
    from elektronn2_tpu.training.trainer import Trainer
    m, aug = _fused_setup(rng)
    key_before = np.asarray(aug.key)
    tr1 = Trainer(model=m, data=aug, batch_size=2, n_steps=3,
                  history_freq=0, save_freq=0, n_workers=0,
                  save_path=str(tmp_path), save_name="rs",
                  data_batch_args={"warp": 0.0})
    tr1.run()
    tr2 = Trainer(data=aug, batch_size=2, n_steps=6, resume=True,
                  history_freq=0, save_freq=0, n_workers=0,
                  save_path=str(tmp_path), save_name="rs",
                  data_batch_args={"warp": 0.0})
    assert tr2.step == 3
    # the augmenter's key chain was re-derived, not rewound
    assert not np.array_equal(np.asarray(aug.key), key_before)


def test_sharded_dense_cached_and_fresh_weights(rng):
    """predict_dense_sharded caches its program per (mesh, shape) AND picks
    up weight updates (params are traced args, not baked constants)."""
    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.parallel import make_mesh
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer import model_manager
    model_manager.reset(seed=7)
    inp = nm.Input([1, 1, 9, 17, 17], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([1, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt("Adam", lr=5e-2)
    mesh = make_mesh({"space": 8})
    vol = jnp.asarray(rng.rand(1, 16, 24, 24).astype(np.float32))
    a = np.asarray(m.predict_dense_sharded(vol, mesh))
    n_cached = len(m._dilated_fns)
    x = rng.rand(1, 1, 9, 17, 17).astype(np.float32)
    y = (rng.rand(1, *probs.shape.spatial_shape) > 0.5).astype(np.int32)
    for _ in range(3):
        m.trainingstep(x, y)
    b = np.asarray(m.predict_dense_sharded(vol, mesh))
    assert len(m._dilated_fns) == n_cached          # program was reused
    assert not np.allclose(a, b)                    # new weights visible


def test_conv_dense_cache_bounded(rng):
    from test_inference_device import crop_concat_unet
    import jax.numpy as jnp
    m = crop_concat_unet()
    for i in range(10):
        vol = jnp.asarray(rng.randn(1, 27 + i, 29).astype(np.float32))
        m.predict_dense_device(vol)
    conv_keys = [k for k in m._dilated_fns
                 if isinstance(k, tuple) and k and k[0] == "conv"]
    assert len(conv_keys) <= 8


# ---- session review batch 6 ------------------------------------------------

def test_experiment_config_passes_new_keys(tmp_path):
    f = tmp_path / "exp.py"
    f.write_text("fused_steps = 8\nresume = True\ntensorboard = True\n"
                 "seed = 7\nworker_mode = 'thread'\n"
                 "def create_model():\n    return None\n")
    from elektronn2_tpu.config import ExperimentConfig
    d = ExperimentConfig.from_file(str(f)).as_dict()
    assert d["fused_steps"] == 8 and d["resume"] is True
    assert d["tensorboard"] is True and d["seed"] == 7
    assert d["worker_mode"] == "thread"


def test_reseed_mixes_constructor_seed(rng):
    from elektronn2_tpu.data import DeviceBatchAugmenter
    raws = [rng.rand(1, 16, 16, 16).astype(np.float32)]
    labs = [np.zeros((16, 16, 16), np.int16)]
    a1 = DeviceBatchAugmenter(raws, labs, patch_size=(4, 4, 4), seed=1)
    a2 = DeviceBatchAugmenter(raws, labs, patch_size=(4, 4, 4), seed=2)
    a1.reseed(1000)
    a2.reseed(1000)
    assert not np.array_equal(np.asarray(a1.key), np.asarray(a2.key))


def test_elastic_margin_scales_with_sigma(rng):
    from elektronn2_tpu.data import DeviceBatchAugmenter
    raws = [rng.rand(1, 48, 48, 48).astype(np.float32)]
    labs = [np.zeros((48, 48, 48), np.int16)]
    aug = DeviceBatchAugmenter(raws, labs, patch_size=(8, 12, 12),
                               elastic_sigma=5.0)
    assert aug._elastic_margin >= 15          # 3 sigma
    d, t = aug.getbatch(2, warp=1.0)
    assert np.isfinite(np.asarray(d)).all()


def test_fused_chunk_schedules_fire_per_step(rng, tmp_path):
    """%interval schedules unaligned with the chunk size fire exactly."""
    from test_training import _fused_setup
    from elektronn2_tpu.training.trainer import Trainer
    m, aug = _fused_setup(rng)
    tr = Trainer(model=m, data=aug, batch_size=2, n_steps=12,
                 fused_steps=4, history_freq=0, save_freq=0,
                 save_path=str(tmp_path), save_name="sched",
                 optimiser_params={"lr": 1e-3},
                 schedules={"lr": {"dec": 0.5, "interval": 5}},
                 data_batch_args={"warp": 0.0})
    tr.run()
    # decays at steps 5 and 10 → lr = 1e-3 * 0.25
    assert abs(m.optimiser.hyperparams["lr"] - 1e-3 * 0.25) < 1e-9


# ---- session-3 review batch: model/loss/node fixes ----------------------

def _tiny_model(batch=2, with_err=False):
    model_manager.reset(seed=21)
    inp = nm.Input([batch, 1, 8, 8], "b,f,x,y", name="raw")
    c = nm.Conv(inp, 4, 3, 1, name="c")
    probs = nm.Softmax(nm.Conv(c, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([batch, *probs.shape.spatial_shape], "b,x,y",
                   dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True)
    loss = nm.AggregateLoss(nll)
    err = nm.Errors(probs, tgt, target_is_sparse=True) if with_err else None
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs, error_node=err)
    return m, probs, tgt, loss


def test_redesignation_invalidates_compiled_step(rng):
    """Adding an error node AFTER the first trainingstep must take effect
    (stale jit caches previously kept the old aux structure)."""
    m, probs, tgt, loss = _tiny_model()
    m.set_opt("SGD", lr=1e-2, mom=0.0)
    x = rng.rand(2, 1, 8, 8).astype(np.float32)
    y = (rng.rand(2, 6, 6) > 0.5).astype(np.int32)
    l1, aux1 = m.trainingstep(x, y)
    assert "error" not in aux1
    err = nm.Errors(probs, tgt, target_is_sparse=True)
    m.designate_nodes(input_node=m.input_node, target_node=tgt,
                      loss_node=loss, prediction_node=probs,
                      error_node=err)
    l2, aux2 = m.trainingstep(x, y)
    assert "error" in aux2 and np.isfinite(float(aux2["error"]))


def test_rebuild_model_keeps_optimiser_state(rng, tmp_path):
    """modelload(..., imposed_patch_size) must carry restored Adam slots
    and the step counter through rebuild_model."""
    from elektronn2_tpu.neuromancer.model import modelload
    m, *_ = _tiny_model()
    m.set_opt("Adam", lr=1e-3)
    x = rng.rand(2, 1, 8, 8).astype(np.float32)
    y = (rng.rand(2, 6, 6) > 0.5).astype(np.int32)
    for _ in range(3):
        m.trainingstep(x, y)
    f = str(tmp_path / "m.mdl")
    m.save(f)
    m2 = modelload(f, imposed_patch_size=[12, 12])
    assert m2.optimiser is not None
    assert type(m2.optimiser).__name__ == "Adam"
    assert m2._step_count == 3
    # Adam slots transferred (param shapes are patch-size invariant)
    l_old = jax.tree_util.tree_leaves(m.opt_state)
    l_new = jax.tree_util.tree_leaves(m2.opt_state)
    moments_match = sum(
        o.shape == n.shape and np.allclose(np.asarray(o), np.asarray(n))
        for o, n in zip(l_old, l_new))
    assert moments_match >= len(l_old) - 1   # all but possibly step scalar
    assert tuple(m2.input_node.shape.spatial_shape) == (12, 12)


def test_example_weights_per_example_shape(rng):
    """example_weights of shape (b,) broadcasts over the spatial loss map."""
    model_manager.reset(seed=22)
    inp = nm.Input([3, 1, 8, 8], "b,f,x,y", name="raw")
    probs = nm.Softmax(nm.Conv(inp, 2, 3, 1, activation_func="lin"))
    tgt = nm.Input([3, *probs.shape.spatial_shape], "b,x,y",
                   dtype="int32", name="target")
    ew = np.array([1.0, 0.0, 2.0], np.float32)
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True,
                            example_weights=ew, name="nll")
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt,
                      loss_node=nm.AggregateLoss(nll),
                      prediction_node=probs)
    x = rng.rand(3, 1, 8, 8).astype(np.float32)
    y = (rng.rand(3, 6, 6) > 0.5).astype(np.int32)
    outs, _ = m._apply([nll], m.params, m.state,
                       {"raw": x, "target": y}, None, train=False)
    per_vox = np.asarray(outs[0])
    assert per_vox.shape == (3, 6, 6)
    assert np.all(per_vox[1] == 0.0)          # weight 0 zeroes example 1
    assert per_vox[2].mean() > per_vox[0].mean()   # weight 2 doubles


def test_split_strip_singleton_dims(rng):
    model_manager.reset(seed=23)
    inp = nm.Input([2, 3, 5, 5], "b,f,x,y", name="raw")
    parts = nm.split(inp, axis="f", n_out=3, strip_singleton_dims=True)
    assert tuple(parts[0].shape) == (2, 5, 5)
    x = rng.rand(2, 3, 5, 5).astype(np.float32)
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=parts[1])
    out = np.asarray(m.predict(x))
    np.testing.assert_allclose(out, x[:, 1])


def test_compute_dtype_reaches_dense_and_recurrent(rng):
    """set_compute_dtype('bfloat16') must affect Perceptron/GRU matmuls
    (previously a silent no-op outside Conv)."""
    model_manager.reset(seed=24)
    T, B = 3, 2
    seq = nm.Input([T, B, 1, 4, 4, 4], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([B, 1, 4, 4, 4], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, 8, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=8, name="h0")
    gru = nm.GRU(enc, h0, n_f=8, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    out = nm.Perceptron(scan, 3, activation_func="lin", name="step")
    m = model_manager.getmodel()
    m.designate_nodes(input_node=seq, prediction_node=out)
    x = rng.rand(T, B, 1, 4, 4, 4).astype(np.float32)
    full = np.asarray(m.predict(x))
    m.set_compute_dtype("bfloat16")
    mixed = np.asarray(m.predict(x))
    assert np.isfinite(mixed).all()
    diff = np.abs(full - mixed).max()
    assert 0 < diff < 0.1      # bf16 rounding visible but bounded


def test_params_from_model_file_orbax(tmp_path):
    from elektronn2_tpu.neuromancer.model import params_from_model_file
    m, *_ = _tiny_model()
    d = str(tmp_path / "ckpt")
    m.save(d, backend="orbax")
    params = params_from_model_file(d)
    assert "c" in params and "w" in params["c"]
    np.testing.assert_allclose(params["c"]["w"],
                               np.asarray(m.params["c"]["w"]))


# ---- session-3 review batch 2: utils/parallel/malis/config --------------

def test_filelock_breaks_stale_lock(tmp_path):
    """A lock left by a dead pid is broken instead of blocking forever."""
    from elektronn2_tpu.utils.locking import FileLock
    target = str(tmp_path / "model.mdl")
    # fabricate a lock owned by a certainly-dead pid
    with open(target + ".lock", "w") as f:
        f.write("pid=999999999")
    import time
    t0 = time.monotonic()
    with FileLock(target, timeout=5.0):
        pass
    assert time.monotonic() - t0 < 2.0      # broke the stale lock fast


def test_filelock_respects_live_lock(tmp_path):
    from elektronn2_tpu.utils.locking import FileLock, FileLockException
    import os
    target = str(tmp_path / "model.mdl")
    with open(target + ".lock", "w") as f:
        f.write(f"pid={os.getpid()}")        # our own pid = alive
    with pytest.raises(FileLockException):
        FileLock(target, timeout=0.3).acquire()
    os.unlink(target + ".lock")


def test_legacy_import_distinct_arrays_for_same_shape(rng):
    """Shape-only fallback must hand out DISTINCT legacy arrays to
    same-shaped layers (no silent duplication)."""
    from elektronn2_tpu.utils.legacy import import_params
    model_manager.reset(seed=31)
    inp = nm.Input([1, 4, 8, 8], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 1, name="c1")
    c2 = nm.Conv(c1, 4, 3, 1, name="c2")     # same w shape as c1
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=c2)
    a0 = rng.randn(4, 4, 3, 3).astype(np.float32)
    a1 = rng.randn(4, 4, 3, 3).astype(np.float32)
    arrays = {"arr0": a0, "arr1": a1,
              "bias0": np.zeros(4, np.float32),
              "bias1": np.ones(4, np.float32)}
    import_params(m, arrays)
    w1 = np.asarray(m.params["c1"]["w"])
    w2 = np.asarray(m.params["c2"]["w"])
    assert not np.allclose(w1, w2)           # distinct arrays consumed


def test_malis_2d_routes_to_numpy(rng):
    """2D inputs must not hit the 3D-only C core."""
    from elektronn2_tpu.malis import malis_weights, seg_to_affgraph, \
        default_nhood
    seg = np.zeros((6, 6), np.int32)
    seg[:3] = 1
    seg[4:] = 2
    nhood = default_nhood(2)
    pred = rng.rand(nhood.shape[0], 6, 6).astype(np.float32)
    pos, neg = malis_weights(pred, seg, nhood)
    assert pos.shape == pred.shape and np.isfinite(pos).all()
    assert neg.shape == pred.shape and np.isfinite(neg).all()


def test_dynamic_kdt_deferred_rebuild(rng):
    from elektronn2_tpu.utils.basic import DynamicKDT
    kdt = DynamicKDT(points=rng.rand(10, 3) * 10, rebuild_thresh=50)
    d0, p0, i0 = kdt.get_knn([5.0, 5.0, 5.0])
    tree_before = kdt._tree
    # appends below the threshold must NOT rebuild, yet queries must see
    # the new points
    kdt.append([5.0, 5.0, 5.01])
    d1, p1, i1 = kdt.get_knn([5.0, 5.0, 5.0])
    assert kdt._tree is tree_before          # deferred
    assert abs(float(d1) - 0.01) < 1e-9      # pending point found
    np.testing.assert_allclose(p1, [5.0, 5.0, 5.01])
    # batch query folds pending in
    d, p, i = kdt.get_knn(np.array([[5.0, 5.0, 5.0], [0.0, 0.0, 0.0]]),
                          k=1)
    assert d.shape == (2,)
    assert abs(float(d[0]) - 0.01) < 1e-9


def test_rc_file_single_namespace(tmp_path, monkeypatch):
    """rc files may use helpers/comprehensions referencing rc globals."""
    rc = tmp_path / "rc.py"
    rc.write_text("base = '/data'\n"
                  "suffixes = ['a', 'b']\n"
                  "paths = [base + '/' + s for s in suffixes]\n"
                  "def _helper():\n"
                  "    return base\n"
                  "save_path = _helper() + '/runs'\n")
    import elektronn2_tpu.config as cfgmod
    monkeypatch.setattr(cfgmod, "RC_PATHS", [str(rc)])
    c = cfgmod.Config()
    assert c.save_path == "/data/runs"
    assert c.paths == ["/data/a", "/data/b"]


def test_multihost_explicit_args_validated():
    from elektronn2_tpu.parallel import multihost
    with pytest.raises(ValueError, match="num_processes"):
        multihost.initialize(coordinator_address="1.2.3.4:9999")


def test_rebuild_model_donation_safety(rng):
    """Training a rebuilt model must not invalidate the source model's
    arrays (trainingstep donates buffers; rebuild must deep-copy)."""
    from elektronn2_tpu.neuromancer.model import rebuild_model
    m, *_ = _tiny_model()
    m.set_opt("SGD", lr=1e-2, mom=0.9)
    x = rng.rand(2, 1, 8, 8).astype(np.float32)
    y = (rng.rand(2, 6, 6) > 0.5).astype(np.int32)
    m.trainingstep(x, y)                     # create momentum slots
    m2 = rebuild_model(m, imposed_patch_size=[10, 10])
    x2 = rng.rand(2, 1, 10, 10).astype(np.float32)
    y2 = (rng.rand(2, 8, 8) > 0.5).astype(np.int32)
    m2.trainingstep(x2, y2)                  # donates m2's buffers
    # the ORIGINAL model must still be fully usable
    l, _ = m.trainingstep(x, y)
    assert np.isfinite(float(l))
    # and vice versa: rebuild from m again after m trained
    m3 = rebuild_model(m, imposed_patch_size=[12, 12])
    out = m3.predict(rng.rand(2, 1, 12, 12).astype(np.float32))
    assert np.isfinite(np.asarray(out)).all()


# ---- session-3 review batch 3: ops/data/training whole-module pass ------

def test_elastic_zero_on_singleton_axes(rng):
    """2D data (z promoted to 1): elastic fields must not displace along
    the singleton axis (it would sample the zero padding)."""
    import jax
    from elektronn2_tpu.ops.warp import (random_elastic_fields,
                                         DeviceBatchAugmenter)
    f = random_elastic_fields(jax.random.PRNGKey(0), 2, (1, 16, 16),
                              grid=3, sigma=4.0)
    assert float(jnp.abs(f[:, 0]).max()) == 0.0
    assert float(jnp.abs(f[:, 1:]).max()) > 0.0
    # end-to-end: 2D augmenter with elastic keeps patches in data range
    raws = [np.full((1, 40, 40), 0.7, np.float32) for _ in range(2)]
    labs = [np.ones((40, 40), np.int16) for _ in range(2)]
    aug = DeviceBatchAugmenter(raws, labs, patch_size=(16, 16),
                               elastic_sigma=3.0, seed=0)
    d, t = aug.getbatch(batch_size=4, warp=1.0)
    d = np.asarray(d)
    # constant-0.7 volume: any 0-ish voxel means zero padding leaked in
    assert d.min() > 0.5, f"zero padding sampled: min={d.min()}"


def test_grey_augment_excluded_channels_untouched(rng):
    import jax
    from elektronn2_tpu.ops.warp import grey_augment
    x = np.stack([rng.rand(1, 8, 8, 8).astype(np.float32)[0],
                  (rng.rand(8, 8, 8) * 10 - 5).astype(np.float32)])[None]
    y = np.asarray(grey_augment(jax.random.PRNGKey(1), jnp.asarray(x),
                                channels=[0]))
    np.testing.assert_array_equal(y[:, 1], x[:, 1])    # untouched
    assert not np.allclose(y[:, 0], x[:, 0])           # augmented


def test_tracing_batch_valid_source(rng):
    """source='valid' cuts patches from held-out cubes only."""
    from elektronn2_tpu.data.cnndata import AgentData
    from test_tracing import line_skeleton
    v_train = np.zeros((1, 28, 28, 28), np.float32)
    v_valid = np.ones((1, 28, 28, 28), np.float32)
    ad = AgentData(input_data=[v_train, v_valid],
                   target_data=[np.zeros((28, 28, 28), np.int16)] * 2,
                   valid_cubes=[1])
    ad.set_geometry((5, 5, 5))
    ad.skeletons = [line_skeleton(n=10, step=1.5)]
    d, t = ad.get_tracing_batch(2, n_steps=3, source="valid")
    assert d.min() >= 0.99           # all-ones cube → valid split used
    d2, _ = ad.get_tracing_batch(2, n_steps=3, source="train")
    assert d2.max() <= 0.01          # zeros cube → train split used


def test_griddata_consistent_point_label(rng):
    from elektronn2_tpu.data.cnndata import GridData
    r = [rng.rand(1, 16, 16, 16).astype(np.float32) for _ in range(2)]
    l0 = np.zeros((16, 16, 16), np.int16); l0[:2] = 1       # max 1
    l1 = np.zeros((16, 16, 16), np.int16); l1[:2] = 2       # max 2
    gd = GridData(input_data=r, target_data=[l0, l1],
                  grid_points=[[[8, 8, 8]], [[8, 8, 8]]], point_radius=2)
    lab0 = gd._all_labels[0][8, 8, 8]
    lab1 = gd._all_labels[1][8, 8, 8]
    assert lab0 == lab1 == 3         # one global id (max over cubes + 1)


def test_knossos_preload_pending_bounded(rng, tmp_path):
    from test_data import write_knossos
    from elektronn2_tpu.data.knossos_array import KnossosArray
    vol = (rng.rand(16, 16, 16) * 255).astype(np.uint8)
    ka = KnossosArray(write_knossos(tmp_path, vol, cube_edge=8))
    keys = [(z, x, y) for z in range(2) for x in range(2)
            for y in range(2)]
    ka.preload(keys)
    import time
    for _ in range(50):
        with ka._lock:
            if all(f.done() for f in ka._pending.values()):
                break
        time.sleep(0.05)
    # a later preload folds the completed-but-unread futures into the LRU
    ka.preload([])
    assert len(ka._pending) == 0


def test_conv_border_modes(rng):
    from elektronn2_tpu.ops.conv import conv
    x = jnp.asarray(rng.rand(1, 1, 8, 8).astype(np.float32))
    w = jnp.asarray(rng.rand(2, 1, 3, 3).astype(np.float32))
    assert conv(x, w, border_mode="valid").shape == (1, 2, 6, 6)
    assert conv(x, w, border_mode="same").shape == (1, 2, 8, 8)
    assert conv(x, w, border_mode="full").shape == (1, 2, 10, 10)
    with pytest.raises(ValueError, match="border_mode"):
        conv(x, w, border_mode="wrap")


def test_conv_full_mode_dilated(rng):
    """'full' border mode pads by the DILATED kernel footprint."""
    from elektronn2_tpu.ops.conv import conv
    x = jnp.asarray(rng.rand(1, 1, 8, 8).astype(np.float32))
    w = jnp.asarray(rng.rand(2, 1, 3, 3).astype(np.float32))
    out = conv(x, w, border_mode="full", dilation=(2, 2))
    assert out.shape == (1, 2, 12, 12)       # in + d*(k-1)


def test_hostfed_prefetch_overlap(rng, tmp_path):
    """The prefetch thread draws chunk N+1 while chunk N computes; the
    training result matches prefetch=False exactly (same batches/keys)."""
    from test_training import _fused_setup
    import jax
    from elektronn2_tpu.training.fused_loop import HostFedFusedLoop
    m1, aug1 = _fused_setup(np.random.RandomState(5))
    aug1.reseed(7)
    loop1 = HostFedFusedLoop(m1, aug1, batch_size=2, n_inner=3,
                             batch_args={"warp": 0.0}, seed=3,
                             prefetch=True)
    l1a, _ = loop1.run_chunk()
    l1b, _ = loop1.run_chunk()
    loop1.close()

    from elektronn2_tpu.neuromancer import model_manager
    m2, aug2 = _fused_setup(np.random.RandomState(5))
    aug2.reseed(7)
    loop2 = HostFedFusedLoop(m2, aug2, batch_size=2, n_inner=3,
                             batch_args={"warp": 0.0}, seed=3,
                             prefetch=False)
    l2a, _ = loop2.run_chunk()
    l2b, _ = loop2.run_chunk()
    np.testing.assert_allclose(l1a, l2a, rtol=1e-6)
    np.testing.assert_allclose(l1b, l2b, rtol=1e-6)


# ---------------------------------------------------------------- round 2
# Regression tests for the round-2 review pass.


def test_kdt_knn_k_exceeds_point_count():
    """k > number of stored points must clamp instead of surfacing
    cKDTree's (inf, n) sentinels (IndexError / arbitrary point)."""
    from elektronn2_tpu.utils.basic import DynamicKDT
    kdt = DynamicKDT([[0, 0, 0], [1, 1, 1]])
    d, p, i = kdt.get_knn([0.1, 0.0, 0.0], k=5)    # no-pending first query
    assert len(np.atleast_1d(d)) == 2
    assert np.all(np.isfinite(np.atleast_1d(d)))
    assert p.shape == (2, 3)
    kdt.append([2.0, 2.0, 2.0])                    # pending-merge path
    d, p, i = kdt.get_knn([0.1, 0.0, 0.0], k=9)
    assert len(np.atleast_1d(d)) == 3
    assert np.all(np.isfinite(np.atleast_1d(d)))
    assert int(np.atleast_1d(i)[0]) == 0           # nearest is (0,0,0)


def test_filelock_release_checks_ownership(tmp_path):
    """A holder whose lock was displaced (wrongly broken + re-acquired)
    must not unlink the current holder's lockfile at release."""
    import os
    import socket
    import subprocess
    from elektronn2_tpu.utils.locking import FileLock
    target = str(tmp_path / "file")
    # stale lock: a pid from an already-exited process on this host
    dead = int(subprocess.run(["sh", "-c", "echo $$"], capture_output=True,
                              text=True).stdout.strip())
    with open(target + ".lock", "w") as f:
        f.write(f"pid={dead} host={socket.gethostname()}")
    lk = FileLock(target, timeout=3.0)
    lk.acquire()                       # breaks the stale lock, acquires
    assert lk.is_locked
    # simulate displacement: someone else's lock now sits on disk
    with open(target + ".lock", "w") as f:
        f.write("pid=1 host=elsewhere token=feedface")
    lk.release()
    assert os.path.exists(target + ".lock")     # other holder kept
    with open(target + ".lock") as f:
        assert "feedface" in f.read()
    os.unlink(target + ".lock")


def test_filelock_normal_cycle(tmp_path):
    import os
    from elektronn2_tpu.utils.locking import FileLock
    target = str(tmp_path / "f2")
    with FileLock(target, timeout=1.0):
        assert os.path.exists(target + ".lock")
    assert not os.path.exists(target + ".lock")


def test_native_build_atomic_no_temp_left():
    """First-use g++ builds compile to a temp name + atomic rename, and
    leave no temp files behind."""
    import os
    import shutil
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    from elektronn2_tpu.data import _warp_native as wn
    wn._build()
    assert os.path.exists(wn._SO)
    leftovers = [f for f in os.listdir(os.path.dirname(wn._SO))
                 if ".so.tmp." in f]
    assert leftovers == []


def test_set_dilated_impl_fatn_requires_zmajor():
    inp = nm.Input([1, 1, 16, 16], "b,f,x,y", name="raw")
    probs = nm.Softmax(nm.Conv(inp, 2, 3, 2, name="c1"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    with pytest.raises(ValueError, match="zmajor"):
        m.set_dilated_impl("s2bg", ztap="fatn")
    with pytest.raises(ValueError, match="zmajor"):
        m.set_dilated_impl("direct", ztap="conv3d")
    m.set_dilated_impl("s2bg", ztap="fatn", zmajor=True)   # valid


def test_apply_func_probe_classification():
    """The spatial-elementwise probe accepts pointwise (incl. channel-
    mixing) functors and rejects spatially-dependent ones."""
    from elektronn2_tpu.neuromancer.inference import (
        _functor_spatially_elementwise)
    inp = nm.Input([1, 2, 8, 8, 8], "b,f,z,x,y", name="raw")
    good = nm.ApplyFunc(inp, lambda v: jnp.tanh(v) * 2.0, name="good")
    chmix = nm.ApplyFunc(inp, lambda v: jax.nn.softmax(v, axis=1),
                         name="chmix")
    flip = nm.ApplyFunc(inp, lambda v: jnp.flip(v, axis=-1), name="flip")
    roll = nm.ApplyFunc(inp, lambda v: jnp.roll(v, 1, axis=2), name="roll")
    assert _functor_spatially_elementwise(good, 2)
    assert _functor_spatially_elementwise(chmix, 2)
    assert not _functor_spatially_elementwise(flip, 2)
    assert not _functor_spatially_elementwise(roll, 2)
    # cached on the node after the first probe
    assert flip._spatially_elementwise is False


def test_dilated_dense_rejects_spatial_applyfunc(rng):
    """A spatially-dependent ApplyFunc past a pooling stage must raise
    UnsupportedGraphError on the dilated path (its à-trous/phase-split
    evaluation would silently differ from fragment semantics)."""
    from elektronn2_tpu.neuromancer.inference import (
        dilated_dense_forward, UnsupportedGraphError)
    inp = nm.Input([1, 1, 17, 17], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    flip = nm.ApplyFunc(c1, lambda v: jnp.flip(v, axis=-1), name="flip")
    probs = nm.Softmax(nm.Conv(flip, 2, 3, 1, activation_func="lin",
                               name="c2"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    raw = jnp.asarray(rng.randn(1, 33, 33).astype(np.float32))
    with pytest.raises(UnsupportedGraphError, match="spatially pointwise"):
        dilated_dense_forward(m, raw)


def test_dilated_dense_elementwise_applyfunc_ok(rng):
    """An elementwise ApplyFunc keeps the dilated path available and
    matches the exact host tiled sweep."""
    inp = nm.Input([1, 1, 17, 17], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    sq = nm.ApplyFunc(c1, lambda v: jnp.tanh(v), name="sq")
    probs = nm.Softmax(nm.Conv(sq, 2, 3, 1, activation_func="lin",
                               name="c2"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    raw = rng.randn(1, 33, 33).astype(np.float32)
    host = m.predict_dense(raw, prefer_device=False)
    dev = np.asarray(m.predict_dense_device(jnp.asarray(raw)))
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_pipeline_loss_guard_mask_and_grouped_softmax():
    """_model_loss_fn must refuse loss graphs it cannot faithfully derive
    (mask_class_labeled, grouped Softmax) instead of silently training a
    different objective."""
    from elektronn2_tpu.parallel.pipeline import _model_loss_fn

    inp = nm.Input([4, 1, 16, 16], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, name="c1")
    logits = nm.Conv(c1, 4, 1, 1, activation_func="lin", name="c2")
    probs = nm.Softmax(logits)
    tgt = nm.Input([4, *probs.shape.spatial_shape], "b,x,y",
                   dtype="int32", name="target")
    mask = np.ones((4, 4), np.float32)
    loss = nm.AggregateLoss(nm.MultinoulliNLL(
        probs, tgt, target_is_sparse=True, mask_class_labeled=mask))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    with pytest.raises(ValueError, match="mask_class_labeled"):
        _model_loss_fn(m)

    model_manager.reset(seed=13)
    inp = nm.Input([4, 1, 16, 16], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, name="c1")
    logits = nm.Conv(c1, 4, 1, 1, activation_func="lin", name="c2")
    probs = nm.Softmax(logits, n_indep=2)
    tgt = nm.Input([4, *probs.shape.spatial_shape], "b,x,y",
                   dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    # grouped Softmax heads ARE derivable: the ce must normalise per group
    lf = _model_loss_fn(m)
    rng = np.random.RandomState(0)
    lg = rng.randn(4, 4, 7, 7).astype(np.float32)
    tg = rng.randint(0, 4, (4, 7, 7)).astype(np.int32)
    got = float(lf(jnp.asarray(lg), jnp.asarray(tg)))
    # reference: per-group softmax, log, gather at the target channel
    e = np.exp(lg - lg.max(axis=1, keepdims=True))
    p1 = e[:, :2] / e[:, :2].sum(axis=1, keepdims=True)
    p2 = e[:, 2:] / e[:, 2:].sum(axis=1, keepdims=True)
    pfull = np.concatenate([p1, p2], axis=1)
    picked = np.take_along_axis(np.log(pfull), tg[:, None], axis=1)[:, 0]
    np.testing.assert_allclose(got, -picked.mean(), rtol=1e-5)


def test_trace_to_kzip_short_comments(tmp_path):
    """comments shorter than traces (or with None entries) falls back to
    the default per-trace label instead of raising IndexError."""
    from elektronn2_tpu.data.skeleton import trace_to_kzip, SkeletonMFK
    traces = [np.array([[0, 0, 0], [0, 0, 1.0]]),
              np.array([[5, 5, 5], [6, 5, 5.0]]),
              np.array([[9, 9, 9], [9, 9, 8.0]])]
    path = str(tmp_path / "short.k.zip")
    trace_to_kzip(traces, path, comments=["only-one"])
    sk = SkeletonMFK.load(path)
    assert len(sk.positions) == 6
    trace_to_kzip(traces, str(tmp_path / "none.k.zip"),
                  comments=["a", None, ""])   # None→default, ''→kept


def test_sweep_slab_batch_oom_falls_back(rng):
    """A RESOURCE_EXHAUSTED from the batched program degrades to the
    per-slab sweep (idempotent writes) instead of killing the run."""
    inp = nm.Input([1, 1, 9, 17, 17], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    vol = rng.rand(24, 32, 32).astype(np.float32)

    def boom(p, s, v):
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")

    m._dilated_fns[("sweep_batch", "direct", 2)] = boom
    out = m.sweep_knossos(vol, step=[12, 16, 16], slab_batch=2)
    ref = np.asarray(m.predict_dense_device(jnp.asarray(vol[None]),
                                            pad_raw=True))
    np.testing.assert_allclose(out, ref, atol=1e-6)

    # a non-OOM error still surfaces
    def boom2(p, s, v):
        raise RuntimeError("some genuine bug")

    m._dilated_fns[("sweep_batch", "direct", 2)] = boom2
    with pytest.raises(RuntimeError, match="genuine bug"):
        m.sweep_knossos(vol, step=[12, 16, 16], slab_batch=2)


def test_decoder_tiled_origins_phase_aligned(rng):
    """r3 fuzzer find (seed 6): a decoder (UpConv) graph served over a
    volume whose extent puts the CLAMPED last tile at an origin off the
    valid-size-period grid must agree with the whole-volume conv-dense
    program — decoders are shift-equivariant only modulo M, so tile
    origins are now lcm(g, M)-aligned (inference._origin_period). Pinned
    to the exact genotype + volume the fuzzer failed on."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.fuzz_graphs import build_random_model

    m, info = build_random_model(6)
    assert info["decoder"] and info["patch"] == [13, 8]
    fov = [int(f) for f in m.prediction_node.shape.fov]
    # V - patch odd in z: the old g(=1)-aligned clamp landed the last
    # tile at origin 3, off the M(=2) pooling-phase grid
    V = [16, 8]
    raw = rng.rand(info["n_ch"], *V).astype(np.float32)
    host = m.predict_dense(raw, prefer_device=False)
    dev = np.asarray(m.predict_dense_device(jnp.asarray(raw)))
    assert host.shape == dev.shape
    np.testing.assert_allclose(host, dev, atol=1e-5)
    # pad_raw leg too (front pad interacts with the origin grid)
    host_p = m.predict_dense(raw, pad_raw=True, prefer_device=False)
    dev_p = np.asarray(m.predict_dense_device(jnp.asarray(raw),
                                              pad_raw=True))
    np.testing.assert_allclose(host_p, dev_p, atol=1e-5)
