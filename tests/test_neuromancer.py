"""Graph-layer tests: nodes, model, training, save/load, MFP dense inference,
recurrence, optimisers (SURVEY.md §5 test strategy)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import elektronn2_tpu.neuromancer as nm
from elektronn2_tpu.neuromancer import model_manager


@pytest.fixture(autouse=True)
def fresh_graph():
    model_manager.reset(seed=7)
    yield


def eval_node(node, feed, train=False, rng=None):
    """Evaluate a single node un-jitted through a throwaway model."""
    m = model_manager.getmodel()
    outs, _ = m._apply([node], m.params, {}, feed, rng, train)
    return np.asarray(outs[0])


def build_seg_model(batch=2, patch=(16, 16), mfp=False, pools=(2, 1)):
    inp = nm.Input([batch, 1, *patch], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 6, 3, pools[0], mfp=mfp, name="c1")
    c2 = nm.Conv(c1, 6, 3, pools[1], mfp=mfp, name="c2")
    out = nm.Conv(c2, 2, 1, 1, activation_func="lin", name="cls")
    probs = nm.Softmax(out, name="probs")
    tgt = nm.Input([probs.shape["b"], *probs.shape.spatial_shape], "b,x,y",
                   dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True, name="nll")
    loss = nm.AggregateLoss(nll, name="loss")
    err = nm.Errors(probs, tgt, target_is_sparse=True)
    model = model_manager.getmodel()
    model.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs, error_node=err)
    return model


# ----------------------------------------------------------------- training

def test_model_trains_to_lower_loss(rng):
    model = build_seg_model()
    model.set_opt("Adam", lr=2e-3)
    x = rng.randn(2, 1, 16, 16).astype(np.float32)
    y = (x[:, 0, 5:-6, 5:-6] > 0).astype(np.int32)  # learnable target
    losses = [float(model.trainingstep(x, y)[0]) for _ in range(40)]
    assert losses[-1] < 0.7 * losses[0]


def test_trainingstep_aux_outputs(rng):
    model = build_seg_model()
    model.set_opt("SGD", lr=1e-3, mom=0.5)
    x = rng.randn(2, 1, 16, 16).astype(np.float32)
    y = (rng.rand(2, 5, 5) > 0.5).astype(np.int32)
    loss, aux = model.trainingstep(x, y)
    assert 0.0 <= float(aux["error"]) <= 1.0
    assert float(aux["gradnorm"]) > 0


def test_live_lr_mutation_no_recompile(rng):
    model = build_seg_model()
    model.set_opt("SGD", lr=0.0, mom=0.0)
    x = rng.randn(2, 1, 16, 16).astype(np.float32)
    y = (rng.rand(2, 5, 5) > 0.5).astype(np.int32)
    model.trainingstep(x, y)
    p_before = np.asarray(model.params["c1"]["w"]).copy()
    model.trainingstep(x, y)
    np.testing.assert_array_equal(p_before, np.asarray(model.params["c1"]["w"]))
    model.optimiser.setlr(0.5)   # python-side mutation, same compiled step
    model.trainingstep(x, y)
    assert np.abs(np.asarray(model.params["c1"]["w"]) - p_before).max() > 0


def test_save_load_roundtrip(rng, tmp_path):
    model = build_seg_model()
    model.set_opt("Adam", lr=1e-3)
    x = rng.randn(2, 1, 16, 16).astype(np.float32)
    y = (rng.rand(2, 5, 5) > 0.5).astype(np.int32)
    for _ in range(3):
        model.trainingstep(x, y)
    p1 = np.asarray(model.predict(x))
    f = str(tmp_path / "model.mdl")
    model.save(f)
    m2 = nm.modelload(f)
    np.testing.assert_array_equal(p1, np.asarray(m2.predict(x)))
    # optimiser state resumes: one more step on each gives identical params
    model.trainingstep(x, y)
    m2.trainingstep(x, y)
    np.testing.assert_allclose(np.asarray(model.params["c1"]["w"]),
                               np.asarray(m2.params["c1"]["w"]), atol=2e-6)


def test_params_from_model_file(rng, tmp_path):
    model = build_seg_model()
    f = str(tmp_path / "m.mdl")
    model.save(f)
    params = nm.params_from_model_file(f)
    assert "c1" in params and "w" in params["c1"]


# ------------------------------------------------- MFP dense inference oracle

def test_mfp_predict_dense_equals_plain_shifts(rng):
    """Model-level shift-and-stitch: predict_dense of the MFP model equals
    the plain (non-MFP) model with identical weights evaluated at every
    shift. Exercises tiling + on-device stitching end to end."""
    # fixed weights for both models
    w1 = rng.randn(4, 1, 3, 3).astype(np.float32)
    w2 = rng.randn(2, 4, 3, 3).astype(np.float32)
    zb = np.zeros(4, np.float32)
    zb2 = np.zeros(2, np.float32)

    # MFP model: valid patch from cnncalculator
    from elektronn2_tpu.utils import cnncalculator
    calc = cnncalculator([3, 3], [2, 2], desired_patch_size=21, mfp=True,
                         ndim=1)
    n = calc.input  # 21
    model_manager.reset()
    inp = nm.Input([1, 1, n, n], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, w=w1, b=zb, name="c1")
    c2 = nm.Conv(c1, 2, 3, 2, mfp=True, w=w2, b=zb2, name="c2")
    probs = nm.Softmax(c2, name="probs")
    m_mfp = model_manager.getmodel()
    m_mfp.designate_nodes(input_node=inp, prediction_node=probs)

    V = 33  # volume larger than the tile → multiple tiles, stitching
    raw = rng.randn(1, V, V).astype(np.float32)
    dense = m_mfp.predict_dense(raw)  # (2, V-fov+1, V-fov+1)
    fov = probs.shape.fov[0]
    assert dense.shape == (2, V - fov + 1, V - fov + 1)

    # plain model, same weights
    model_manager.reset()
    calc_p = cnncalculator([3, 3], [2, 2], desired_patch_size=30, mfp=False,
                           ndim=1)
    npn = calc_p.input
    inp2 = nm.Input([1, 1, npn, npn], "b,f,x,y", name="raw")
    d1 = nm.Conv(inp2, 4, 3, 2, w=w1, b=zb, name="c1")
    d2 = nm.Conv(d1, 2, 3, 2, w=w2, b=zb2, name="c2")
    probs2 = nm.Softmax(d2, name="probs")
    m_plain = model_manager.getmodel()
    m_plain.designate_nodes(input_node=inp2, prediction_node=probs2)

    S = 4
    for sz in range(S):
        for sx in range(S):
            tile = raw[:, sz:sz + npn, sx:sx + npn]
            if tile.shape != (1, npn, npn):
                continue
            ref = np.asarray(m_plain.predict(tile[None]))[0]
            got = dense[:, sz::S, sx::S][:, :ref.shape[1], :ref.shape[2]]
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_predict_dense_pad_raw_full_coverage(rng):
    model = build_seg_model(batch=1, patch=(16, 16))
    raw = rng.randn(1, 40, 40).astype(np.float32)
    out = model.predict_dense(raw, pad_raw=True)
    assert out.shape == (2, 40, 40)
    out2 = model.predict_dense(raw, pad_raw=False)
    fov = model.prediction_node.shape.fov[0]
    assert out2.shape == (2, 40 - fov + 1, 40 - fov + 1)


def test_node_level_predict_dense(rng):
    """Reference surface: ``Node.predict_dense`` (node_basic.py) — the
    designated prediction node delegates to the model path verbatim, and
    an INTERMEDIATE node serves its own dense feature map while the
    model's designation and serving caches stay untouched."""
    model = build_seg_model(batch=1, patch=(16, 16))
    raw = rng.randn(1, 40, 40).astype(np.float32)
    want = np.asarray(model.predict_dense(raw, pad_raw=True))
    pred = model.prediction_node
    got = np.asarray(pred.predict_dense(raw, pad_raw=True))
    np.testing.assert_array_equal(want, got)
    # intermediate node: its dense map has that node's channel count
    mid = model.nodes["c1"]
    mid_map = np.asarray(mid.predict_dense(raw))
    assert mid_map.shape[0] == mid.shape["f"]
    # the model is untouched: designation restored, original output again
    assert model.prediction_node is pred
    np.testing.assert_array_equal(
        want, np.asarray(model.predict_dense(raw, pad_raw=True)))


def test_predict_dense_tile_batching_identical(rng):
    model = build_seg_model(batch=1, patch=(16, 16))
    raw = rng.randn(1, 40, 40).astype(np.float32)
    a = model.predict_dense(raw, pad_raw=True, tile_batch=1)
    b = model.predict_dense(raw, pad_raw=True, tile_batch=4)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


# ----------------------------------------------------------------- rebuild

def test_rebuild_model_with_mfp_activation(rng):
    model = build_seg_model(batch=1, patch=(16, 16), mfp=False,
                            pools=(1, 1))
    new = nm.rebuild_model(model, imposed_patch_size=[20, 20])
    assert new.input_node.shape.spatial_shape == (20, 20)
    # params carried over
    np.testing.assert_array_equal(np.asarray(model.params["c1"]["w"]),
                                  np.asarray(new.params["c1"]["w"]))


# ----------------------------------------------------------------- basic nodes

def test_concat_split_multmerge(rng):
    a = nm.Input([2, 3, 4], "b,f,x", name="a")
    b = nm.Input([2, 5, 4], "b,f,x", name="b")
    cat = nm.Concat([a, b])
    assert cat.shape == (2, 8, 4)
    va = rng.randn(2, 3, 4).astype(np.float32)
    vb = rng.randn(2, 5, 4).astype(np.float32)
    out = eval_node(cat, {"a": va, "b": vb})
    np.testing.assert_allclose(out, np.concatenate([va, vb], 1), rtol=1e-6)

    parts = nm.split(cat, "f", index=[3])
    outs = [eval_node(p, {"a": va, "b": vb}) for p in parts]
    np.testing.assert_allclose(outs[0], va, rtol=1e-6)
    np.testing.assert_allclose(outs[1], vb, rtol=1e-6)

    mm = nm.MultMerge(parts[0], parts[0])
    np.testing.assert_allclose(eval_node(mm, {"a": va, "b": vb}), va * va,
                               rtol=1e-6)


def test_crop_pad_nodes(rng):
    a = nm.Input([1, 1, 8, 8], "b,f,x,y", name="a")
    c = nm.Crop(a, [2, 1])
    assert c.shape.spatial_shape == (4, 6)
    v = rng.randn(1, 1, 8, 8).astype(np.float32)
    np.testing.assert_array_equal(eval_node(c, {"a": v}), v[:, :, 2:-2, 1:-1])
    p = nm.Pad(a, [1, 2])
    assert p.shape.spatial_shape == (10, 12)


def test_upconv_shapes_and_unet_pattern(rng):
    inp = nm.Input([1, 2, 16, 16], "b,f,x,y", name="raw")
    enc = nm.Conv(inp, 4, 3, 2, name="enc")           # 14 -> 7, stride 2
    up = nm.UpConv(enc, 2, 2, name="up")              # 14, stride 1
    assert up.shape.spatial_shape == (14, 14)
    assert up.shape.strides == (1, 1)
    crop = nm.Crop(inp, 1)
    merged = nm.FaithlessMerge(up, crop)
    assert merged.shape["f"] == 4
    v = rng.randn(1, 2, 16, 16).astype(np.float32)
    out = eval_node(merged, {"raw": v})
    assert out.shape == (1, 4, 14, 14)


def test_dropout_train_vs_eval(rng):
    a = nm.Input([1, 4, 8, 8], "b,f,x,y", name="a")
    d = nm.Dropout(a, rate=0.5)
    v = rng.randn(1, 4, 8, 8).astype(np.float32)
    out_eval = eval_node(d, {"a": v}, train=False)
    np.testing.assert_array_equal(out_eval, v)
    out_tr = eval_node(d, {"a": v}, train=True, rng=jax.random.PRNGKey(1))
    assert (out_tr == 0).mean() > 0.2  # roughly half dropped


def test_batchnorm_statistics(rng):
    a = nm.Input([4, 3, 8], "b,f,x", name="a")
    bn = nm.BatchNorm(a)
    m = model_manager.getmodel()
    v = (rng.randn(4, 3, 8) * 5 + 3).astype(np.float32)
    ctx_outs, state = m._apply([bn], m.params, {}, {"a": v}, None, True)
    out = np.asarray(ctx_outs[0])
    assert abs(out.mean()) < 1e-4 and abs(out.std() - 1) < 1e-2
    assert bn.name in state  # running stats recorded


def test_initial_state_like(rng):
    a = nm.Input([3, 4], "b,f", name="a")
    s0 = nm.InitialState_like(a, override_f=6,
                              init_kwargs={"mode": "const", "scale": 2.0})
    out = eval_node(s0, {"a": rng.randn(3, 4).astype(np.float32)})
    assert out.shape == (3, 6)
    np.testing.assert_array_equal(out, np.full((3, 6), 2.0, np.float32))


def test_value_node_and_from_tensor(rng):
    v = rng.randn(3, 2).astype(np.float32)
    ft = nm.FromTensor(v, "b,f", name="ft")
    np.testing.assert_array_equal(eval_node(ft, {}), v)
    vn = nm.ValueNode([2, 2], "b,f", value=1.5)
    np.testing.assert_array_equal(eval_node(vn, {}),
                                  np.full((2, 2), 1.5, np.float32))


def test_gaussian_rv(rng):
    mu = nm.Input([2, 3], "b,f", name="mu")
    sig = nm.Input([2, 3], "b,f", name="sig")
    rv = nm.GaussianRV(mu, sig)
    vmu = rng.randn(2, 3).astype(np.float32)
    vsig = np.full((2, 3), 0.1, np.float32)
    feed = {"mu": vmu, "sig": vsig}
    np.testing.assert_array_equal(eval_node(rv, feed, train=False), vmu)
    samp = eval_node(rv, feed, train=True, rng=jax.random.PRNGKey(0))
    assert 0 < np.abs(samp - vmu).max() < 1.0


def test_gaussian_rv_n_samples(rng):
    """n_samples>1 averages that many draws: same shape, ~1/sqrt(n) the
    deviation from mu (VERDICT r1 #8: various.py::GaussianRV)."""
    mu = nm.Input([4, 50], "b,f", name="mu")
    sig = nm.Input([4, 50], "b,f", name="sig")
    vmu = np.zeros((4, 50), np.float32)
    vsig = np.ones((4, 50), np.float32)
    feed = {"mu": vmu, "sig": vsig}
    devs = {}
    for n in (1, 64):
        model_manager.reset(seed=1)
        mu = nm.Input([4, 50], "b,f", name="mu")
        sig = nm.Input([4, 50], "b,f", name="sig")
        rv = nm.GaussianRV(mu, sig, n_samples=n)
        assert rv.shape.shape == (4, 50)
        samp = eval_node(rv, feed, train=True, rng=jax.random.PRNGKey(1))
        assert samp.shape == (4, 50)
        devs[n] = float(np.std(samp))
    # std of a 64-sample mean is 1/8 of a single draw's (tolerant bound)
    assert devs[64] < devs[1] * 0.3
    with pytest.raises(ValueError):
        nm.GaussianRV(mu, sig, n_samples=0)


# ----------------------------------------------------------------- recurrence

def np_gru_step(x, h, wg, bg, wc, bc):
    xh = np.concatenate([x, h], -1)
    zr = 1 / (1 + np.exp(-(xh @ wg + bg)))
    z, r = np.split(zr, 2, -1)
    cand = np.tanh(np.concatenate([x, r * h], -1) @ wc + bc)
    return (1 - z) * h + z * cand


def test_scan_gru_matches_manual_loop(rng):
    T, B, F, H = 5, 2, 3, 4
    seq = nm.Input([T, B, F], "s,b,f", name="seq")
    x_t = nm.Input([B, F], "b,f", name="x_t")      # per-step placeholder
    h0 = nm.InitialState_like(x_t, override_f=H, name="h0")
    gru = nm.GRU(x_t, h0, n_f=H, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    assert tuple(scan.shape) == (T, B, H)
    m = model_manager.getmodel()
    vseq = rng.randn(T, B, F).astype(np.float32)
    outs, _ = m._apply([scan], m.params, {}, {"seq": vseq}, None, False)
    got = np.asarray(outs[0])

    wg = np.asarray(m.params["gru"]["w_gates"])
    bg = np.asarray(m.params["gru"]["b_gates"])
    wc = np.asarray(m.params["gru"]["w_cand"])
    bc = np.asarray(m.params["gru"]["b_cand"])
    h = np.zeros((B, H), np.float32)
    for t in range(T):
        h = np_gru_step(vseq[t], h, wg, bg, wc, bc)
        np.testing.assert_allclose(got[t], h, rtol=1e-4, atol=1e-5)


def test_scan_last_only_and_lstm(rng):
    T, B, F, H = 4, 2, 3, 4
    seq = nm.Input([T, B, F], "s,b,f", name="seq")
    x_t = nm.Input([B, F], "b,f", name="x_t")
    s0 = nm.InitialState_like(x_t, override_f=2 * H, name="s0")
    lstm = nm.LSTM(x_t, s0, n_f=H, name="lstm")
    scan = nm.ScanN(lstm, in_memory=s0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, last_only=True)
    assert tuple(scan.shape) == (B, 2 * H)
    m = model_manager.getmodel()
    vseq = rng.randn(T, B, F).astype(np.float32)
    outs, _ = m._apply([scan], m.params, {}, {"seq": vseq}, None, False)
    assert np.isfinite(np.asarray(outs[0])).all()


def test_scan_is_trainable(rng):
    """Gradient flows through lax.scan into GRU params."""
    T, B, F, H = 4, 2, 3, 4
    seq = nm.Input([T, B, F], "s,b,f", name="seq")
    x_t = nm.Input([B, F], "b,f", name="x_t")
    h0 = nm.InitialState_like(x_t, override_f=H, name="h0")
    gru = nm.GRU(x_t, h0, n_f=H, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, last_only=True)
    pred = nm.Perceptron(scan, 3, activation_func="lin", name="readout")
    tgt = nm.Input([B, 3], "b,f", name="tgt")
    loss = nm.AggregateLoss(nm.SquaredLoss(pred, tgt))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=seq, target_node=tgt, loss_node=loss,
                      prediction_node=pred)
    m.set_opt("Adam", lr=5e-3)
    vseq = rng.randn(T, B, F).astype(np.float32)
    vtgt = rng.randn(B, 3).astype(np.float32)
    losses = [float(m.trainingstep(vseq, vtgt)[0]) for _ in range(30)]
    assert losses[-1] < 0.5 * losses[0]


# ----------------------------------------------------------------- losses

def test_multinoulli_class_weights_and_mask(rng):
    probs = nm.Input([2, 3, 4], "b,f,x", name="p")
    tgt = nm.Input([2, 4], "b,x", dtype="int32", name="t")
    nll_w = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True,
                              class_weights=np.array([1.0, 0.0, 1.0]),
                              name="nw")
    p = np.full((2, 3, 4), 1 / 3, np.float32)
    t = np.ones((2, 4), np.int32)  # class 1 → weight 0
    out = eval_node(nll_w, {"p": p, "t": t})
    np.testing.assert_allclose(out, 0.0, atol=1e-6)

    mcl = np.array([[1, 1, 1], [0, 0, 0]], np.float32)  # ex. 2 unlabeled
    nll_m = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True,
                              mask_class_labeled=mcl, name="nm")
    out = eval_node(nll_m, {"p": p, "t": t})
    assert out[0].min() > 0 and np.all(out[1] == 0)


def test_losses_values(rng):
    a = nm.Input([2, 2, 3], "b,f,x", name="a")
    b = nm.Input([2, 2, 3], "b,f,x", name="b")
    va = rng.rand(2, 2, 3).astype(np.float32)
    vb = rng.rand(2, 2, 3).astype(np.float32)
    feed = {"a": va, "b": vb}
    np.testing.assert_allclose(
        eval_node(nm.SquaredLoss(a, b), feed),
        ((va - vb) ** 2).sum(1), rtol=1e-5)
    np.testing.assert_allclose(
        eval_node(nm.AbsLoss(a, b), feed),
        np.abs(va - vb).sum(1), rtol=1e-5)
    bn = eval_node(nm.BinaryNLL(a, b), feed)
    want = -(vb * np.log(va) + (1 - vb) * np.log(1 - va)).sum(1)
    np.testing.assert_allclose(bn, want, rtol=1e-4)


def test_gaussian_nll(rng):
    mu = nm.Input([2, 1, 3], "b,f,x", name="mu")
    sig = nm.Input([2, 1, 3], "b,f,x", name="sig")
    t = nm.Input([2, 1, 3], "b,f,x", name="t")
    g = nm.GaussianNLL(mu, sig, t)
    vmu = rng.randn(2, 1, 3).astype(np.float32)
    vsig = np.full((2, 1, 3), 2.0, np.float32)
    vt = rng.randn(2, 1, 3).astype(np.float32)
    out = eval_node(g, {"mu": vmu, "sig": vsig, "t": vt})
    want = (0.5 * ((vt - vmu) / vsig) ** 2 + np.log(vsig)).sum(1)
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_softmax_n_indep(rng):
    a = nm.Input([1, 4, 2], "b,f,x", name="a")
    s = nm.Softmax(a, n_indep=2)
    v = rng.randn(1, 4, 2).astype(np.float32)
    out = eval_node(s, {"a": v})
    np.testing.assert_allclose(out[:, :2].sum(1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[:, 2:].sum(1), 1.0, rtol=1e-5)


# ----------------------------------------------------------------- optimisers

@pytest.mark.parametrize("opt_name,hyper,steps", [
    ("SGD", {"lr": 0.1, "mom": 0.9}, 150),
    ("Adam", {"lr": 0.1}, 150),
    ("AdaGrad", {"lr": 0.5}, 150),
    ("AdaDelta", {"lr": 1.0}, 2500),   # AdaDelta ramps up slowly by design
])
def test_optimisers_minimise_quadratic(opt_name, hyper, steps):
    from elektronn2_tpu.neuromancer.optimiser import get_optimiser
    opt = get_optimiser(opt_name)(**hyper)
    params = {"n": {"w": jnp.asarray(np.array([3.0, -2.0], np.float32))}}
    state = opt.init_state(params)
    hyp = opt.current_hyper()

    @jax.jit
    def run_step(params, state):
        grads = jax.tree_util.tree_map(lambda w: 2 * w, params)
        return opt.update(params, grads, state, hyp)

    for _ in range(steps):
        params, state = run_step(params, state)
    assert float(jnp.abs(params["n"]["w"]).max()) < 0.05


def test_weight_decay_shrinks_params():
    from elektronn2_tpu.neuromancer.optimiser import SGD
    opt = SGD(lr=0.1, mom=0.0, wd=0.5)
    params = {"n": {"w": jnp.ones(3)}}
    state = opt.init_state(params)
    zeros = {"n": {"w": jnp.zeros(3)}}
    params, _ = opt.update(params, zeros, state, opt.current_hyper())
    np.testing.assert_allclose(np.asarray(params["n"]["w"]), 0.95, rtol=1e-5)


def test_reshape_transpose_nodes(rng):
    a = nm.Input([2, 3, 4], "b,f,x", name="a")
    r = nm.Reshape(a, [2, 12], "b,f")
    t = nm.Transpose(a, ["x", "b", "f"])
    v = rng.randn(2, 3, 4).astype(np.float32)
    np.testing.assert_array_equal(eval_node(r, {"a": v}), v.reshape(2, 12))
    np.testing.assert_array_equal(eval_node(t, {"a": v}),
                                  v.transpose(2, 0, 1))
    assert t.shape.tags == ("x", "b", "f")
    with pytest.raises(ValueError):
        nm.Reshape(a, [2, 13], "b,f")


def test_get_activations(rng):
    model = build_seg_model()
    x = rng.randn(2, 1, 16, 16).astype(np.float32)
    acts = model.get_activations(x, ["c1", "probs"])
    assert acts["c1"].shape[1] == 6
    np.testing.assert_allclose(np.asarray(acts["probs"]).sum(1), 1.0,
                               rtol=1e-5)


def test_gradient_clipping():
    from elektronn2_tpu.neuromancer.optimiser import SGD
    opt = SGD(lr=1.0, mom=0.0, clip=1.0)
    params = {"n": {"w": jnp.zeros(4)}}
    state = opt.init_state(params)
    big_grads = {"n": {"w": jnp.full(4, 100.0)}}
    new_p, _ = opt.update(params, big_grads, state, opt.current_hyper())
    # clipped to global norm 1 → |step| = lr * 100/200 = 0.5 per element
    np.testing.assert_allclose(np.linalg.norm(np.asarray(new_p["n"]["w"])),
                               1.0, rtol=1e-5)
    # clip=0 disables
    opt2 = SGD(lr=1.0, mom=0.0, clip=0.0)
    new_p2, _ = opt2.update(params, big_grads, opt2.init_state(params),
                            opt2.current_hyper())
    np.testing.assert_allclose(np.asarray(new_p2["n"]["w"]), -100.0,
                               rtol=1e-6)


def test_orbax_checkpoint_roundtrip(rng, tmp_path):
    """backend='orbax': directory checkpoint (sharded-array path) restores
    spec, params, optimiser state and step counter; restored model trains."""
    pytest.importorskip("orbax.checkpoint")
    from elektronn2_tpu.neuromancer.model import modelload
    inp = nm.Input([2, 1, 16, 16], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 8, 3, 2, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([2, *probs.shape.spatial_shape], "b,x,y",
                   dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt("Adam", lr=1e-3)
    x = rng.randn(2, 1, 16, 16).astype(np.float32)
    y = (rng.rand(2, 7, 7) > 0.5).astype(np.int32)
    for _ in range(3):
        m.trainingstep(x, y)
    path = str(tmp_path / "ckpt")
    m.save(path, backend="orbax")
    m2 = modelload(path)
    assert m2._step_count == 3
    np.testing.assert_allclose(np.asarray(m.params["c1"]["w"]),
                               np.asarray(m2.params["c1"]["w"]), atol=1e-6)
    l, _ = m2.trainingstep(x, y)
    assert np.isfinite(float(l))
    with pytest.raises(ValueError):
        m.save(str(tmp_path / "x"), backend="bogus")


def test_spec_roundtrip_fuzz(rng, tmp_path):
    """Property-style sweep: randomly assembled graphs from the node zoo
    must survive save -> load -> replay with bit-identical predictions."""
    from elektronn2_tpu.neuromancer.model import modelload

    for trial in range(6):
        trng = np.random.RandomState(100 + trial)
        model_manager.reset(seed=200 + trial)
        nsp = trng.choice([2, 3])
        tags = "b,f,z,x,y" if nsp == 3 else "b,f,x,y"
        sp = [int(trng.randint(9, 14)) for _ in range(nsp)]
        inp = nm.Input([1, 2, *sp], tags, name="raw")
        h = inp
        n_layers = trng.randint(1, 4)
        for i in range(n_layers):
            kind = trng.choice(["conv", "pool", "bn", "dropout", "lrn"])
            if kind == "conv" and min(h.shape.spatial_shape) >= 3:
                act = str(trng.choice(["relu", "tanh", "abs", "prelu"]))
                h = nm.Conv(h, int(trng.randint(2, 5)), 3, 1,
                            activation_func=act, name=f"c{i}")
            elif kind == "pool" and all(
                    s % 2 == 0 for s in h.shape.spatial_shape):
                h = nm.Pool(h, 2, name=f"p{i}")
            elif kind == "bn":
                h = nm.BatchNorm(h, name=f"bn{i}")
            elif kind == "dropout":
                h = nm.Dropout(h, 0.3, name=f"dr{i}")
            else:
                h = nm.LRN(h, name=f"lrn{i}")
        out = nm.Conv(h, 2, 1, 1, activation_func="lin", name="cls")
        probs = nm.Softmax(out, name="probs")
        m = model_manager.getmodel(f"fuzz{trial}")
        m.designate_nodes(input_node=inp, prediction_node=probs)

        x = trng.rand(1, 2, *sp).astype(np.float32)
        want = np.asarray(m.predict(x))
        f = str(tmp_path / f"fuzz{trial}.mdl")
        m.save(f)
        m2 = modelload(f)
        got = np.asarray(m2.predict(x))
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"trial {trial}")


def test_spec_roundtrip_fuzz_decoder(rng, tmp_path):
    """Decoder-family graphs (UpConv, Crop, FaithlessMerge, Concat,
    MultMerge) also survive save -> load -> replay bit-identically."""
    from elektronn2_tpu.neuromancer.model import modelload

    for trial in range(4):
        trng = np.random.RandomState(300 + trial)
        model_manager.reset(seed=400 + trial)
        sp = [12, 16, 16]
        inp = nm.Input([1, 2, *sp], "b,f,z,x,y", name="raw")
        enc0 = nm.Conv(inp, 4, (1, 3, 3), (1, 1, 1), name="enc0")
        enc1 = nm.Conv(enc0, 6, (3, 3, 3), (1, 2, 2), name="enc1")
        up = nm.UpConv(enc1, 4, (1, 2, 2), activation_func="relu",
                       name="up")
        merge_kind = trng.choice(["faithless", "crop_concat", "mult"])
        if merge_kind == "faithless":
            h = nm.FaithlessMerge(up, enc0, name="merge")
        elif merge_kind == "crop_concat":
            crop = [(enc0.shape[2 + d] - up.shape[2 + d]) // 2
                    for d in range(3)]
            c = nm.Crop(enc0, crop, name="crop")
            # Crop trims symmetrically; match any off-by-one via a second
            # crop of the up path if needed
            if tuple(c.shape.spatial_shape) != tuple(
                    up.shape.spatial_shape):
                continue
            h = nm.Concat([up, c], axis="f", name="cat")
        else:
            proj = nm.Conv(enc0, 4, 1, 1, name="proj")
            crop = [(proj.shape[2 + d] - up.shape[2 + d]) // 2
                    for d in range(3)]
            h = nm.MultMerge(up, nm.Crop(proj, crop, name="crop"),
                             name="mm")
        out = nm.Conv(h, 2, 1, 1, activation_func="lin", name="cls")
        m = model_manager.getmodel(f"dec{trial}")
        m.designate_nodes(input_node=inp, prediction_node=out)
        x = trng.rand(1, 2, *sp).astype(np.float32)
        want = np.asarray(m.predict(x))
        f = str(tmp_path / f"dec{trial}.mdl")
        m.save(f)
        got = np.asarray(modelload(f).predict(x))
        np.testing.assert_array_equal(got, want)


def test_unique_name_skips_explicit_collisions():
    """Auto-suffixed names must not collide with explicitly-named nodes."""
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 16, 16], "b,f,x,y", name="raw")
    a = nm.Conv(inp, 2, 3, 1, name="conv1")       # explicit
    b = nm.Conv(inp, 2, 3, 1, name="conv")        # auto: 'conv'
    c = nm.Conv(inp, 2, 3, 1, name="conv")        # auto: must skip conv1
    names = {a.name, b.name, c.name}
    assert len(names) == 3 and "conv1" in names and "conv2" in names


def test_simple_cnn_rejects_misaligned_lists():
    from elektronn2_tpu.neuromancer.model import simple_cnn
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset()
    with pytest.raises(ValueError, match="nof_filters"):
        simple_cnn(1, 1, 2, 31, filters=[3, 3, 3], pools=[2, 2, 1],
                   nof_filters=[4, 8], ndim=2)
    with pytest.raises(ValueError, match="dropout_rates"):
        simple_cnn(1, 1, 2, 31, filters=[3, 3], pools=[2, 1],
                   nof_filters=[4, 8], dropout_rates=[0.1], ndim=2)


def test_kernel_lists_property():
    """Model.kernel_lists returns the Conv chain triplet cnncalculator
    consumes (reference: model.py::kernel_lists)."""
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset(seed=0)
    inp = nm.Input([1, 1, 22, 22, 22], "b,f,z,x,y", name="raw")
    h = nm.Conv(inp, 4, (1, 3, 3), (1, 2, 2), name="c0")
    h = nm.Conv(h, 6, (3, 3, 3), (1, 1, 1), name="c1")
    out = nm.Softmax(nm.Conv(h, 2, (1, 1, 1), (1, 1, 1),
                             activation_func="lin", name="head"))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=out)
    filters, pools, mfps = m.kernel_lists
    assert filters == [[1, 3, 3], [3, 3, 3], [1, 1, 1]]
    assert pools == [[1, 2, 2], [1, 1, 1], [1, 1, 1]]
    assert mfps == [False, False, False]
    # feeds cnncalculator directly
    from elektronn2_tpu.utils.cnncalculator import cnncalculator
    calc = cnncalculator(filters, pools, desired_patch_size=[22, 22, 22],
                         mfp=mfps, ndim=3)
    assert calc.input is not None


def test_repair_fuckup_rolls_back(rng):
    """snapshot_good/repair_fuckup restore params + optimiser state and
    optionally back the lr off (reference: optimiser.py::repair_fuckup)."""
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset(seed=1)
    inp = nm.Input([2, 4], "b,f", name="x")
    out = nm.Perceptron(inp, 3, activation_func="lin", name="p")
    tgt = nm.Input([2, 3], "b,f", name="t")
    loss = nm.AggregateLoss(nm.SquaredLoss(out, tgt))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=out)
    m.set_opt("Adam", lr=1e-2)
    assert m.repair_fuckup() is False      # nothing recorded yet
    d = rng.randn(2, 4).astype(np.float32)
    t = rng.randn(2, 3).astype(np.float32)
    m.trainingstep(d, t)
    m.snapshot_good()
    good_w = np.asarray(m.params["p"]["w"]).copy()
    good_opt = jax.tree_util.tree_map(np.asarray, m.opt_state)
    # blow the run up
    m.params["p"]["w"] = jnp.full_like(m.params["p"]["w"], np.nan)
    m.trainingstep(d, t)
    assert m.repair_fuckup(lr_scale=0.5) is True
    np.testing.assert_array_equal(np.asarray(m.params["p"]["w"]), good_w)
    for a, b in zip(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, m.opt_state)),
            jax.tree_util.tree_leaves(good_opt)):
        np.testing.assert_array_equal(a, b)
    assert m.optimiser.hyperparams["lr"] == pytest.approx(5e-3)
    # training continues finitely from the restored state
    lv, _ = m.trainingstep(d, t)
    assert np.isfinite(float(lv))


def test_make_func_evaluates_subgraph(rng):
    """graphutils.make_func compiles an arbitrary node-subset evaluation
    (reference: graphutils.py::make_func wrapping theano.function)."""
    from elektronn2_tpu.neuromancer.graphutils import make_func
    nm.model_manager.reset(seed=0)
    inp = nm.Input([2, 3, 9, 9], "b,f,x,y", name="raw")
    h = nm.Conv(inp, 4, (3, 3), (1, 1), name="c0")
    out = nm.Conv(h, 2, (3, 3), (1, 1), name="c1")
    f = make_func(inp, [h, out], profile_execution=True)
    x = rng.randn(2, 3, 9, 9).astype(np.float32)
    vh, vo = f(x)
    assert vh.shape == (2, 4, 7, 7) and vo.shape == (2, 2, 5, 5)
    assert len(f.exec_times) == 1
    # matches Model-built prediction for the same graph/params
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=out)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(m.predict(x)),
                               atol=1e-6)
    # updated params flow through the `params` keyword without recompile
    import jax.tree_util as jtu
    p2 = jtu.tree_map(lambda a: a * 0.0, dict(m.params))
    vo2 = f(x, params=p2)[1]
    np.testing.assert_array_equal(np.asarray(vo2), 0.0)
    # single-output / arity-error surfaces
    fs = make_func(inp, out)
    assert np.asarray(fs(x)).shape == (2, 2, 5, 5)
    with pytest.raises(TypeError, match="expects 1 input"):
        fs(x, x)
    other = nm.Input([1, 1], "b,f", name="stranger")
    with pytest.raises(ValueError, match="not ancestors"):
        make_func(other, out)


def test_variable_param_containers(rng):
    """VariableParam/VariableWeight/ConstantParam carry flags into
    Node.register_param (reference: variables.py containers)."""
    from elektronn2_tpu.neuromancer.variables import (
        VariableParam, VariableWeight, ConstantParam, init_weight)
    nm.model_manager.reset(seed=0)
    inp = nm.Input([1, 3], "b,f", name="raw")
    n = nm.ApplyFunc(inp, lambda x: x, name="holder")
    w = VariableWeight(shape=(3, 2), init_kwargs={"rng": rng},
                       lr_mult=0.5, name="w")
    c = ConstantParam(np.ones(2), name="c")
    p = VariableParam(np.zeros(2), apply_train=False, apply_reg=False)
    n.register_param("w", w)
    n.register_param("c", c)
    n.register_param("p", p)
    assert n.param_flags["w"] == {"trainable": True, "lr_mult": 0.5,
                                  "wd_mult": 1.0}
    assert n.param_flags["c"]["trainable"] is False
    assert n.param_flags["p"] == {"trainable": False, "lr_mult": 1.0,
                                  "wd_mult": 0.0}
    np.testing.assert_array_equal(n.params["w"], w.get_value())
    # shared-variable surface round-trips
    p.set_value(np.full(2, 7.0))
    np.testing.assert_array_equal(p.get_value(), 7.0)
    assert p.shape == (2,)
    # VariableWeight with explicit rng reproduces init_weight
    w2 = VariableWeight(shape=(3, 2),
                        init_kwargs={"rng": np.random.RandomState(5)})
    np.testing.assert_array_equal(
        w2.value, init_weight(np.random.RandomState(5), (3, 2)))
    with pytest.raises(ValueError, match="value or shape"):
        VariableWeight()


def test_kernel_lists_module_function():
    from elektronn2_tpu.neuromancer.model import kernel_lists
    nm.model_manager.reset(seed=0)
    inp = nm.Input([1, 1, 10, 10], "b,f,x,y", name="raw")
    out = nm.Conv(inp, 2, (3, 3), (2, 2), name="c0")
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=out)
    assert kernel_lists(m) == m.kernel_lists
