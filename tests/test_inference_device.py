"""Device-resident dense inference + mixed precision tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import elektronn2_tpu.neuromancer as nm
from elektronn2_tpu.neuromancer import model_manager


@pytest.fixture(autouse=True)
def fresh_graph():
    model_manager.reset(seed=9)
    yield


def mfp_model():
    from elektronn2_tpu.utils import cnncalculator
    calc = cnncalculator([3, 3], [2, 2], desired_patch_size=21, mfp=True,
                         ndim=1)
    n = calc.input
    inp = nm.Input([1, 1, n, n], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    c2 = nm.Conv(c1, 2, 3, 2, mfp=True, name="c2")
    probs = nm.Softmax(c2)
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    return m


def test_device_sweep_matches_host(rng):
    m = mfp_model()
    raw = rng.randn(1, 33, 33).astype(np.float32)
    host = m.predict_dense(raw)
    dev = np.asarray(m.predict_dense_device(jnp.asarray(raw)))
    np.testing.assert_allclose(dev, host, atol=1e-6)
    host_p = m.predict_dense(raw, pad_raw=True)
    dev_p = np.asarray(m.predict_dense_device(jnp.asarray(raw),
                                              pad_raw=True))
    np.testing.assert_allclose(dev_p, host_p, atol=1e-6)


def test_dilated_dense_strided_model(rng):
    """Non-MFP model: dilated device path gives genuinely dense output whose
    strided subsample equals the host (tiled) path."""
    from elektronn2_tpu.utils import cnncalculator
    calc = cnncalculator([3, 3], [2, 2], desired_patch_size=26, mfp=False,
                         ndim=1)
    n = calc.input
    inp = nm.Input([1, 1, n, n], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, name="c1")
    c2 = nm.Conv(c1, 2, 3, 2, name="c2")
    probs = nm.Softmax(c2)
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    raw = rng.randn(1, 33, 33).astype(np.float32)
    host = m.predict_dense(raw)               # repeat-upsampled strided map
    dev = np.asarray(m.predict_dense_device(jnp.asarray(raw)))
    assert dev.shape == host.shape == (2, 24, 24)
    np.testing.assert_allclose(dev[:, ::4, ::4], host[:, ::4, ::4],
                               atol=1e-5)


def test_dilated_fallback_on_unsupported_graph(rng):
    """Graphs the dilated path can't handle fall back to tiling silently."""
    inp = nm.Input([1, 1, 21, 21], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    bn = nm.BatchNorm(c1)                      # unsupported in dilated path
    probs = nm.Softmax(nm.Conv(bn, 2, 1, 1, activation_func="lin"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    raw = rng.randn(1, 27, 27).astype(np.float32)
    host = m.predict_dense(raw)
    dev = np.asarray(m.predict_dense_device(jnp.asarray(raw)))
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_mixed_precision_close_to_f32(rng):
    m = mfp_model()
    raw = rng.randn(1, 33, 33).astype(np.float32)
    full = m.predict_dense(raw)
    m.set_compute_dtype("bfloat16")
    half = m.predict_dense(raw)
    # probabilities: bf16 operand rounding ⇒ small absolute deviation
    assert np.abs(full - half).max() < 0.05
    m.set_compute_dtype(None)
    again = m.predict_dense(raw)
    np.testing.assert_allclose(again, full, atol=1e-6)


def test_mixed_precision_training_converges(rng):
    inp = nm.Input([2, 1, 16, 16], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 8, 3, 2, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([2, *probs.shape.spatial_shape], "b,x,y", dtype="int32",
                   name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_compute_dtype("bfloat16")
    m.set_opt("Adam", lr=2e-3)
    x = rng.randn(2, 1, 16, 16).astype(np.float32)
    osz = probs.shape.spatial_shape[0]
    lo = (16 - osz) // 2
    y = (x[:, 0, lo:lo + osz, lo:lo + osz] > 0).astype(np.int32)
    losses = [float(m.trainingstep(x, y)[0]) for _ in range(80)]
    assert losses[-1] < 0.8 * losses[0]
    # master params stay f32
    assert m.params["c1"]["w"].dtype == jnp.float32


def test_dilated_cache_invalidated_on_dtype_change(rng):
    """set_compute_dtype must recompile the dilated device path."""
    m = mfp_model()
    raw = jnp.asarray(rng.randn(1, 33, 33).astype(np.float32))
    full = np.asarray(m.predict_dense_device(raw))
    m.set_compute_dtype("bfloat16")
    half = np.asarray(m.predict_dense_device(raw))
    assert not np.array_equal(full, half)   # stale cache would be identical
    assert np.abs(full - half).max() < 0.05


def test_dilated_path_supports_trained_batchnorm(rng):
    """BN with running stats is a per-channel affine in eval mode — the
    dilated path must apply it and match the tiled path exactly."""
    from elektronn2_tpu.utils import cnncalculator
    calc = cnncalculator([3, 3], [2, 1], desired_patch_size=17, mfp=True,
                         ndim=2)
    n = calc.input
    inp = nm.Input([2, 1, *n], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, batch_normalisation=True,
                 name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([probs.shape["b"], *probs.shape.spatial_shape],
                   "b,x,y", dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt("Adam", lr=1e-3)
    for _ in range(3):   # populate BN running stats
        x = rng.rand(2, 1, *n).astype(np.float32)
        y = (rng.rand(probs.shape["b"],
                      *probs.shape.spatial_shape) > 0.5).astype(np.int32)
        m.trainingstep(x, y)
    assert "c1" in m.state
    raw = rng.rand(1, 30, 30).astype(np.float32)
    host = m.predict_dense(raw)
    dev = np.asarray(m.predict_dense_device(jnp.asarray(raw)))
    np.testing.assert_allclose(dev, host, atol=1e-5)


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_fuzz_random_stacks_dense_paths_agree(seed):
    """Property test: random conv/pool/mfp stacks — the tiled host sweep,
    the dilated device sweep, and direct prediction must agree."""
    r = np.random.RandomState(seed)
    n_layers = r.randint(1, 4)
    filters, pools = [], []
    for _ in range(n_layers):
        filters.append(int(r.randint(2, 4)))
        pools.append(int(r.choice([1, 2])))
    from elektronn2_tpu.utils import cnncalculator
    calc = cnncalculator(filters, pools,
                         desired_patch_size=int(r.randint(12, 24)),
                         mfp=True, ndim=1)
    n = calc.input
    inp = nm.Input([1, 1, n, n], "b,f,x,y", name="raw")
    h = inp
    for i, (f, p) in enumerate(zip(filters, pools)):
        h = nm.Conv(h, int(r.randint(2, 5)), f, p, mfp=True,
                    activation_func=str(r.choice(["relu", "tanh", "elu"])),
                    name=f"c{i}")
    probs = nm.Softmax(nm.Conv(h, 2, 1, 1, activation_func="lin"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)

    V = n + int(r.randint(3, 9))
    raw = r.rand(1, V, V).astype(np.float32)
    host = m.predict_dense(raw)
    dev = np.asarray(m.predict_dense_device(jnp.asarray(raw)))
    np.testing.assert_allclose(dev, host, atol=2e-5)
    # direct prediction at origin must appear at dense offset 0
    tile = raw[:, :n, :n]
    from elektronn2_tpu.ops.mfp import fragments2dense
    direct = np.asarray(fragments2dense(
        m.predict(tile[None]), probs.shape.mfp_offsets))[0]
    np.testing.assert_allclose(
        host[:, :direct.shape[1], :direct.shape[2]], direct, atol=2e-5)
