"""Pallas tail-conv kernel: exactness vs lax.conv_general_dilated.

The kernel (`ops/pallas_tailconv.py`) is the hand-written MXU path for the
dense-sweep tail convs (reference mechanism:
``elektronn2/neuromancer/computations.py::conv`` under the à-trous
identity). On CPU it runs in Pallas interpreter mode — exact but slow, so
shapes here are small; the production-size numbers live in
docs/tpu_performance.md.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from elektronn2_tpu.ops.pallas_tailconv import (conv3x3_dilated,
                                                conv3x3_dilated_reference)


def _rand(rng, *shape):
    return jnp.asarray((rng.rand(*shape) - 0.5).astype(np.float32))


@pytest.mark.parametrize("variant", ["tap9", "kfuse", "mstack",
                                     "mstack3", "mstack2p", "nfold",
                                     "mstackd"])
def test_variants_match_lax(variant):
    rng = np.random.RandomState(0)
    for (Cin, Cout, Z, X, Y, dil) in [
            (5, 7, 6, 14, 20, (1, 1, 1)),
            (5, 7, 6, 20, 30, (1, 4, 4)),
            (30, 40, 5, 12, 24, (1, 2, 3)),   # channel pad + anisotropic
    ]:
        x = _rand(rng, 1, Cin, Z, X, Y)
        w = _rand(rng, Cout, Cin, 3, 3, 3)
        b = _rand(rng, Cout)
        ref = conv3x3_dilated_reference(x, w, b, dil)
        got = conv3x3_dilated(x, w, b, dil, interpret=True, variant=variant,
                              z_block=4)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_prefetch_depths_exact():
    # prefetch only changes the DMA schedule (A slabs in flight), never
    # values; cover A larger than the x extent too
    rng = np.random.RandomState(3)
    x = _rand(rng, 1, 6, 7, 12, 26)
    w = _rand(rng, 6, 6, 3, 3, 3)
    b = _rand(rng, 6)
    ref = conv3x3_dilated_reference(x, w, b, (1, 2, 2))
    for pf in (1, 2, 4, 16):
        got = conv3x3_dilated(x, w, b, (1, 2, 2), interpret=True,
                              z_block=4, prefetch=pf)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_z_block_raggedness():
    # Zo not divisible by z_block exercises the Zo padding + slice
    rng = np.random.RandomState(1)
    x = _rand(rng, 1, 8, 9, 14, 22)          # Zo = 7
    w = _rand(rng, 8, 8, 3, 3, 3)
    b = _rand(rng, 8)
    ref = conv3x3_dilated_reference(x, w, b, (1, 2, 2))
    for zb in (1, 3, 8, 16):
        got = conv3x3_dilated(x, w, b, (1, 2, 2), interpret=True, z_block=zb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_chained_xzcy_layout():
    # conv -> conv in the kernel-native layout: producer emits lane-padded
    # (X, Z, C, Ypad) with valid lanes Yo; consumer takes valid_y
    rng = np.random.RandomState(2)
    Cin, Cmid, Cout = 8, 16, 8
    x = _rand(rng, 1, Cin, 7, 18, 26)
    w1, b1 = _rand(rng, Cmid, Cin, 3, 3, 3), _rand(rng, Cmid)
    w2, b2 = _rand(rng, Cout, Cmid, 3, 3, 3), _rand(rng, Cout)
    dil = (1, 2, 2)
    ref = conv3x3_dilated_reference(
        conv3x3_dilated_reference(x, w1, b1, dil), w2, b2, dil)
    mid = conv3x3_dilated(x, w1, b1, dil, out_layout="xzcy", interpret=True)
    assert mid.shape[-1] % 128 == 0          # lane-padded for the chain
    yo_mid = 26 - 2 * dil[2]
    got = conv3x3_dilated(mid, w2, b2, dil, in_layout="xzcy",
                          valid_y=yo_mid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_graph_pallas_tail_equals_direct():
    # whole dilated dense sweep with set_dilated_impl(pallas_tail=True)
    # == the 'direct' lowering (the flagship's two tail convs chain)
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_model
    m = _flagship_model(mfp=True, patch=[15, 55, 55])
    vol = jnp.asarray(np.random.RandomState(0).rand(
        1, 10, 64, 64).astype(np.float32))
    m.set_dilated_impl("direct")
    ref = np.asarray(m.predict_dense_device(vol, pad_raw=True))
    m.set_dilated_impl("direct", zfold=True, pallas_tail=True)
    got = np.asarray(m.predict_dense_device(vol, pad_raw=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)
    m.set_dilated_impl("direct")             # leave the model clean


def test_invalid_args_raise():
    rng = np.random.RandomState(3)
    x = _rand(rng, 1, 4, 6, 10, 12)
    w = _rand(rng, 4, 4, 3, 3, 3)
    b = _rand(rng, 4)
    with pytest.raises(ValueError, match="z-dilation"):
        conv3x3_dilated(x, w, b, (2, 1, 1), interpret=True)
    with pytest.raises(ValueError, match="relu"):
        conv3x3_dilated(x, w, b, (1, 1, 1), relu=False, interpret=True)
    with pytest.raises(ValueError, match="variant"):
        conv3x3_dilated(x, w, b, (1, 1, 1), variant="nope", interpret=True)
    with pytest.raises(ValueError, match="too small"):
        conv3x3_dilated(_rand(rng, 1, 4, 2, 10, 12), w, b, (1, 1, 1),
                        interpret=True)


def test_rebuild_carries_ptail_config():
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_model
    from elektronn2_tpu.neuromancer.model import rebuild_model
    m = _flagship_model(mfp=True, patch=[15, 55, 55])
    m.set_dilated_impl("direct", zfold=True, pallas_tail=True)
    m2 = rebuild_model(m)
    assert getattr(m2, "_dilated_ptail", False) is True
    assert m2._dilated_zfold is True


def test_tune_grid_includes_ptail_and_restores():
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_model
    m = _flagship_model(mfp=True, patch=[15, 55, 55])
    m.set_dilated_impl("s2bg", zfold=True)
    res = m.tune_serving(steps=[(8, 48, 48)], slab_batches=(1,), K=1,
                         include_bf16=False, include_int8=False,
                         apply=False)
    labels = [(r.get("impl"), r.get("ptail")) for r in res["table"]
              if "mvox_s" in r]
    assert ("direct", True) in labels, labels
    # restore: the incumbent config is back on the model
    assert m._dilated_impl == "s2bg" and m._dilated_zfold is True
    assert getattr(m, "_dilated_ptail", False) is False


def test_predict_cli_ptail(tmp_path):
    """--ptail output matches the default f32 run (3D graph, h5 path)."""
    import numpy as np
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.utils.basic import h5save, h5load
    from elektronn2_tpu.scripts.predict import main
    rng = np.random.RandomState(0)
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 7, 15, 15], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, (3, 3, 3), (1, 2, 2), mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    mdl = str(tmp_path / "m.mdl")
    m.save(mdl)
    vol = rng.rand(1, 10, 24, 24).astype(np.float32)
    h5save({"raw": vol}, str(tmp_path / "in.h5"))
    o1, o2 = str(tmp_path / "a.h5"), str(tmp_path / "b.h5")
    assert main([mdl, str(tmp_path / "in.h5") + ":raw", "-o", o1,
                 "--cpu"]) == 0
    assert main([mdl, str(tmp_path / "in.h5") + ":raw", "-o", o2,
                 "--cpu", "--ptail"]) == 0
    a, b = h5load(o1, "prediction"), h5load(o2, "prediction")
    np.testing.assert_allclose(a, b, atol=1e-5)
    import pytest
    from elektronn2_tpu.scripts.predict import main as _main
    with pytest.raises(SystemExit):
        _main([mdl, str(tmp_path / "in.h5") + ":raw", "-o", o2,
               "--cpu", "--ptail", "--bf16"])


@pytest.mark.parametrize("cfg", [(1, 20, 1, 2), (20, 30, 2, 2),
                                 (4, 6, 1, 1), (3, 5, 3, 2)])
def test_head_unit_matches_lax(cfg):
    from elektronn2_tpu.ops.pallas_tailconv import (
        conv1x3x3_pool_dilated, conv1x3x3_pool_reference)
    Cin, Cout, d, pool = cfg
    rng = np.random.RandomState(0)
    Z, X, Y = 5, 18, 26
    x = _rand(rng, 1, Cin, Z, X, Y)
    w = _rand(rng, Cout, Cin, 1, 3, 3)
    b = _rand(rng, Cout)
    ref = conv1x3x3_pool_reference(x, w, b, (d, d), pool)
    got = conv1x3x3_pool_dilated(x, w, b, (d, d), pool, interpret=True,
                                 z_block=4)
    Zr, Xo, Yo = ref.shape[2], ref.shape[3], ref.shape[4]
    g = np.asarray(got)[:, :Zr, :Cout, :Yo].transpose(2, 1, 0, 3)[None]
    np.testing.assert_allclose(g, np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_full_pallas_chain_head_head_tail():
    """conv0+pool0 -> conv1+pool1 -> conv2 chained in the kernel-native
    xzcy layout == the lax op sequence (the full dense path in Pallas)."""
    from elektronn2_tpu.ops.pallas_tailconv import (
        conv1x3x3_pool_dilated, conv1x3x3_pool_reference)
    rng = np.random.RandomState(1)
    Z, X, Y = 6, 30, 40
    x = jnp.asarray(rng.rand(1, 1, Z, X, Y).astype(np.float32))
    w0, b0 = _rand(rng, 8, 1, 1, 3, 3), jnp.zeros(8)
    w1, b1 = _rand(rng, 8, 8, 1, 3, 3), jnp.zeros(8)
    w2, b2 = _rand(rng, 8, 8, 3, 3, 3), jnp.zeros(8)
    r = conv1x3x3_pool_reference(x, w0, b0, (1, 1), 2)
    r = conv1x3x3_pool_reference(r, w1, b1, (2, 2), 2)
    r = conv3x3_dilated_reference(r, w2, b2, (1, 4, 4))
    h = conv1x3x3_pool_dilated(x, w0, b0, (1, 1), 2, interpret=True,
                               z_block=4)
    h = conv1x3x3_pool_dilated(h, w1, b1, (2, 2), 2, in_layout="xzcy",
                               valid_y=Y - 3, interpret=True, z_block=4)
    g = conv3x3_dilated(h, w2, b2, (1, 4, 4), in_layout="xzcy",
                        valid_y=Y - 9, interpret=True, z_block=4)
    g = np.asarray(g)[:, :, :r.shape[2]]   # head Z-pad rows sliced
    np.testing.assert_allclose(g, np.asarray(r), atol=1e-4, rtol=1e-4)


def test_ptail_dict_knobs_flow_to_kernel():
    """set_dilated_impl(pallas_tail={'variant': ..., 'z_block': ...})
    still produces the exact dense output (knobs are perf-only)."""
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_model
    m = _flagship_model(mfp=True, patch=[15, 55, 55])
    vol = jnp.asarray(np.random.RandomState(0).rand(
        1, 10, 64, 64).astype(np.float32))
    m.set_dilated_impl("direct")
    ref = np.asarray(m.predict_dense_device(vol, pad_raw=True))
    m.set_dilated_impl("direct", zfold=True,
                       pallas_tail={"variant": "mstack3", "z_block": 4})
    got = np.asarray(m.predict_dense_device(vol, pad_raw=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_batched_slab_ptail_equals_per_slab():
    """slab_batch serving keeps the Pallas tail kernel: batch=True with
    B=2 slabs routes each slab through the kernel (static in-jit loop,
    incl. the chained xzcy layout + 1x1 head) and equals the per-slab
    runs AND the direct lowering."""
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_model
    from elektronn2_tpu.neuromancer.inference import dilated_dense_forward
    m = _flagship_model(mfp=True, patch=[15, 55, 55])
    rng = np.random.RandomState(4)
    vols = jnp.asarray(rng.rand(2, 1, 18, 70, 70).astype(np.float32))
    m.set_dilated_impl("direct", zfold=True, pallas_tail=True)
    got = np.asarray(dilated_dense_forward(m, vols, batch=True))
    per = np.stack([np.asarray(dilated_dense_forward(m, vols[i]))
                    for i in range(2)])
    np.testing.assert_allclose(got, per, atol=1e-6)
    m.set_dilated_impl("direct")
    ref = np.stack([np.asarray(dilated_dense_forward(m, vols[i]))
                    for i in range(2)])
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_sharded_dense_with_ptail_equals_unsharded():
    """SP (z-sharded, halo-exchange) dense sweep with pallas_tail on:
    the kernel runs per shard after the z halo gather — output equals the
    unsharded ptail sweep exactly (virtual CPU mesh, interpret mode)."""
    import sys
    sys.path.insert(0, ".")
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer.graphmanager import model_manager
    from elektronn2_tpu.parallel.mesh import make_mesh
    rng = np.random.RandomState(0)
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 11, 21, 21], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, (3, 3, 3), (1, 2, 2), mfp=True, name="c1")
    c2 = nm.Conv(c1, 4, (3, 3, 3), (1, 1, 1), mfp=True, name="c2")
    probs = nm.Softmax(nm.Conv(c2, 2, 1, 1, activation_func="lin"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    m.set_dilated_impl("direct", zfold=True, pallas_tail=True)
    vol = jnp.asarray(rng.rand(1, 16, 30, 30).astype(np.float32))
    un = np.asarray(m.predict_dense_device(vol))
    mesh = make_mesh({"space": 4}, n_devices=4)
    sh = np.asarray(m.predict_dense_sharded(vol, mesh))
    assert sh.shape == un.shape
    np.testing.assert_allclose(sh, un, atol=1e-6)


def test_pred_node_with_offpath_child_stays_nczxy():
    """Regression: when the designated prediction node is itself an
    eligible tail conv whose only child lives OFF the evaluated subgraph,
    the dense output must still come back in nczxy (it leaked the
    kernel-native xzcy layout before the fix)."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer.graphmanager import model_manager
    rng = np.random.RandomState(0)
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 9, 19, 19], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, (3, 3, 3), (1, 1, 1), mfp=False, name="c1")
    nm.Conv(c1, 4, (3, 3, 3), (1, 1, 1), mfp=False, name="c2_offpath")
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=c1)
    m.set_dilated_impl("direct")
    vol = jnp.asarray(rng.rand(1, 12, 24, 24).astype(np.float32))
    ref = np.asarray(m.predict_dense_device(vol, pad_raw=True))
    m.set_dilated_impl("direct", zfold=True, pallas_tail=True)
    got = np.asarray(m.predict_dense_device(vol, pad_raw=True))
    assert got.shape == ref.shape == (4, 12, 24, 24)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_tune_preserves_ptail_dict_incumbent():
    """A dict-valued pallas_tail config (kernel tuning knobs) survives
    tune_serving's capture/restore instead of flattening to bool."""
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_model
    m = _flagship_model(mfp=True, patch=[15, 55, 55])
    knobs = {"variant": "mstack3", "z_block": 4}
    m.set_dilated_impl("direct", zfold=True, pallas_tail=dict(knobs))
    m.tune_serving(steps=[(8, 48, 48)], slab_batches=(1,), K=1,
                   include_bf16=False, include_int8=False, apply=False)
    assert m._dilated_ptail == knobs, m._dilated_ptail
