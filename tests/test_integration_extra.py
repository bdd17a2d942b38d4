"""Remaining-surface integration tests: simple_cnn, rc config, KNOSSOS
whole-dataset sweep, bmap affinity graphs."""

import os
import pathlib

import numpy as np
import pytest
import jax.numpy as jnp

import elektronn2_tpu.neuromancer as nm
from elektronn2_tpu.neuromancer import model_manager


@pytest.fixture(autouse=True)
def fresh_graph():
    model_manager.reset(seed=21)
    yield


def test_simple_cnn_builds_and_trains(rng):
    model = nm.simple_cnn(batch_size=1, n_ch=1, n_lab=2,
                          desired_input=[18, 18], filters=[3, 3],
                          pools=[2, 1], nof_filters=[4, 4], ndim=2)
    assert model.prediction_node is not None
    x = rng.rand(*model.input_node.shape).astype(np.float32)
    y = (rng.rand(model.target_node.shape["b"],
                  *model.target_node.shape.spatial_shape) > 0.5
         ).astype(np.int32)
    model.set_opt("Adam", lr=2e-3)
    losses = [float(model.trainingstep(x, y)[0]) for _ in range(10)]
    assert np.isfinite(losses).all()


def test_rc_file_config(tmp_path, monkeypatch):
    rc = tmp_path / "rc"
    rc.write_text("save_path = '/tmp/custom_save'\nplot_on = False\n")
    import elektronn2_tpu.config as cfg
    monkeypatch.setattr(cfg, "RC_PATHS", (str(rc),))
    c = cfg.Config()
    assert c.save_path == "/tmp/custom_save"
    assert c.plot_on is False


def test_experiment_config_exec(tmp_path):
    f = tmp_path / "exp.py"
    f.write_text("batch_size = 4\nn_steps = 77\n"
                 "def create_model():\n    return 'sentinel'\n")
    from elektronn2_tpu.config import ExperimentConfig
    exp = ExperimentConfig.from_file(str(f))
    d = exp.as_dict()
    assert d["batch_size"] == 4 and d["n_steps"] == 77
    assert d["create_model"]() == "sentinel"
    assert exp.save_name == "exp"


def test_knossos_whole_dataset_sweep(rng, tmp_path):
    from test_data import write_knossos
    from elektronn2_tpu.data import KnossosArray

    inp = nm.Input([1, 1, 9, 17, 17], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)

    vol = (rng.rand(24, 32, 32) * 255).astype(np.uint8)
    path = write_knossos(tmp_path, vol, cube_edge=8)
    ka = KnossosArray(path, cube_edge=8)
    out = m.sweep_knossos(ka, step=[12, 16, 16])
    ref = np.asarray(m.predict_dense_device(
        jnp.asarray(vol[None].astype(np.float32) / 255.0), pad_raw=True))
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # region-restricted sweep
    out2 = m.sweep_knossos(ka, region=[(4, 20), (8, 24), (0, 32)],
                           step=[8, 16, 16])
    np.testing.assert_allclose(out2, ref[:, 4:20, 8:24, :], atol=1e-6)
    # batched multi-slab sweep (VERDICT r1 #1b): identical output, incl.
    # a final partial chunk (5 slabs into chunks of 2)
    out3 = m.sweep_knossos(ka, step=[12, 16, 16], slab_batch=2)
    np.testing.assert_allclose(out3, ref, atol=1e-6)
    out4 = m.sweep_knossos(ka, region=[(4, 20), (8, 24), (0, 32)],
                           step=[8, 16, 16], slab_batch=4)
    np.testing.assert_allclose(out4, ref[:, 4:20, 8:24, :], atol=1e-6)


def test_bmap_to_affgraph():
    from elektronn2_tpu.malis import bmap_to_affgraph, mknhood3d
    bmap = np.zeros((3, 3, 3), np.int32)
    bmap[1] = 1     # boundary plane
    aff = np.asarray(bmap_to_affgraph(bmap, mknhood3d(1)))
    assert aff.shape == (3, 3, 3, 3)
    assert aff[0, 1].max() == 0          # no z-connection through boundary
    assert aff[1, 0, 1:].max() == 1      # in-plane connections off boundary


def test_timeit_and_cache():
    from elektronn2_tpu.utils.basic import timeit, cache
    calls = []

    @cache
    def f(x):
        calls.append(x)
        return x * 2

    assert f(3) == 6 and f(3) == 6
    assert calls == [3]

    @timeit
    def g(x):
        return x + 1

    assert g(1) == 2


def test_parity_harness_plumbing(rng, tmp_path):
    """Generate a golden file with OUR outputs and check the harness
    round-trips to PASS (mechanism test; real goldens come from the
    reference stack)."""
    import json
    import h5py
    import sys
    sys.path.insert(0, "scripts")

    filters = [[1, 3, 3], [3, 3, 3]]
    pools = [[1, 2, 2], [1, 1, 1]]
    w0 = rng.randn(4, 1, 1, 3, 3).astype(np.float32)
    b0 = np.zeros(4, np.float32)
    w1 = rng.randn(2, 4, 3, 3, 3).astype(np.float32)
    b1 = np.zeros(2, np.float32)

    model_manager.reset()
    raw = rng.rand(1, 9, 20, 20).astype(np.float32)
    inp = nm.Input([1, 1, 9, 14, 14], "b,f,z,x,y", name="raw")
    c0 = nm.Conv(inp, 4, filters[0], pools[0], w=w0, b=b0, name="c0")
    c1 = nm.Conv(c0, 2, filters[1], pools[1], w=w1, b=b1, name="c1")
    probs = nm.Softmax(c1)
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    golden_probs = m.predict_dense(raw, prefer_device=False)

    g = str(tmp_path / "golden.h5")
    with h5py.File(g, "w") as f:
        f["raw"] = raw
        f["probs"] = golden_probs
        f["w0"], f["b0"] = w0, b0
        f["w1"], f["b1"] = w1, b1
        f.attrs["spec"] = json.dumps({
            "filters": filters, "pools": pools, "mfp": False,
            "activation": ["relu", "relu"], "n_lab": 2})
    import parity_vs_reference
    assert parity_vs_reference.main([g, "--cpu", "--tol", "1e-5"]) == 0


def test_scan_model_save_load_roundtrip(rng, tmp_path):
    """Recurrent (ScanN/GRU) models serialise: node-spec replay must
    reconstruct scan wiring (node-list ctor args) bit-exactly."""
    T, B, F, H = 4, 2, 3, 5
    seq = nm.Input([T, B, F], "s,b,f", name="seq")
    x_t = nm.Input([B, F], "b,f", name="x_t")
    h0 = nm.InitialState_like(x_t, override_f=H, name="h0")
    gru = nm.GRU(x_t, h0, n_f=H, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    out = nm.Perceptron(scan, 2, activation_func="lin", name="readout")
    m = model_manager.getmodel()
    m.designate_nodes(input_node=seq, prediction_node=out)
    vseq = rng.randn(T, B, F).astype(np.float32)
    p1 = np.asarray(m.predict(vseq))
    f = str(tmp_path / "scan.mdl")
    m.save(f)
    m2 = nm.modelload(f)
    assert isinstance(m2.nodes["scan"], nm.ScanN)
    np.testing.assert_array_equal(p1, np.asarray(m2.predict(vseq)))


def test_train_plain_then_infer_mfp(rng, tmp_path):
    """THE reference deployment workflow: train without MFP, rebuild the
    model with MFP active for dense inference; outputs at the strided
    positions must match the plain model's predictions."""
    from elektronn2_tpu.utils import cnncalculator

    # plain training model
    calc_p = cnncalculator([3, 3], [2, 1], desired_patch_size=16, mfp=False,
                           ndim=2)
    n_p = calc_p.input
    inp = nm.Input([1, 1, *n_p], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, name="c1")
    c2 = nm.Conv(c1, 4, 3, 1, name="c2")
    probs = nm.Softmax(nm.Conv(c2, 2, 1, 1, activation_func="lin",
                               name="cls"), name="probs")
    tgt = nm.Input([1, *probs.shape.spatial_shape], "b,x,y", dtype="int32",
                   name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt("Adam", lr=2e-3)
    for _ in range(5):
        x = rng.rand(1, 1, *n_p).astype(np.float32)
        y = (rng.rand(1, *probs.shape.spatial_shape) > 0.5).astype(np.int32)
        m.trainingstep(x, y)

    # rebuild with MFP active at an MFP-valid patch size
    calc_m = cnncalculator([3, 3], [2, 1], desired_patch_size=17, mfp=True,
                           ndim=2)
    m_inf = nm.rebuild_model(m, override_mfp_to_active=True,
                             imposed_patch_size=list(calc_m.input))
    # weights carried over
    np.testing.assert_array_equal(np.asarray(m.params["c1"]["w"]),
                                  np.asarray(m_inf.params["c1"]["w"]))
    vol = rng.rand(1, 30, 30).astype(np.float32)
    dense = m_inf.predict_dense(vol)

    # oracle: plain model applied at every stride-2 shift
    S = 2
    npn = n_p[0]
    for sx in range(S):
        for sy in range(S):
            tile = vol[:, sx:sx + npn, sy:sy + npn]
            if tile.shape != (1, npn, npn):
                continue
            ref = np.asarray(m.predict(tile[None]))[0]
            got = dense[:, sx::S, sy::S][:, :ref.shape[1], :ref.shape[2]]
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_unet_dense_prediction_no_seams(rng):
    """U-Net (UpConv + FaithlessMerge) dense prediction: tiled sweep output
    equals direct per-tile prediction at matching offsets (no tile seams)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location("unet3d",
                                                  "examples/unet3d.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    m = mod.create_model()

    V = (20, 48, 48)
    vol = rng.rand(1, *V).astype(np.float32)
    dense = m.predict_dense(vol)
    patch = mod.PATCH
    # direct predictions at several origins must appear in the dense map
    # at the corresponding offsets
    for origin in [(0, 0, 0), (2, 8, 8), (4, 16, 4)]:
        tile = vol[:, origin[0]:origin[0] + patch[0],
                   origin[1]:origin[1] + patch[1],
                   origin[2]:origin[2] + patch[2]]
        ref = np.asarray(m.predict(tile[None]))[0]
        got = dense[:,
                    origin[0]:origin[0] + ref.shape[1],
                    origin[1]:origin[1] + ref.shape[2],
                    origin[2]:origin[2] + ref.shape[3]]
        n = [min(a, b) for a, b in zip(got.shape, ref.shape)]
        np.testing.assert_allclose(
            got[:n[0], :n[1], :n[2], :n[3]],
            ref[:n[0], :n[1], :n[2], :n[3]], rtol=1e-4, atol=1e-5)


def test_knossos_sweep_sharded_matches_single(rng, tmp_path):
    """sweep_knossos(mesh=...) — slabs z-sharded over the mesh — must equal
    the single-chip sweep exactly."""
    from test_data import write_knossos
    from elektronn2_tpu.data import KnossosArray
    from elektronn2_tpu.parallel import make_mesh

    inp = nm.Input([1, 1, 9, 17, 17], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)

    vol = (rng.rand(24, 32, 32) * 255).astype(np.uint8)
    path = write_knossos(tmp_path, vol, cube_edge=8)
    ka = KnossosArray(path, cube_edge=8)
    plain = m.sweep_knossos(ka, step=[12, 16, 16])
    sharded = m.sweep_knossos(ka, step=[12, 16, 16],
                              mesh=make_mesh({"space": 8}))
    np.testing.assert_allclose(sharded, plain, atol=1e-5)


def test_neuro2d_example_config(tmp_path):
    """The 2D example config trains with decreasing loss and predicts
    densely (2D path of the config surface)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "neuro2d_cfg", "examples/neuro2d.py")
    cfg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cfg)
    from elektronn2_tpu.training.trainer import Trainer
    tr = Trainer(model=cfg.create_model(),
                 data=__import__("elektronn2_tpu.data", fromlist=["x"]
                                 ).DeviceBatchAugmenter(
                     **cfg.data_init_kwargs),
                 batch_size=4, n_steps=30, history_freq=0, save_freq=0,
                 n_workers=0, save_path=str(tmp_path), save_name="n2d",
                 data_batch_args={"warp": 0.3})
    hist = tr.run()
    losses = [row[2] for row in hist.timeline]
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # 2D dense prediction over a larger image
    img = np.random.RandomState(0).rand(1, 128, 128).astype(np.float32)
    out = tr.model.predict_dense(img, pad_raw=True)
    assert out.shape[1:] == (128, 128)
    assert np.isfinite(np.asarray(out)).all()


def test_malis3d_example_config(tmp_path):
    """The MALIS affinity example: trains finite and decreasing through
    the config surface (structured-loss workload end-to-end)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "malis3d_cfg", "examples/malis3d.py")
    cfg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cfg)
    from elektronn2_tpu.training.trainer import Trainer
    from elektronn2_tpu.data import BatchCreatorImage
    m = cfg.create_model()
    data = BatchCreatorImage(**cfg.data_init_kwargs)
    data.link_model_geometry(m)
    tr = Trainer(model=m, data=data, batch_size=1, n_steps=40,
                 history_freq=0, save_freq=0, n_workers=0,
                 save_path=str(tmp_path), save_name="m3d",
                 optimiser_params={"lr": 3e-3},
                 data_batch_args={"warp": 0.0})
    hist = tr.run()
    losses = np.asarray([row[2] for row in hist.timeline])
    assert np.isfinite(losses).all()
    assert losses[-10:].mean() < losses[:10].mean()


def test_knossos_sweep_dp_sp_batched_matches_single(rng, tmp_path):
    """sweep_knossos(mesh=DPxSP, slab_batch=2): slab batch sharded over
    'data', z over 'space' — must equal the single-chip sweep exactly;
    a mesh without a 'data' axis degrades to per-slab sharded sweeps."""
    from test_data import write_knossos
    from elektronn2_tpu.data import KnossosArray
    from elektronn2_tpu.parallel import make_mesh

    inp = nm.Input([1, 1, 9, 17, 17], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)

    vol = (rng.rand(24, 32, 32) * 255).astype(np.uint8)
    path = write_knossos(tmp_path, vol, cube_edge=8)
    ka = KnossosArray(path, cube_edge=8)
    plain = m.sweep_knossos(ka, step=[12, 16, 16])
    mesh = make_mesh({"data": 2, "space": 4})
    both = m.sweep_knossos(ka, step=[12, 16, 16], mesh=mesh, slab_batch=2)
    np.testing.assert_allclose(both, plain, atol=1e-5)
    # non-multiple slab batch is rejected with a named error
    with pytest.raises(ValueError, match="multiple of mesh axis"):
        m.sweep_knossos(ka, step=[12, 16, 16], mesh=mesh, slab_batch=3)
    # a mesh without the batch axis degrades (still exact)
    sp_only = m.sweep_knossos(ka, step=[12, 16, 16],
                              mesh=make_mesh({"space": 8}), slab_batch=2)
    np.testing.assert_allclose(sp_only, plain, atol=1e-5)


def test_serve_knossos_example(tmp_path):
    """The serving example runs end-to-end (synth dataset → bf16 slab-
    batched sweep → KNOSSOS output) and writes loadable uint8 maps."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "serve_knossos_example", "examples/serve_knossos.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mdl, kdir, out_dir = mod._demo_setup(str(tmp_path / "demo"))
    assert mod.main([mdl, kdir, out_dir]) == 0
    from elektronn2_tpu.data import KnossosArray
    ka = KnossosArray(os.path.join(out_dir, "c0"))
    got = np.asarray(ka[0:16, 0:32, 0:32])
    assert got.dtype == np.uint8 and got.shape == (16, 32, 32)


def test_sweep_serving_equivalence_fuzz(rng):
    """Fuzz the serving stack: random small encoder geometry x random
    region/step/slab_batch — sweep_knossos must equal the whole-volume
    device sweep on every draw (stage/write_back arithmetic, partial
    chunks, region offsets)."""
    import jax.numpy as jnp
    for draw in range(3):
        r = np.random.RandomState(100 + draw)
        model_manager.reset(seed=int(r.randint(1000)))
        fz = int(r.choice([1, 3]))
        pool = (1, 2, 2) if r.rand() < 0.5 else (1, 1, 1)
        inp = nm.Input([1, 1, 9, 17, 17], "b,f,z,x,y", name="raw")
        c1 = nm.Conv(inp, int(r.choice([3, 5])), (fz, 3, 3), pool,
                     mfp=pool != (1, 1, 1), name="c1")
        probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
        m = model_manager.getmodel()
        m.designate_nodes(input_node=inp, prediction_node=probs)

        Z, X, Y = 20 + int(r.randint(8)), 24 + int(r.randint(12)), 32
        vol = r.rand(Z, X, Y).astype(np.float32)
        ref = np.asarray(m.predict_dense_device(jnp.asarray(vol[None]),
                                                pad_raw=True))
        step = [int(r.randint(8, 14)), int(r.randint(12, 20)), 16]
        sb = int(r.choice([1, 2, 3]))
        got = m.sweep_knossos(vol, step=step, slab_batch=sb)
        np.testing.assert_allclose(got, ref, atol=1e-5,
                                   err_msg=f"draw {draw}: step={step} "
                                           f"slab_batch={sb}")
        # region-restricted draw
        z0 = int(r.randint(0, 6))
        x0 = int(r.randint(0, 6))
        reg = [(z0, Z), (x0, X), (0, Y)]
        got_r = m.sweep_knossos(vol, region=reg, step=step, slab_batch=sb)
        np.testing.assert_allclose(got_r, ref[:, z0:, x0:, :], atol=1e-5,
                                   err_msg=f"draw {draw} region")


def test_neuro3d_pod_example_config(tmp_path):
    """The pod config scales out from the CONFIG surface (mesh_axes):
    trains with decreasing loss on the 8-device virtual mesh."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "neuro3d_pod_cfg", "examples/neuro3d_pod.py")
    cfg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cfg)
    from elektronn2_tpu.training.trainer import Trainer
    import elektronn2_tpu.data as dmod
    tr = Trainer(model=cfg.create_model(),
                 data=dmod.DeviceBatchAugmenter(**cfg.data_init_kwargs),
                 batch_size=cfg.batch_size, n_steps=64, history_freq=0,
                 save_freq=0, n_workers=0, save_path=str(tmp_path),
                 save_name="pod", mesh_axes=cfg.mesh_axes,
                 fused_steps=8,     # DP mesh + fused chunks compose
                 optimiser="Adam", optimiser_params={"lr": 2e-3},
                 data_batch_args={"warp": 0.0, "flip": False})
    assert tr.model._mesh is not None          # mesh_axes was applied
    hist = tr.run()
    losses = [row[2] for row in hist.timeline]
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_tracing3d_example_config(tmp_path, monkeypatch):
    """The tracing example config end-to-end through the elektronn2-train
    CLI (TracingTrainer via trainer_class), then the post-training
    rollout_demo: batched device rollout + KNOSSOS .k.zip export that
    round-trips through SkeletonMFK.load."""
    monkeypatch.chdir(tmp_path)
    from elektronn2_tpu.scripts.train import main
    cfg_path = os.path.join(os.path.dirname(__file__), "..", "examples",
                            "tracing3d.py")
    assert main([cfg_path, "--cpu", "--n-steps", "8",
                 "--save-path", str(tmp_path)]) in (0, None)

    import importlib.util
    spec = importlib.util.spec_from_file_location("tracing3d_cfg", cfg_path)
    cfg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cfg)
    m = cfg.create_model()
    kz = str(tmp_path / "demo.k.zip")
    traces = cfg.rollout_demo(m, n_agents=3, max_steps=5, kzip_path=kz)
    assert len(traces) == 3
    assert all(len(t.coords) >= 1 for t in traces)
    from elektronn2_tpu.data.skeleton import SkeletonMFK
    sk = SkeletonMFK.load(kz)
    assert len(sk.positions) >= 3


def test_neuro3d_fast_example_config(tmp_path, monkeypatch):
    """The max-throughput flagship config (device-sampled data + fused
    multi-step training + bf16 + resume) through the train CLI, twice —
    the second run exercises resume=True pickup of -LAST.mdl."""
    monkeypatch.chdir(tmp_path)
    from elektronn2_tpu.scripts.train import main
    cfg_path = os.path.join(os.path.dirname(__file__), "..", "examples",
                            "neuro3d_fast.py")
    assert main([cfg_path, "--cpu", "--n-steps", "6",
                 "--save-path", str(tmp_path)]) in (0, None)
    assert (tmp_path / "neuro3d_fast-LAST.mdl").exists()
    assert main([cfg_path, "--cpu", "--n-steps", "4",
                 "--save-path", str(tmp_path)]) in (0, None)


# ------------------------------------------------ deployment-loop chains

def test_knossos_dense_deployment_chain(rng, tmp_path):
    """VERDICT r2 item 8: the FULL dense deployment loop as one test —
    generated KNOSSOS dataset on disk → ``sweep_knossos`` over a lazily
    loaded ``KnossosArray`` → ``save_knossos`` of the uint8 prediction
    maps → reload → byte equality against ``predict_dense`` of the same
    raw volume (SURVEY §4.B deployment workflow)."""
    from elektronn2_tpu.data import KnossosArray
    from elektronn2_tpu.data.knossos_array import save_knossos

    raw_u8 = (rng.rand(12, 24, 24) * 255).astype(np.uint8)
    in_ds = str(tmp_path / "inds")
    save_knossos(raw_u8, in_ds, exp_name="inds", cube_edge=8)

    inp = nm.Input([1, 1, 5, 9, 9], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, (1, 3, 3), (1, 2, 2), mfp=True, name="c1")
    c2 = nm.Conv(c1, 2, (3, 3, 3), 1, activation_func="lin", name="c2")
    probs = nm.Softmax(c2, name="probs")
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)

    ka = KnossosArray(in_ds, cube_edge=8)
    out = m.sweep_knossos(ka, step=[8, 12, 12])
    assert out.shape == (2, 12, 24, 24)

    # write each channel as a KNOSSOS uint8 dataset, reload, compare
    u8 = np.clip(out * 255.0, 0, 255).astype(np.uint8)
    for c in range(2):
        out_ds = str(tmp_path / f"pred_c{c}")
        save_knossos(u8[c], out_ds, exp_name=f"pred_c{c}", cube_edge=8)
        back = KnossosArray(out_ds, cube_edge=8)[:, :, :]
        np.testing.assert_array_equal(back, u8[c])

    # voxel equality vs predict_dense on the raw volume (the sweep stages
    # uint8 cubes; predict_dense normalises uint8 to [0,1] the same way)
    ref = m.predict_dense(raw_u8[None], pad_raw=True)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_tracing_deployment_chain_cli(rng, tmp_path):
    """VERDICT r2 item 8: the tracing deployment loop in ONE CLI
    invocation — saved recurrent tracing model + volume →
    ``elektronn2-predict --trace`` (fused DeviceTracer rollout) →
    ``.k.zip`` → ``SkeletonMFK.load`` round-trip, coordinates equal to a
    direct ``DeviceTracer`` rollout (SURVEY §3.2 ``trace_to_kzip``)."""
    from elektronn2_tpu.data.skeleton import SkeletonMFK
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    from elektronn2_tpu.scripts.predict import main as predict_main
    from elektronn2_tpu.utils.basic import h5save

    T, B = 2, 1
    seq = nm.Input([T, B, 1, 5, 5, 5], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([B, 1, 5, 5, 5], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, 8, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=8, name="h0")
    gru = nm.GRU(enc, h0, n_f=8, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    step_v = nm.Perceptron(scan, 3, activation_func="lin", name="step")
    tgt = nm.Input([T, B, 3], "s,b,f", name="target")
    loss = nm.AggregateLoss(nm.SquaredLoss(step_v, tgt))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=seq, target_node=tgt, loss_node=loss,
                      prediction_node=step_v)
    mdl = str(tmp_path / "tracer.mdl")
    m.save(mdl)

    vol = rng.rand(16, 16, 16).astype(np.float32)
    h5f = str(tmp_path / "vol.h5")
    h5save({"raw": vol}, h5f)

    kzip = str(tmp_path / "trace.k.zip")
    rc = predict_main([mdl, h5f + ":raw", "--cpu", "--trace",
                       "8,8,8;9.5,8.5,8", "--trace-steps", "6",
                       "-o", kzip])
    assert rc == 0 and os.path.exists(kzip)

    # reference rollout through the API on the SAME saved model
    from elektronn2_tpu.neuromancer.model import modelload
    m2 = modelload(mdl)
    tracer = DeviceTracer(m2, vol[None], max_steps=6)
    traces = tracer.trace_batch(np.asarray([[8, 8, 8], [9.5, 8.5, 8]],
                                           np.float32))

    sk = SkeletonMFK.load(kzip)
    want = np.concatenate([t.coords for t in traces], axis=0)
    assert len(sk.positions) == len(want)
    # lexicographic ROW sort: per-column sorting would destroy the
    # (z, x, y) association and could false-pass scrambled coordinates
    def rowsort(a):
        return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]
    np.testing.assert_allclose(rowsort(sk.positions), rowsort(want),
                               atol=1e-3)
    # edges chain consecutive nodes within each trace
    assert len(sk.edges) == sum(max(len(t) - 1, 0) for t in traces)


def test_trace_cli_normalises_uint8(rng, tmp_path):
    """r3 review: --trace on a uint8 volume must apply the same [0,1]
    normalisation as every dense-serving path — the tracer otherwise
    sees 0-255 inputs and traces garbage."""
    from elektronn2_tpu.data.skeleton import SkeletonMFK
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    from elektronn2_tpu.scripts.predict import main as predict_main
    from elektronn2_tpu.utils.basic import h5save

    inp = nm.Input([1, 1, 5, 5, 5], "b,f,z,x,y", name="x")
    step = nm.Perceptron(inp, 3, activation_func="lin", flatten=True,
                         name="step")
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=step)
    mdl = str(tmp_path / "t.mdl")
    m.save(mdl)
    vol_u8 = (rng.rand(16, 16, 16) * 255).astype(np.uint8)
    h5f = str(tmp_path / "v.h5")
    h5save({"raw": vol_u8}, h5f)
    kz = str(tmp_path / "t.k.zip")
    rc = predict_main([mdl, h5f + ":raw", "--cpu", "--trace", "8,8,8",
                       "--trace-steps", "4", "-o", kz])
    assert rc == 0
    sk = SkeletonMFK.load(kz)
    ref = DeviceTracer(m, vol_u8[None].astype(np.float32) / 255.0,
                       max_steps=4).trace([8, 8, 8])
    np.testing.assert_allclose(sk.positions, ref.coords, atol=1e-3)


def test_node_predict_dense_requires_containing_model(rng):
    """r3 review: a node created AFTER every model on its graph must get
    a clear error from Node.predict_dense, not a KeyError deep inside
    the trace (last_model filters on the node index)."""
    inp = nm.Input([1, 1, 8, 8], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 2, 3, 1, name="c1")
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp,
                      prediction_node=nm.Softmax(c1, name="p1"))
    late = nm.Conv(c1, 2, 1, 1, name="late")       # after the model
    with pytest.raises(RuntimeError, match="late"):
        late.predict_dense(rng.rand(1, 12, 12).astype(np.float32))
