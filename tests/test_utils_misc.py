"""Tests for the utility tail: locking, legacy import, plotting (Agg),
d3viz, traindata, profile CLI, console completions."""

import os
import threading
import time

import numpy as np
import pytest


def test_file_lock(tmp_path):
    from elektronn2_tpu.utils.locking import FileLock, FileLockException
    target = str(tmp_path / "file.bin")
    with FileLock(target, timeout=1):
        assert os.path.exists(target + ".lock")
        with pytest.raises(FileLockException):
            FileLock(target, timeout=0.2).acquire()
    assert not os.path.exists(target + ".lock")


def test_file_lock_concurrent(tmp_path):
    from elektronn2_tpu.utils.locking import FileLock
    target = str(tmp_path / "c.bin")
    order = []

    def worker(i):
        with FileLock(target, timeout=5):
            order.append(("in", i))
            time.sleep(0.05)
            order.append(("out", i))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    # critical sections never interleave
    for k in range(0, 6, 2):
        assert order[k][0] == "in" and order[k + 1][0] == "out"
        assert order[k][1] == order[k + 1][1]


def test_legacy_param_import(tmp_path, rng):
    import pickle
    import jax
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.utils.legacy import load_legacy_params, import_params

    nm.model_manager.reset(seed=0)
    inp = nm.Input([1, 1, 9, 9], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 1, name="c1")
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=c1)

    legacy_w = rng.randn(4, 1, 3, 3).astype(np.float32)
    with open(tmp_path / "old.pkl", "wb") as f:
        pickle.dump({"c1": {"w": legacy_w, "b": np.zeros(4, np.float32)}}, f)
    arrays = load_legacy_params(str(tmp_path / "old.pkl"))
    import_params(m, arrays)
    np.testing.assert_array_equal(np.asarray(m.params["c1"]["w"]), legacy_w)


def test_plotting_outputs(tmp_path, rng):
    from elektronn2_tpu.utils.plotting import (scroll_plot, embedfilters,
                                               plot_hist, sma,
                                               save_preview_images)
    vol = rng.rand(6, 16, 16).astype(np.float32)
    p = scroll_plot(vol, str(tmp_path / "scroll.png"), n_slices=3)
    assert os.path.exists(p)
    canvas = embedfilters(rng.randn(4, 2, 3, 3).astype(np.float32),
                          str(tmp_path / "filters.png"))
    assert canvas.shape == (4 * 4, 2 * 4)
    plot_hist(rng.randn(100), str(tmp_path / "hist.png"))
    assert len(sma(np.arange(100), 10)) == 91
    save_preview_images(rng.rand(2, 4, 8, 8).astype(np.float32),
                        str(tmp_path / "prev"))
    assert os.path.exists(tmp_path / "prev-c0.png")


def test_d3viz(tmp_path):
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.utils.d3viz import visualise_model
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 9, 9], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 1, name="c1")
    probs = nm.Softmax(c1)
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    path = visualise_model(m, str(tmp_path / "graph.html"))
    html = open(path).read()
    assert "raw" in html and "Softmax" in html and "prediction" in html


def test_traindata_classes():
    from elektronn2_tpu.data.traindata import MNISTData, PianoData
    d = MNISTData()
    x, y = d.getbatch(32)
    assert x.shape == (32, 784) and y.shape == (32,)
    xv, yv = d.getbatch(16, source="valid")
    assert len(xv) == 16
    p = PianoData()
    x, y = p.getbatch(8)
    assert x.shape[0] == 8 and y.shape == (8, 88)


def test_mlp_example_trains(tmp_path):
    from elektronn2_tpu.scripts.train import main
    main(["examples/mlp_mnist.py", "--cpu", "--n-steps", "30",
          "--save-path", str(tmp_path)])
    assert any(f.endswith(".mdl") for f in os.listdir(tmp_path))


def test_profile_cli(tmp_path, rng):
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 16, 16], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 1, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    mdl = str(tmp_path / "m.mdl")
    m.save(mdl)
    from elektronn2_tpu.scripts.profile import main
    out = str(tmp_path / "prof.csv")
    main([mdl, "--sizes", "16,24", "--out", out, "--cpu"])
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 3  # header + 2 sizes


def test_console_completer():
    from elektronn2_tpu.utils.ptk_completions import ConsoleCompleter
    c = ConsoleCompleter()
    assert c.complete("p", 0) in ("pause", "preview")
    assert c.complete("lr", 0) == "lr"
    assert c.complete("zz", 0) is None


def test_h5_and_pickle_io(tmp_path, rng):
    from elektronn2_tpu.utils.basic import (h5save, h5load, picklesave,
                                            pickleload, AccumulationArray,
                                            DynamicKDT)
    a = rng.rand(4, 5).astype(np.float32)
    h5save({"x": a}, str(tmp_path / "t.h5"))
    np.testing.assert_array_equal(h5load(str(tmp_path / "t.h5"), "x"), a)
    np.testing.assert_array_equal(h5load(str(tmp_path / "t.h5")), a)
    picklesave({"a": 1}, str(tmp_path / "t.pkl"))
    assert pickleload(str(tmp_path / "t.pkl")) == {"a": 1}

    acc = AccumulationArray(right_shape=(2,), n_init=2)
    for i in range(5):
        acc.append([i, i])
    assert len(acc) == 5
    np.testing.assert_array_equal(acc.data[:, 0], np.arange(5))

    kdt = DynamicKDT([[0, 0, 0], [1, 1, 1]])
    kdt.append([5, 5, 5])
    d, pts, idx = kdt.get_knn([4.9, 5, 5])
    assert idx == 2


def test_predict_cli(tmp_path, rng):
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.utils.basic import h5save, h5load
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 15, 15], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    mdl = str(tmp_path / "m.mdl")
    m.save(mdl)
    vol = rng.rand(1, 30, 30).astype(np.float32)
    h5save({"raw": vol}, str(tmp_path / "in.h5"))
    from elektronn2_tpu.scripts.predict import main
    out = str(tmp_path / "out.h5")
    assert main([mdl, str(tmp_path / "in.h5") + ":raw", "-o", out,
                 "--cpu"]) == 0
    pred = h5load(out, "prediction")
    assert pred.shape == (2, 30, 30)
    # knossos output path
    kdir = str(tmp_path / "kout")
    assert main([mdl, str(tmp_path / "in.h5") + ":raw",
                 "-o", str(tmp_path / "out2.h5"),
                 "--knossos-out", kdir, "--cpu"]) == 0
    assert os.path.exists(os.path.join(kdir, "c0", "knossos.conf"))


def test_console_ipython_command(monkeypatch, tmp_path):
    """The 'ipython' console command embeds a shell with trainer/model in
    scope and restores the pause state (shell mocked)."""
    from elektronn2_tpu.training.trainutils import ConsoleControl

    class FakeModel:
        def paramstats(self):
            return {}

    class FakeTrainer:
        model = FakeModel()

    cc = ConsoleControl.__new__(ConsoleControl)
    cc.trainer = FakeTrainer()
    cc.paused = False
    cc.quit = False
    seen = {}

    import IPython
    monkeypatch.setattr(IPython, "embed",
                        lambda user_ns=None: seen.update(user_ns or {}))
    cc._handle("ipython")
    assert "trainer" in seen and "model" in seen
    assert cc.paused is False          # restored


def test_predict_cli_knossos_slab_batch(tmp_path, rng):
    """KNOSSOS-input sweep through the CLI with --slab-batch/--step
    matches the device sweep."""
    import jax.numpy as jnp
    import elektronn2_tpu.neuromancer as nm
    from test_data import write_knossos
    from elektronn2_tpu.utils.basic import h5load
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 9, 17, 17], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    mdl = str(tmp_path / "m3.mdl")
    m.save(mdl)
    vol = (rng.rand(24, 32, 32) * 255).astype(np.uint8)
    kdir = write_knossos(tmp_path, vol, cube_edge=8)
    from elektronn2_tpu.scripts.predict import main
    out = str(tmp_path / "out3.h5")
    assert main([mdl, kdir, "-o", out, "--cpu",
                 "--slab-batch", "2", "--step", "12,16,16"]) == 0
    pred = h5load(out, "prediction")
    ref = np.asarray(m.predict_dense_device(
        jnp.asarray(vol[None].astype(np.float32) / 255.0), pad_raw=True))
    np.testing.assert_allclose(pred, ref, atol=1e-5)


def test_predict_cli_mesh_sweep(tmp_path, rng):
    """--mesh 'data=2,space=4' through the CLI: DP×SP batched sweep
    matches the single-device sweep on the virtual 8-device mesh."""
    import jax.numpy as jnp
    import elektronn2_tpu.neuromancer as nm
    from test_data import write_knossos
    from elektronn2_tpu.utils.basic import h5load
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 9, 17, 17], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    mdl = str(tmp_path / "mm.mdl")
    m.save(mdl)
    vol = (rng.rand(24, 32, 32) * 255).astype(np.uint8)
    kdir = write_knossos(tmp_path, vol, cube_edge=8)
    from elektronn2_tpu.scripts.predict import main
    out = str(tmp_path / "outm.h5")
    assert main([mdl, kdir, "-o", out, "--cpu",
                 "--mesh", "data=2,space=4", "--slab-batch", "2",
                 "--step", "12,16,16"]) == 0
    pred = h5load(out, "prediction")
    ref = np.asarray(m.predict_dense_device(
        jnp.asarray(vol[None].astype(np.float32) / 255.0), pad_raw=True))
    np.testing.assert_allclose(pred, ref, atol=1e-5)


def test_predict_cli_tune_sweep(tmp_path, rng):
    """--tune autotunes the serving config on device and the sweep still
    matches the untuned single-device reference (f32 or bounded bf16)."""
    import jax.numpy as jnp
    import elektronn2_tpu.neuromancer as nm
    from test_data import write_knossos
    from elektronn2_tpu.utils.basic import h5load
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 9, 17, 17], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    mdl = str(tmp_path / "mt.mdl")
    m.save(mdl)
    vol = (rng.rand(24, 32, 32) * 255).astype(np.uint8)
    kdir = write_knossos(tmp_path, vol, cube_edge=8)
    from elektronn2_tpu.scripts.predict import main
    out = str(tmp_path / "outt.h5")
    assert main([mdl, kdir, "-o", out, "--cpu", "--tune",
                 "--step", "12,16,16"]) == 0
    pred = h5load(out, "prediction")
    ref = np.asarray(m.predict_dense_device(
        jnp.asarray(vol[None].astype(np.float32) / 255.0), pad_raw=True))
    assert float(np.abs(pred - ref).max()) < 0.05   # bf16 may win the tune


def test_api_reference_current():
    """docs/api_reference.md is generated from live docstrings — fail when
    an API change forgot to regenerate it."""
    import importlib.util
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_api_reference",
        os.path.join(root, "scripts", "gen_api_reference.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open(os.path.join(root, "docs", "api_reference.md")) as f:
        assert f.read() == mod.generate(), (
            "docs/api_reference.md is stale — run "
            "python scripts/gen_api_reference.py")


def test_predict_cli_int8_sweep(tmp_path, rng):
    """--int8 quantized serving through the CLI: bounded deviation and
    matching argmax vs the f32 sweep."""
    import jax.numpy as jnp
    import elektronn2_tpu.neuromancer as nm
    from test_data import write_knossos
    from elektronn2_tpu.utils.basic import h5load
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 9, 17, 17], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 2, mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    mdl = str(tmp_path / "mq.mdl")
    m.save(mdl)
    vol = (rng.rand(24, 32, 32) * 255).astype(np.uint8)
    kdir = write_knossos(tmp_path, vol, cube_edge=8)
    from elektronn2_tpu.scripts.predict import main
    out = str(tmp_path / "outq.h5")
    assert main([mdl, kdir, "-o", out, "--cpu", "--int8",
                 "--step", "12,16,16"]) == 0
    pred = h5load(out, "prediction")
    ref = np.asarray(m.predict_dense_device(
        jnp.asarray(vol[None].astype(np.float32) / 255.0), pad_raw=True))
    assert float(np.abs(pred - ref).max()) < 0.1
    assert (pred.argmax(0) == ref.argmax(0)).mean() > 0.97
    with pytest.raises(SystemExit):
        main([mdl, kdir, "--cpu", "--int8", "--bf16"])


def test_predict_cli_convdense_knobs_and_tune(tmp_path, rng):
    """--convdense d2s,zfold on a decoder model: batched sweep matches the
    default-lowering reference exactly; --tune routes decoder graphs to
    the conv-dense tuner leg; bad knob names error."""
    import jax.numpy as jnp
    import elektronn2_tpu.neuromancer as nm
    from test_data import write_knossos
    from elektronn2_tpu.utils.basic import h5load
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 8, 16, 16], "b,f,z,x,y", name="raw")
    e0 = nm.Conv(inp, 4, (1, 3, 3), (1, 1, 1), name="e0")
    e1 = nm.Conv(e0, 6, (3, 3, 3), (1, 2, 2), name="e1")
    up = nm.UpConv(e1, 4, (1, 2, 2), activation_func="relu", name="up")
    mg = nm.FaithlessMerge(up, e0, name="mg")
    probs = nm.Softmax(nm.Conv(mg, 2, 1, 1, activation_func="lin"))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    mdl = str(tmp_path / "mu.mdl")
    m.save(mdl)
    vol = (rng.rand(16, 24, 24) * 255).astype(np.uint8)
    kdir = write_knossos(tmp_path, vol, cube_edge=8)
    from elektronn2_tpu.scripts.predict import main
    ref = np.asarray(m.predict_dense_device(
        jnp.asarray(vol[None].astype(np.float32) / 255.0), pad_raw=True))
    out = str(tmp_path / "outu.h5")
    assert main([mdl, kdir, "-o", out, "--cpu",
                 "--convdense", "d2s,zfold", "--slab-batch", "2",
                 "--step", "8,12,12"]) == 0
    np.testing.assert_allclose(h5load(out, "prediction"), ref, atol=1e-5)
    out2 = str(tmp_path / "outu2.h5")
    assert main([mdl, kdir, "-o", out2, "--cpu", "--tune",
                 "--step", "8,12,12"]) == 0
    np.testing.assert_allclose(h5load(out2, "prediction"), ref, atol=1e-5)
    with pytest.raises(SystemExit):
        main([mdl, kdir, "--cpu", "--convdense", "bogus"])


def test_legacy_import_token_name_matching(tmp_path):
    """Legacy name matching is whole-token: 'w' must not match inside
    'gamma_weights' (substring matching assigned the wrong same-shaped
    array and suppressed the shape-only warning)."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.utils.legacy import import_params
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 12, 12], "b,f,x,y", name="raw")
    c = nm.Conv(inp, 4, 3, 1, name="conv")
    probs = nm.Softmax(nm.Conv(c, 2, 1, 1, activation_func="lin"))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    w_shape = np.shape(m.params["conv"]["w"])
    rngl = np.random.RandomState(0)
    right = rngl.randn(*w_shape).astype(np.float32)
    decoy = rngl.randn(*w_shape).astype(np.float32)
    arrays = {"gamma_weights": decoy, "conv_w": right}
    import_params(m, arrays)
    np.testing.assert_array_equal(np.asarray(m.params["conv"]["w"]), right)


def test_every_documented_config_key_is_accepted():
    """docs/config_reference.md keys must all survive ExperimentConfig's
    EXPERIMENT_KEYS filter — mesh_axes was documented + consumed by the
    Trainer but silently DROPPED on the elektronn2-train path (the pod
    example trained single-device with no warning; review r2 s5)."""
    import re
    from elektronn2_tpu.config import EXPERIMENT_KEYS
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    doc = open(os.path.join(root, "docs", "config_reference.md")).read()
    documented = set()
    for m in re.finditer(r"^\| `([a-z_]+)(?:\(\))?`(?: / `([a-z_]+)`)?",
                         doc, re.M):
        documented.add(m.group(1))
        if m.group(2):
            documented.add(m.group(2))
    documented -= {"create_model"}        # callable, not a filtered key
    missing = documented - set(EXPERIMENT_KEYS)
    assert not missing, f"documented config keys not accepted: {missing}"


def test_pod_config_mesh_axes_survives_cli_path(tmp_path):
    """The exec'd-config path (ExperimentConfig.from_file, what
    elektronn2-train uses) must deliver mesh_axes to the Trainer."""
    from elektronn2_tpu.config import ExperimentConfig
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exp = ExperimentConfig.from_file(
        os.path.join(root, "examples", "neuro3d_pod.py"))
    assert exp.as_dict().get("mesh_axes"), "mesh_axes dropped by the filter"


def test_unique_rows():
    from elektronn2_tpu.utils.basic import unique_rows
    a = np.array([[1, 2], [3, 4], [1, 2], [5, 6], [3, 4]])
    u = unique_rows(a)
    np.testing.assert_array_equal(u, [[1, 2], [3, 4], [5, 6]])
    with pytest.raises(ValueError):
        unique_rows(np.zeros(3))


def test_makeversiondir(tmp_path):
    from elektronn2_tpu.utils.basic import makeversiondir
    p1 = makeversiondir(str(tmp_path), "run")
    p2 = makeversiondir(str(tmp_path), "run")
    p3 = makeversiondir(str(tmp_path), "run")
    assert p1.endswith("run") and p2.endswith("run-v2") \
        and p3.endswith("run-v3")
    assert os.path.isdir(p1) and os.path.isdir(p2) and os.path.isdir(p3)


def test_import_variable_from_file(tmp_path):
    from elektronn2_tpu.utils.basic import import_variable_from_file
    f = tmp_path / "mod.py"
    f.write_text("x = 41\ndef create_model():\n    return x + 1\n")
    fn = import_variable_from_file(str(f), "create_model")
    assert fn() == 42
    with pytest.raises(AttributeError):
        import_variable_from_file(str(f), "nope")


def test_pretty_string_ops_and_free_cpus():
    from elektronn2_tpu.utils.basic import (pretty_string_ops,
                                            get_free_cpu_count)
    assert pretty_string_ops(123) == "123 Op"
    assert pretty_string_ops(1234567890) == "1.23 GOp"
    assert 1 <= get_free_cpu_count() <= (os.cpu_count() or 1)


def test_circular_buffer():
    from elektronn2_tpu.utils.basic import CircularBuffer
    cb = CircularBuffer(4)
    assert len(cb) == 0 and cb.mean() == 0.0
    for i in range(3):
        cb.append(float(i))
    np.testing.assert_allclose(cb.data, [0.0, 1.0, 2.0])
    for i in range(3, 7):
        cb.append(float(i))
    # holds the LAST 4, oldest → newest
    np.testing.assert_allclose(cb.data, [3.0, 4.0, 5.0, 6.0])
    assert cb.mean() == pytest.approx(4.5)
    assert len(cb) == 4


def test_new_plot_helpers(tmp_path):
    from elektronn2_tpu.utils.plotting import (my_quiver, plot_trainingtarget,
                                               plot_exectimes, plot_kde)
    rng = np.random.RandomState(0)
    p = my_quiver(rng.randn(8, 8), rng.randn(8, 8),
                  img=rng.rand(8, 8), c=rng.rand(8, 8),
                  path=str(tmp_path / "q.png"))
    assert os.path.getsize(p) > 0
    p = plot_trainingtarget(rng.rand(32, 32), rng.randint(0, 2, (12, 12)),
                            stride=2, path=str(tmp_path / "t.png"))
    assert os.path.getsize(p) > 0
    p = plot_exectimes({"conv1": 1.5, "conv2": 3.25, "softmax": 0.2},
                       path=str(tmp_path / "e.png"))
    assert os.path.getsize(p) > 0
    p = plot_kde(rng.randn(500), rng.randn(500), path=str(tmp_path / "k.png"))
    assert os.path.getsize(p) > 0
