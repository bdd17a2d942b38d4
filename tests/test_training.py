"""Training-layer tests: background feeding, schedules, the Trainer loop
end-to-end on the neuro3d config (integration test — SURVEY.md §5.b)."""

import os
import time

import numpy as np
import pytest

import elektronn2_tpu.neuromancer as nm
from elektronn2_tpu.neuromancer import model_manager
from elektronn2_tpu.training import (BackgroundProc, Schedule, Trainer,
                                     HistoryTracker, pretty_string_time)


@pytest.fixture(autouse=True)
def fresh_graph():
    model_manager.reset(seed=3)
    yield


def _produce(n):
    return np.random.rand(n)


@pytest.mark.parametrize("mode", ["thread", "process", "spawn"])
def test_background_proc_produces_and_shuts_down(mode):
    with BackgroundProc(_produce, n_proc=2, target_args=(4,),
                        mode=mode) as bg:
        items = [bg.get(timeout=20) for _ in range(6)]
    assert all(it.shape == (4,) for it in items)
    # forked workers must not produce identical batches (reseeded RNG):
    # with un-reseeded workers the 6 draws collapse into <= 3 distinct
    # values (two identical interleaved streams)
    distinct = {tuple(np.round(np.asarray(it), 6)) for it in items}
    assert len(distinct) >= 4


@pytest.mark.parametrize("mode", ["thread", "process", "spawn"])
def test_background_proc_propagates_errors(mode):
    bg = BackgroundProc(_boom, n_proc=1, mode=mode)
    with pytest.raises(RuntimeError):
        bg.get(timeout=10)
    bg.shutdown()


def _boom():
    raise ValueError("worker exploded")


def test_schedule_modes():
    class Obj:
        v = 1.0

    o = Obj()
    s = Schedule(dec=0.5, interval=10)
    s.bind_variable(obj=o, prop_name="v")
    for step in range(1, 21):
        s.update(step)
    assert abs(o.v - 0.25) < 1e-9

    o2 = Obj()
    s2 = Schedule(lindec=100)
    s2.bind_variable(obj=o2, prop_name="v")
    s2.update(50, n_steps=100)
    assert abs(o2.v - 0.5) < 1e-9

    o3 = Obj()
    s3 = Schedule(updates=[(5, 0.1), (10, 0.01)])
    s3.bind_variable(obj=o3, prop_name="v")
    s3.update(5)
    assert o3.v == 0.1
    s3.update(10)
    assert o3.v == 0.01


def test_schedule_updates_catch_up_on_resume():
    """A resumed run whose first update() lands past table entries applies
    the LATEST passed entry instead of silently skipping it (VERDICT r1
    #8: trainutils.py::Schedule resume semantics)."""
    class Obj:
        v = 1.0

    o = Obj()
    s = Schedule(updates=[(5, 0.1), (10, 0.01), (20, 0.001)])
    s.bind_variable(obj=o, prop_name="v")
    s.update(12)            # resume at step 12: jumped over 5 and 10
    assert o.v == 0.01      # latest passed entry fires, not both/none
    s.update(13)
    assert o.v == 0.01      # no re-fire
    s.update(20)
    assert o.v == 0.001     # exact match still fires


def test_schedule_binds_optimiser():
    from elektronn2_tpu.neuromancer.optimiser import Adam
    opt = Adam(lr=1.0)
    s = Schedule(dec=0.1, interval=1)
    s.bind_variable(obj=opt, prop_name="lr")
    s.update(1)
    assert abs(opt.hyperparams["lr"] - 0.1) < 1e-12


def test_history_tracker(tmp_path):
    h = HistoryTracker()
    for i in range(20):
        h.update_timeline(i, 1.0 / (i + 1))
    h.update_history(10, 0.5, 0.2, 0.6, 0.25)
    h.save(str(tmp_path / "test"))
    assert os.path.exists(tmp_path / "test.history.h5")
    assert h.loss_smooth < 1.0


def test_pretty_string_time():
    assert pretty_string_time(3700).startswith("1h")
    assert pretty_string_time(75).startswith("1m")
    assert pretty_string_time(5).endswith("s")


def test_trainer_end_to_end_neuro3d_config(tmp_path):
    """The stage-1 milestone: the neuro3d example config trains on CPU with
    decreasing loss through the full Trainer loop (background feeding,
    schedules, history, save)."""
    from elektronn2_tpu.config import ExperimentConfig
    cfg_path = os.path.join(os.path.dirname(__file__), "..", "examples",
                            "neuro3d.py")
    exp = ExperimentConfig.from_file(
        cfg_path, override={"n_steps": 12, "history_freq": 6,
                            "save_freq": 0, "save_path": str(tmp_path),
                            "n_workers": 2, "batch_size": 1})
    trainer = Trainer(exp)
    hist = trainer.run()
    tl = hist.timeline.data
    assert len(tl) == 12
    assert np.isfinite(tl[:, 2]).all()
    # model snapshot written on exit
    assert any(f.endswith(".mdl") for f in os.listdir(tmp_path))
    # loss must actually DROP on this easy synthetic task (a flat curve
    # means updates stopped flowing)
    assert tl[-1, 3] < tl[0, 3] * 0.98


def test_trainer_resume_from_snapshot(tmp_path):
    """Save → reload via model_load_path: step counter and optimiser state
    carry over (checkpoint/resume contract, SURVEY.md §6)."""
    rngs = np.random.RandomState(0)
    raws = [rngs.rand(1, 24, 24, 24).astype(np.float32)]
    labs = [(raws[0][0] > 0.5).astype(np.int16)]

    def create_model():
        model_manager.reset()
        inp = nm.Input([1, 1, 9, 9, 9], "b,f,z,x,y", name="raw")
        c = nm.Conv(inp, 4, 3, 1, name="c1")
        probs = nm.Softmax(nm.Conv(c, 2, 1, 1, activation_func="lin"))
        tgt = nm.Input([1, *probs.shape.spatial_shape], "b,z,x,y",
                       dtype="int32", name="target")
        loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                                  target_is_sparse=True))
        m = model_manager.getmodel()
        m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs)
        return m

    from elektronn2_tpu.data import BatchCreatorImage
    data = BatchCreatorImage(input_data=raws, target_data=labs)
    tr = Trainer(model=create_model(), data=data, n_steps=5,
                 save_path=str(tmp_path), save_name="resume_test",
                 history_freq=0, save_freq=0, n_workers=0)
    tr.run()
    mdl = os.path.join(tmp_path, "resume_test-LAST.mdl")
    assert os.path.exists(mdl)

    data2 = BatchCreatorImage(input_data=raws, target_data=labs)
    tr2 = Trainer(model_load_path=mdl, data=data2, n_steps=8,
                  save_path=str(tmp_path), save_name="resume_test2",
                  history_freq=0, save_freq=0, n_workers=0)
    assert tr2.step == 5  # resumed step counter
    tr2.run()
    assert tr2.step == 8


def test_history_html_report(tmp_path):
    h = HistoryTracker()
    for i in range(10):
        h.update_timeline(i, 1.0 / (i + 1))
    h.update_history(5, 0.5, 0.2, 0.6, 0.25)
    h.plot(str(tmp_path / "r"))
    p = h.html_report(str(tmp_path / "r"))
    html = open(p).read()
    assert "smoothed loss" in html and "data:image/png" in html


# ------------------------------------------------------- fused multi-step

def _fused_setup(rng):
    from scipy import ndimage
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer import model_manager
    from elektronn2_tpu.data import DeviceBatchAugmenter
    model_manager.reset(seed=21)
    raws = [ndimage.gaussian_filter(rng.randn(24, 40, 40), 2
                                    ).astype(np.float32)[None]]
    labs = [(ndimage.gaussian_filter(rng.randn(24, 40, 40), 4) > 0
             ).astype(np.int16)]
    inp = nm.Input([2, 1, 8, 16, 16], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 6, (3, 3, 3), (1, 2, 2), name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([2, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True)
    loss = nm.AggregateLoss(nll)
    err = nm.Errors(probs, tgt, target_is_sparse=True)
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs, error_node=err)
    m.set_opt("Adam", lr=1e-3)
    aug = DeviceBatchAugmenter(
        raws, labs, patch_size=(8, 16, 16),
        target_size=tuple(probs.shape.spatial_shape),
        target_strides=tuple(probs.shape.strides), warp_amount=0.5, seed=5)
    return m, aug


def test_fused_loop_matches_sequential(rng):
    """K fused steps == K sequential _step_raw calls with identical keys."""
    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.training.fused_loop import make_fused_trainstep
    m, aug = _fused_setup(rng)
    K = 3
    fn = make_fused_trainstep(m, aug, batch_size=2, n_inner=K, warp=0.7)
    p0 = jax.tree_util.tree_map(jnp.copy, m.params)
    o0 = jax.tree_util.tree_map(jnp.copy, m.opt_state)
    s0 = dict(m.state)
    key = jax.random.PRNGKey(42)
    hyper = m.optimiser.current_hyper()
    losses, errs, pK, oK, sK = fn(
        jax.tree_util.tree_map(jnp.copy, p0),
        jax.tree_util.tree_map(jnp.copy, o0), s0, key, hyper,
        aug.raws, aug.labels)

    # manual sequential replay with the identical key structure
    params, opt_state, state = p0, o0, dict(s0)
    seq_losses = []
    for k in jax.random.split(key, K):
        kb, kr = jax.random.split(k)
        data, tgt = aug.device_batch(kb, 2, warp=0.7, grey=True)
        feed = {"raw": data, "target": tgt}
        loss, aux, gn, params, opt_state, state = m._step_raw(
            params, opt_state, state, feed, kr, hyper)
        seq_losses.append(float(loss))
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=2e-5)
    for n in params:
        for pn in params[n]:
            np.testing.assert_allclose(np.asarray(pK[n][pn]),
                                       np.asarray(params[n][pn]),
                                       atol=1e-6)


def test_trainer_fused_steps(rng, tmp_path):
    from elektronn2_tpu.training.trainer import Trainer
    m, aug = _fused_setup(rng)
    tr = Trainer(model=m, data=aug, batch_size=2, n_steps=12,
                 fused_steps=4, history_freq=0, save_freq=0,
                 save_path=str(tmp_path), save_name="fused",
                 data_batch_args={"warp": 0.5})
    hist = tr.run()
    assert tr.step == 12
    assert len(hist.timeline) == 12
    losses = [row[2] for row in hist.timeline]
    assert np.isfinite(losses).all()


def test_trainer_fused_requires_data(rng, tmp_path):
    """fused_steps without any data source raises; host sources are
    accepted (routed to the host-fed fused loop — tested below)."""
    from elektronn2_tpu.training.trainer import Trainer
    m, aug = _fused_setup(rng)
    tr = Trainer(model=m, data=None, batch_size=2, n_steps=4,
                 fused_steps=2, save_path=str(tmp_path), save_name="x")
    with pytest.raises(ValueError, match="data source"):
        tr.run()


def test_trainer_auto_resume(rng, tmp_path):
    """resume=True restarts from the rolling -LAST.mdl checkpoint
    (params + optimiser state + step counter)."""
    m, aug = _fused_setup(rng)
    tr1 = Trainer(model=m, data=aug, batch_size=2, n_steps=6,
                  history_freq=0, save_freq=0, n_workers=0,
                  save_path=str(tmp_path), save_name="res",
                  data_batch_args={"warp": 0.0})
    tr1.run()          # saves res-LAST.mdl at the end
    assert tr1.step == 6

    def fail_factory():
        raise AssertionError("resume must not rebuild a fresh model")

    tr2 = Trainer(exp_config=None, data=aug, batch_size=2, n_steps=10,
                  resume=True, create_model=fail_factory,
                  history_freq=0, save_freq=0, n_workers=0,
                  save_path=str(tmp_path), save_name="res",
                  data_batch_args={"warp": 0.0})
    assert tr2.step == 6                       # picked up the step counter
    tr2.run()
    assert tr2.step == 10


def test_trainer_tensorboard_scalars(rng, tmp_path):
    pytest.importorskip("torch.utils.tensorboard")
    m, aug = _fused_setup(rng)
    tr = Trainer(model=m, data=aug, batch_size=2, n_steps=12,
                 tensorboard=True, history_freq=10, save_freq=0,
                 n_workers=0, save_path=str(tmp_path), save_name="tb",
                 data_batch_args={"warp": 0.0})
    tr.run()
    tbdir = os.path.join(str(tmp_path), "tb", "tb")
    files = [f for f in os.listdir(tbdir) if "tfevents" in f]
    assert files
    # the events payload must contain actual scalar records, not just the
    # writer's file header (tag names are stored verbatim in the stream)
    blob = b"".join(open(os.path.join(tbdir, f), "rb").read()
                    for f in files)
    assert b"train/loss" in blob
    assert b"train/lr" in blob


def test_trainer_async_loss_lag_records_all_steps(rng, tmp_path):
    """The one-step loss-materialisation lag must not drop or duplicate
    timeline entries."""
    m, aug = _fused_setup(rng)
    tr = Trainer(model=m, data=aug, batch_size=2, n_steps=7,
                 history_freq=3, save_freq=0, n_workers=0,
                 save_path=str(tmp_path), save_name="lag",
                 data_batch_args={"warp": 0.0})
    hist = tr.run()
    steps = [int(row[1]) for row in hist.timeline]
    assert steps == list(range(1, 8)), steps
    losses = [row[2] for row in hist.timeline]
    assert np.isfinite(losses).all()


def test_hostfed_fused_matches_sequential(rng):
    """K host-fed fused steps == K sequential steps on the same batches."""
    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.training.fused_loop import (
        make_fused_hostfed_trainstep)
    m, aug = _fused_setup(rng)
    K, B = 3, 2
    batches = [aug.getbatch(B, warp=0.0) for _ in range(K)]
    feeds = {"raw": np.stack([np.asarray(b[0]) for b in batches]),
             "target": np.stack([np.asarray(b[1]) for b in batches])}
    fn = make_fused_hostfed_trainstep(m, K)
    p0 = jax.tree_util.tree_map(jnp.copy, m.params)
    o0 = jax.tree_util.tree_map(jnp.copy, m.opt_state)
    key = jax.random.PRNGKey(7)
    keys = jax.random.split(key, K)
    hyper = m.optimiser.current_hyper()
    losses, errs, pK, oK, sK, _carry = fn(
        jax.tree_util.tree_map(jnp.copy, p0),
        jax.tree_util.tree_map(jnp.copy, o0), dict(m.state), feeds, keys,
        hyper, {})

    params, opt_state, state = p0, o0, dict(m.state)
    seq = []
    for k, b in zip(keys, batches):
        feed = {"raw": jnp.asarray(b[0]), "target": jnp.asarray(b[1])}
        loss, aux, gn, params, opt_state, state = m._step_raw(
            params, opt_state, state, feed, k, hyper)
        seq.append(float(loss))
    np.testing.assert_allclose(np.asarray(losses), seq, rtol=2e-5)
    for n in params:
        for pn in params[n]:
            np.testing.assert_allclose(np.asarray(pK[n][pn]),
                                       np.asarray(params[n][pn]),
                                       atol=1e-6)


def test_trainer_hostfed_fused(rng, tmp_path):
    """fused_steps with a HOST data source (BatchCreatorImage-style) runs
    through the host-fed fused loop."""
    from elektronn2_tpu.training.trainer import Trainer
    from elektronn2_tpu.data.cnndata import BatchCreatorImage
    m, _ = _fused_setup(rng)
    raws = [rng.rand(1, 24, 40, 40).astype(np.float32)]
    labs = [(rng.rand(24, 40, 40) > 0.5).astype(np.int16)]
    data = BatchCreatorImage(input_data=raws, target_data=labs)
    data.link_model_geometry(m)
    tr = Trainer(model=m, data=data, batch_size=2, n_steps=8,
                 fused_steps=4, history_freq=0, save_freq=0, n_workers=0,
                 save_path=str(tmp_path), save_name="hf",
                 data_batch_args={"warp": 0.0})
    hist = tr.run()
    assert tr.step == 8
    losses = [row[2] for row in hist.timeline]
    assert np.isfinite(losses).all()


def test_tracing_trainer_fused(rng, tmp_path):
    """TracingTrainer without state carry runs fused (host-fed chunks);
    with carry_state=True it refuses."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.data.cnndata import AgentData
    from elektronn2_tpu.training.trainer import TracingTrainer
    from test_tracing import line_skeleton

    vol = rng.rand(1, 32, 32, 32).astype(np.float32)
    lab = (vol[0] > 0.5).astype(np.int16)
    ad = AgentData(input_data=[vol], target_data=[lab])
    ad.set_geometry((5, 5, 5))
    ad.skeletons = [line_skeleton(n=12, step=1.5)]

    def build():
        T, B = 3, 2
        nm.model_manager.reset(seed=6)
        seq = nm.Input([T, B, 1, 5, 5, 5], "s,b,f,z,x,y", name="seq")
        x_t = nm.Input([B, 1, 5, 5, 5], "b,f,z,x,y", name="x_t")
        enc = nm.Perceptron(x_t, 8, flatten=True, name="enc")
        h0 = nm.InitialState_like(enc, override_f=8, name="h0")
        gru = nm.GRU(enc, h0, n_f=8, name="gru")
        scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t,
                        in_iterate_0=seq, n_steps=T, name="scan")
        out = nm.Perceptron(scan, 3, activation_func="lin", name="step")
        tgt = nm.Input([T, B, 3], "s,b,f", name="tgt")
        loss = nm.AggregateLoss(nm.SquaredLoss(out, tgt))
        m = nm.model_manager.getmodel()
        m.designate_nodes(input_node=seq, target_node=tgt, loss_node=loss,
                          prediction_node=out)
        return m

    tr = TracingTrainer(model=build(), data=ad, batch_size=2, n_steps=6,
                        n_scan_steps=3, fused_steps=3, history_freq=0,
                        save_freq=0, n_workers=0, save_path=str(tmp_path),
                        save_name="tf")
    hist = tr.run()
    assert tr.step == 6
    assert np.isfinite([row[2] for row in hist.timeline]).all()

    # carry_state now COMPOSES with fused_steps (VERDICT r1 #4): the
    # hidden state rides the chunk scan; parity with the per-step path is
    # asserted in test_tracing.py::test_fused_tbptt_matches_per_step
    tr2 = TracingTrainer(model=build(), data=ad, batch_size=2, n_steps=6,
                         n_scan_steps=3, fused_steps=3, carry_state=True,
                         history_freq=0, save_freq=0, n_workers=0,
                         save_path=str(tmp_path), save_name="tf2")
    hist2 = tr2.run()
    assert tr2.step == 6
    assert np.isfinite([row[2] for row in hist2.timeline]).all()


def test_schedule_lindec_resume_no_double_decay():
    """lindec resume: binding to an already-decayed checkpointed value at
    start_step reconstructs the step-0 initial — the next update keeps the
    original line instead of decaying twice."""
    from elektronn2_tpu.training.trainutils import Schedule

    class Obj:
        lr = 0.5                       # checkpointed at step 5000 of 10000

    s = Schedule(lindec=10000)
    s.bind_variable(obj=Obj, prop_name="lr", start_step=5000,
                    total_steps=10000)
    assert abs(s._initial - 1.0) < 1e-12
    s.update(5000, 10000)
    assert abs(Obj.lr - 0.5) < 1e-12   # unchanged at the resume step
    s.update(7500, 10000)
    assert abs(Obj.lr - 0.25) < 1e-12  # original slope


def _sharedmem_child(name, shape):
    from elektronn2_tpu.training.parallelisation import SharedMem
    v = SharedMem.attach(name, shape, np.float32)
    v.array[:] *= 2.0
    v.close()


def test_sharedmem_cross_process_zero_copy():
    """SharedMem: a spawn-mode child mutates the same pages the parent
    reads (reference: parallelisation.py::SharedMem)."""
    import multiprocessing as mp
    from elektronn2_tpu.training.parallelisation import SharedMem
    with SharedMem.alloc((3, 4), np.float32) as shm:
        shm.array[:] = np.arange(12, dtype=np.float32).reshape(3, 4)
        ctx = mp.get_context("spawn")
        p = ctx.Process(target=_sharedmem_child,
                        args=(shm.name, shm.shape))
        p.start()
        p.join(60)
        assert p.exitcode == 0
        np.testing.assert_array_equal(
            shm.array, np.arange(12, dtype=np.float32).reshape(3, 4) * 2)


def test_user_input_surface_alias():
    """trainutils.user_input is the console (reference surface name)."""
    from elektronn2_tpu.training import trainutils
    assert trainutils.user_input is trainutils.ConsoleControl


def test_set_train_lowering_exact_losses(rng):
    """r5 ``Model.set_train_lowering`` (zfold / skipsum node-trace
    lowerings): loss trajectories through 5 optimiser steps equal the
    default trace (gradients flow through both lowerings)."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))
    from unet3d_wide import create_model

    x = rng.rand(1, 1, 16, 32, 32).astype(np.float32)

    def run(**kw):
        m = create_model(batch=1, patch=(16, 32, 32), widths=(8, 12, 16))
        m.set_train_lowering(**kw)
        m.set_opt("SGD", lr=0.05, mom=0.9)
        zo, xo, yo = [int(s) for s in
                      m.prediction_node.shape.spatial_shape]
        r2 = np.random.RandomState(1)
        y = (r2.rand(1, zo, xo, yo) * 2).astype(np.int32)
        return np.asarray([float(m.trainingstep(x, y)[0])
                           for _ in range(5)])

    base = run()
    assert np.isfinite(base).all() and base[-1] < base[0]
    for kw in (dict(zfold=True), dict(skipsum=True),
               dict(zfold=True, skipsum=True)):
        got = run(**kw)
        np.testing.assert_allclose(got, base, atol=1e-5,
                                   err_msg=str(kw))
    # remat + skipsum compose (the fused hook steps aside under remat)
    m = create_model(batch=1, patch=(16, 32, 32), widths=(8, 12, 16))
    m.set_train_lowering(skipsum=True)
    m.set_remat(True)
    m.set_opt("SGD", lr=0.05)
    zo, xo, yo = [int(s) for s in m.prediction_node.shape.spatial_shape]
    y = (np.random.RandomState(1).rand(1, zo, xo, yo) * 2).astype(
        np.int32)
    l1, _ = m.trainingstep(x, y)
    assert np.isfinite(float(l1))
