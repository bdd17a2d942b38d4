"""Skeleton / tracing tests (SURVEY.md stage 4): skeleton graphs, NML
parsing, direction targets, SkelLoss gradients, recurrent tracing training,
Tracer rollout."""

import os
import io
import zipfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from elektronn2_tpu.data.skeleton import (
    SkeletonMFK, Trace, skel_loss_callback, register_skeleton,
    clear_skeleton_registry, sample_tracing_batch,
)
from elektronn2_tpu.data.tracing_utils import Tracer, ShotgunRegistry, CubeShape


def line_skeleton(n=10, step=2.0):
    pos = np.stack([np.zeros(n), np.zeros(n),
                    np.arange(n) * step], axis=1) + 5.0
    edges = [(i, i + 1) for i in range(n - 1)]
    return SkeletonMFK(pos, edges)


def test_skeleton_basics():
    sk = line_skeleton()
    assert len(sk.positions) == 10
    idx, dist = sk.get_closest_node([5.0, 5.0, 9.0])
    assert idx == 2 and abs(dist) < 1e-9
    d = sk.distance_to_skeleton([[5.0, 6.0, 9.0]])
    np.testing.assert_allclose(d, [1.0])


def test_skeleton_walk_and_direction():
    sk = line_skeleton()
    rng = np.random.RandomState(0)
    path = sk.walk(0, 5, rng)
    assert len(path) == 6
    # direction target from a point near node 2 points along +y (the line)
    v = sk.direction_target([5.0, 5.0, 8.0], lookahead=2,
                            heading=[0.0, 0.0, 1.0])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    assert v[2] > 0.9          # +y continuation (the heading direction)
    assert abs(v[0]) < 0.3 and abs(v[1]) < 0.3
    vb = sk.direction_target([5.0, 5.0, 8.0], lookahead=2,
                             heading=[0.0, 0.0, -1.0])
    assert vb[2] < -0.9        # heading flips the continuation


def test_skeleton_local_frame_orthonormal():
    sk = line_skeleton()
    F = sk.local_frame(3)
    np.testing.assert_allclose(F @ F.T, np.eye(3), atol=1e-9)


def test_nml_roundtrip(tmp_path):
    nml = b"""<?xml version="1.0"?>
    <things>
      <thing id="1">
        <nodes>
          <node id="1" x="10" y="20" z="5" radius="1.5"/>
          <node id="2" x="12" y="21" z="6" radius="1.0"/>
        </nodes>
        <edges><edge source="1" target="2"/></edges>
      </thing>
    </things>"""
    p = tmp_path / "test.nml"
    p.write_bytes(nml)
    sk = SkeletonMFK.load(str(p))
    assert len(sk.positions) == 2
    np.testing.assert_allclose(sk.positions[0], [5, 10, 20])  # (z, x, y)
    assert len(sk.edges) == 1

    # k.zip variant
    kz = tmp_path / "test.k.zip"
    with zipfile.ZipFile(kz, "w") as zf:
        zf.writestr("annotation.nml", nml)
    sk2 = SkeletonMFK.load(str(kz))
    np.testing.assert_allclose(sk2.positions, sk.positions)

    # npz variant
    sk.save(str(tmp_path / "sk.npz"))
    sk3 = SkeletonMFK.load(str(tmp_path / "sk.npz"))
    np.testing.assert_allclose(sk3.positions, sk.positions)


def test_skeleton_save_kzip_roundtrip_exact(tmp_path):
    """VERDICT r1 #3: load(save(x)) round-trips nodes/edges/radii EXACTLY
    through KNOSSOS NML and .k.zip (repr-float coordinates)."""
    rng = np.random.RandomState(5)
    pos = rng.uniform(0, 100, size=(17, 3))
    edges = [(i, i + 1) for i in range(16)] + [(3, 9)]
    radii = rng.uniform(0.5, 4.0, size=17)
    sk = SkeletonMFK(pos, edges, radii)
    for name in ("rt.nml", "rt.k.zip"):
        path = str(tmp_path / name)
        sk.save(path)
        sk2 = SkeletonMFK.load(path)
        np.testing.assert_array_equal(sk2.positions, sk.positions)
        np.testing.assert_array_equal(sk2.edges, sk.edges)
        np.testing.assert_array_equal(sk2.radii, sk.radii)
    # explicit to_kzip ignores the extension
    p3 = str(tmp_path / "explicit.bin")
    sk.to_kzip(p3)
    with zipfile.ZipFile(p3) as zf:
        # KNOSSOS-compatible member name (annotation.xml)
        assert any(n.endswith((".nml", ".xml"))
                   for n in zf.namelist())


def test_trace_to_kzip_loadable(tmp_path):
    """trace_to_kzip writes one thing per trace; loading the k.zip gets
    every trace's nodes back with chain edges."""
    from elektronn2_tpu.data.skeleton import trace_to_kzip
    t1 = Trace([[0, 0, 0], [0, 0, 1], [0, 1, 2]])
    t2 = Trace([[5, 5, 5], [6, 5, 5]])
    path = str(tmp_path / "traces.k.zip")
    trace_to_kzip([t1, t2], path)
    sk = SkeletonMFK.load(path)
    assert len(sk.positions) == 5
    assert len(sk.edges) == 3           # 2 + 1 chain edges
    np.testing.assert_array_equal(sk.positions[:3], t1.coords)
    np.testing.assert_array_equal(sk.positions[3:], t2.coords)


def test_shotgun_registry_save_kzip(tmp_path, rng):
    reg = ShotgunRegistry([[0, 0, 0]], radius=1.0)
    reg.register(Trace([[0, 0, 0], [1, 0, 0], [2, 0, 0]]))
    reg.register(Trace([[9, 9, 9], [9, 9, 10]]))
    path = str(tmp_path / "reg.k.zip")
    reg.save_kzip(path)
    sk = SkeletonMFK.load(path)
    assert len(sk.positions) == 5 and len(sk.edges) == 3


def test_trace_statistics():
    t = Trace([[0, 0, 0], [0, 0, 1], [0, 0, 2], [0, 1, 3]])
    assert len(t) == 4
    assert t.tortuosity() >= 1.0
    d = t.avg_dir()
    assert abs(np.linalg.norm(d) - 1.0) < 1e-9


def test_skel_loss_value_and_gradient():
    clear_skeleton_registry()
    sk = line_skeleton(n=20, step=1.0)   # line at z,x=5,5 along y from 5..24
    sid = register_skeleton(sk)
    # positions at the line; steps moving off it by 2 in x
    pos = np.array([[sid, 5.0, 5.0, 10.0]], np.float32)
    pred = jnp.asarray(np.array([[0.0, 2.0, 0.0]], np.float32))

    def loss_fn(p):
        return jnp.sum(skel_loss_callback(p, jnp.asarray(pos)))

    val = float(loss_fn(pred))
    assert abs(val - 4.0) < 1e-5          # dist² = 2²
    g = jax.grad(loss_fn)(pred)
    np.testing.assert_allclose(np.asarray(g)[0], [0.0, 4.0, 0.0], atol=1e-5)


def test_skel_loss_node_in_graph():
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset(seed=2)
    clear_skeleton_registry()
    sk = line_skeleton(n=20, step=1.0)
    sid = register_skeleton(sk)
    feat = nm.Input([2, 8], "b,f", name="feat")
    skel = nm.GenericInput(name="skel")
    pred = nm.Perceptron(feat, 3, activation_func="lin", name="step")
    sl = nm.SkelLoss(pred, skel, name="skel_loss")
    loss = nm.AggregateLoss(sl)
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=feat, loss_node=loss, prediction_node=pred,
                      extra_inputs=[skel])
    m.set_opt("Adam", lr=1e-2)
    x = np.random.RandomState(0).randn(2, 8).astype(np.float32)
    skel_feed = np.array([[sid, 5, 5, 10], [sid, 5, 5, 12]], np.float32)
    losses = []
    for _ in range(30):
        l, _ = m.trainingstep(x, None, extra=[skel_feed])
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_tracing_batch_and_trainer(rng):
    """AgentData tracing batches feed a GRU ScanN model that learns to
    predict the direction (stage-4 milestone)."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.data.cnndata import AgentData

    vol = rng.rand(1, 32, 32, 32).astype(np.float32)
    lab = (vol[0] > 0.5).astype(np.int16)
    ad = AgentData(input_data=[vol], target_data=[lab])
    ad.set_geometry((5, 5, 5))
    sk = line_skeleton(n=15, step=1.5)
    ad.skeletons = [sk]
    T, B = 4, 2
    seq_d, seq_t = sample_tracing_batch(ad, B, T, rng)
    assert seq_d.shape == (T, B, 1, 5, 5, 5)
    assert seq_t.shape == (T, B, 3)

    nm.model_manager.reset(seed=5)
    seq = nm.Input([T, B, 1, 5, 5, 5], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([B, 1, 5, 5, 5], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, 16, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=16, name="h0")
    gru = nm.GRU(enc, h0, n_f=16, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    # readout applied to the stacked (s, b, f) scan output per step
    out = nm.Perceptron(scan, 3, activation_func="lin", name="readout")
    tgt = nm.Input([T, B, 3], "s,b,f", name="tgt")
    loss = nm.AggregateLoss(nm.SquaredLoss(out, tgt))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=seq, target_node=tgt, loss_node=loss,
                      prediction_node=out)
    m.set_opt("Adam", lr=3e-3)
    losses = []
    for _ in range(20):
        d, t = sample_tracing_batch(ad, B, T, rng)
        l, _ = m.trainingstep(d, t)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_tracer_rollout(rng):
    """A hard-wired 'model' stepping +y traces a straight path."""

    class FakeModel:
        class _N:
            pass

        def __init__(self):
            self.input_node = self._N()
            from elektronn2_tpu.neuromancer.graphutils import TaggedShape
            self.input_node.shape = TaggedShape((1, 1, 5, 5, 5),
                                                "b,f,z,x,y")

        def predict(self, patch):
            return np.array([[0.0, 0.0, 2.0]], np.float32)

    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    tracer = Tracer(FakeModel(), vol, max_steps=10)
    tr = tracer.trace([12.0, 12.0, 5.0])
    assert len(tr) > 3
    # moved along +y only
    np.testing.assert_allclose(tr.coords[-1][:2], [12.0, 12.0])
    assert tr.coords[-1][2] > 5.0


def test_shotgun_registry(rng):
    class FakeModel:
        class _N:
            pass

        def __init__(self):
            self.input_node = self._N()
            from elektronn2_tpu.neuromancer.graphutils import TaggedShape
            self.input_node.shape = TaggedShape((1, 1, 5, 5, 5),
                                                "b,f,z,x,y")

        def predict(self, patch):
            return np.array([[0.0, 0.0, 2.0]], np.float32)

    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    tracer = Tracer(FakeModel(), vol, max_steps=5)
    reg = ShotgunRegistry([[12, 12, 6], [12, 12, 6.5], [12, 5, 6]],
                          radius=3.0)
    traces = reg.run(tracer)
    assert len(traces) == 2  # second seed deduped against the first trace


def test_cube_shape():
    c = CubeShape((20, 20, 20), (3, 3, 3))
    assert c.inside([10, 10, 10])
    assert not c.inside([1, 10, 10])
    np.testing.assert_allclose(c.clip([0, 10, 25]), [3, 10, 16])


def test_tracing_trainer_state_carry(rng):
    """TracingTrainer(carry_state=True): the scan's final hidden state is
    fed as the next batch's initial state (truncated BPTT)."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.data.cnndata import AgentData
    from elektronn2_tpu.training.trainer import TracingTrainer

    vol = rng.rand(1, 32, 32, 32).astype(np.float32)
    ad = AgentData(input_data=[vol], target_data=[(vol[0] > 0.5).astype(np.int16)])
    ad.set_geometry((5, 5, 5))
    ad.skeletons = [line_skeleton(n=15, step=1.5)]

    T, B = 3, 2
    nm.model_manager.reset(seed=6)
    seq = nm.Input([T, B, 1, 5, 5, 5], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([B, 1, 5, 5, 5], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, 8, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=8, name="h0")
    gru = nm.GRU(enc, h0, n_f=8, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    out = nm.Perceptron(scan, 3, activation_func="lin", name="readout")
    tgt = nm.Input([T, B, 3], "s,b,f", name="target")
    loss = nm.AggregateLoss(nm.SquaredLoss(out, tgt))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=seq, target_node=tgt, loss_node=loss,
                      prediction_node=out)
    m.set_opt("Adam", lr=1e-3)

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        tr = TracingTrainer(model=m, data=ad, n_scan_steps=T,
                            carry_state=True, n_steps=4, n_workers=0,
                            history_freq=0, save_freq=0, batch_size=B,
                            save_path=td)
        assert tr._carry_map == {"scan": "h0"}
        tr.run()
        # carry is populated and has the hidden-state shape
        assert "h0" in tr._carry
        assert tuple(tr._carry["h0"].shape) == (B, 8)
        assert np.abs(np.asarray(tr._carry["h0"])).max() > 0


def _tbptt_model(T=3, B=2):
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset(seed=6)
    seq = nm.Input([T, B, 1, 5, 5, 5], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([B, 1, 5, 5, 5], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, 8, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=8, name="h0")
    gru = nm.GRU(enc, h0, n_f=8, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    out = nm.Perceptron(scan, 3, activation_func="lin", name="readout")
    tgt = nm.Input([T, B, 3], "s,b,f", name="target")
    loss = nm.AggregateLoss(nm.SquaredLoss(out, tgt))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=seq, target_node=tgt, loss_node=loss,
                      prediction_node=out)
    m.set_opt("SGD", lr=1e-2)
    return m, scan


def test_fused_tbptt_matches_per_step(rng):
    """VERDICT r1 #4: carry_state composes with fused_steps — the fused
    chunk's losses AND final carried hidden state equal the per-step
    TBPTT path's over K steps (deterministic model, identical feeds)."""
    from elektronn2_tpu.training.fused_loop import HostFedFusedLoop
    T, B, K = 3, 2, 5
    feeds = [(rng.rand(T, B, 1, 5, 5, 5).astype(np.float32),
              rng.rand(T, B, 3).astype(np.float32)) for _ in range(K)]

    # per-step TBPTT reference (TracingTrainer's _step_kwargs/_post_step)
    mA, scanA = _tbptt_model(T, B)
    mA.debug_outputs.append(scanA)
    mA._step_fn = None
    carry = None
    losses_ref = []
    for d, t in feeds:
        ov = {"h0": carry} if carry is not None else None
        lv, aux = mA.trainingstep(d, t, feed_overrides=ov)
        losses_ref.append(float(lv))
        carry = np.asarray(aux["scan"])[-1]

    # fused: all K steps in ONE dispatch, state riding the chunk scan
    mB, scanB = _tbptt_model(T, B)
    mB.debug_outputs.append(scanB)
    mB._step_fn = None

    class Stub:
        def __init__(self, items):
            self.items = list(items)

        def getbatch(self, bs, **kw):
            return self.items.pop(0)

    loop = HostFedFusedLoop(mB, Stub(feeds), B, K, prefetch=False,
                            carry_map={"scan": "h0"})
    losses_fused, _ = loop.run_chunk()
    np.testing.assert_allclose(losses_fused, losses_ref,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(loop.rnn_carry["h0"]), carry,
                               rtol=1e-5, atol=1e-6)
    # params end up identical too (same updates step for step)
    np.testing.assert_allclose(np.asarray(mB.params["gru"]["w_gates"]),
                               np.asarray(mA.params["gru"]["w_gates"]),
                               rtol=1e-5, atol=1e-6)


def test_tracing_trainer_rnn_fused_runs(rng, tmp_path):
    """TracingTrainerRNN (carry_state default) trains in fused mode
    end-to-end and carries state across chunks."""
    from elektronn2_tpu.data.cnndata import AgentData
    from elektronn2_tpu.training.trainer import TracingTrainerRNN

    vol = rng.rand(1, 32, 32, 32).astype(np.float32)
    ad = AgentData(input_data=[vol],
                   target_data=[(vol[0] > 0.5).astype(np.int16)])
    ad.set_geometry((5, 5, 5))
    ad.skeletons = [line_skeleton(n=15, step=1.5)]
    T, B = 3, 2
    m, _ = _tbptt_model(T, B)
    tr = TracingTrainerRNN(model=m, data=ad, n_scan_steps=T, n_steps=6,
                           n_workers=0, history_freq=0, save_freq=0,
                           batch_size=B, save_path=str(tmp_path),
                           fused_steps=3)
    assert tr.carry_state and tr._carry_map == {"scan": "h0"}
    hist = tr.run()
    assert tr.step == 6


# ---------------------------------------------------------------- DeviceTracer

def _ff_step_model(w=None, b=None, patch=(5, 5, 5)):
    """Feedforward step predictor: patch -> 3-vector (lin)."""
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset(seed=3)
    inp = nm.Input([1, 1, *patch], "b,f,z,x,y", name="x")
    step = nm.Perceptron(inp, 3, activation_func="lin", flatten=True,
                         name="step")
    m = nm.model_manager.getmodel("ff_tracer")
    m.designate_nodes(input_node=inp, prediction_node=step)
    if w is not None:
        m.params["step"]["w"] = jnp.asarray(w)
    if b is not None:
        m.params["step"]["b"] = jnp.asarray(b)
    return m


def test_device_tracer_matches_host_tracer(rng):
    """Feedforward rollout: DeviceTracer == host Tracer trajectory."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    patch = (5, 5, 5)
    w = (rng.randn(int(np.prod(patch)), 3) * 0.02).astype(np.float32)
    b = np.array([0.1, 0.35, 0.25], np.float32)
    m = _ff_step_model(w=w, b=b, patch=patch)
    vol = rng.rand(1, 28, 28, 28).astype(np.float32)
    seed = [13.0, 12.5, 11.0]
    K = 8

    host = Tracer(m, vol, max_steps=K).trace(seed)
    dev = DeviceTracer(m, vol, max_steps=K).trace(seed)
    # both stayed in bounds for all K steps -> identical point sequences
    assert len(host.coords) == len(dev.coords) == K + 1
    np.testing.assert_allclose(dev.coords, host.coords, atol=1e-4)


def test_device_tracer_batched_equals_single(rng):
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    patch = (5, 5, 5)
    w = (rng.randn(int(np.prod(patch)), 3) * 0.02).astype(np.float32)
    m = _ff_step_model(w=w, b=np.array([0.3, -0.2, 0.25], np.float32))
    vol = rng.rand(1, 26, 26, 26).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=6)
    seeds = [[13.0, 12.0, 12.0], [11.5, 13.5, 12.5]]
    batch = dt.trace_batch(seeds)
    singles = [dt.trace(s) for s in seeds]
    for tb, ts in zip(batch, singles):
        np.testing.assert_allclose(tb.coords, ts.coords, atol=1e-5)


def test_device_tracer_oob_freeze(rng):
    """An agent marching at a wall stops right after crossing the margin
    — and matches the host Tracer point-for-point (the reference records
    the final out-of-margin position, THEN breaks)."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    patch = (5, 5, 5)
    m = _ff_step_model(w=np.zeros((int(np.prod(patch)), 3), np.float32),
                       b=np.array([3.0, 0.0, 0.0], np.float32))
    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    host = Tracer(m, vol, max_steps=10).trace([12.0, 12.0, 12.0])
    dev = DeviceTracer(m, vol, max_steps=10).trace([12.0, 12.0, 12.0])
    np.testing.assert_allclose(dev.coords, host.coords, atol=1e-4)
    pts = dev.coords
    assert len(pts) < 11                      # stopped before max_steps
    margin = np.asarray(patch) / 2 + 1
    # all points except possibly the LAST respect the margin; the last one
    # is the recorded exit step (host-parity), after which the agent froze
    assert np.all(pts[:-1] >= margin - 1e-6)
    assert np.all(pts[:-1] < 24 - margin + 1e-6)
    assert pts[-1][0] >= 24 - margin[0] - 1e-6   # it DID record the exit


def test_device_tracer_recurrent_rollout(rng):
    """GRU tracing model: device scan == step-by-step manual replay."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    import elektronn2_tpu.neuromancer as nm
    patch = (5, 5, 5)
    T, B = 4, 1
    nm.model_manager.reset(seed=7)
    seq = nm.Input([T, B, 1, *patch], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([B, 1, *patch], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, 16, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=16, name="h0")
    gru = nm.GRU(enc, h0, n_f=16, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    step = nm.Perceptron(scan, 3, activation_func="lin", name="step")
    m = nm.model_manager.getmodel("rec_tracer")
    m.designate_nodes(input_node=seq, prediction_node=step)
    # bias the step so the agent actually moves
    m.params["step"]["b"] = jnp.asarray([0.4, 0.3, -0.2], np.float32)

    vol = rng.rand(1, 26, 26, 26).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=5)
    tr = dt.trace([13.0, 13.0, 13.0])
    assert len(tr.coords) == 6          # moved every step

    # manual replay through the same step function
    pos = np.array([13.0, 13.0, 13.0], np.float32)
    carry = dt._init_carry(m.params, m.state, 1)
    pts = [pos.copy()]
    for _ in range(5):
        pch = dt._extract(jnp.asarray(vol), jnp.asarray(pos))[None]
        pred, carry = dt._step_apply(m.params, m.state, pch, carry)
        pos = pos + np.asarray(pred).reshape(-1)[:3]
        pts.append(pos.copy())
    np.testing.assert_allclose(tr.coords, np.asarray(pts), atol=1e-4)
    # hidden state actually evolves (recurrent path exercised)
    assert float(np.abs(np.asarray(carry[0])).max()) > 0


def test_shotgun_registry_batched_drain(rng):
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    patch = (5, 5, 5)
    w = (rng.randn(int(np.prod(patch)), 3) * 0.02).astype(np.float32)
    m = _ff_step_model(w=w, b=np.array([0.3, 0.2, 0.1], np.float32))
    vol = rng.rand(1, 26, 26, 26).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=5)
    seeds = [[12.0, 12.0, 12.0], [13.0, 11.0, 12.0], [11.0, 13.0, 13.0],
             [12.5, 12.5, 11.5]]
    reg = ShotgunRegistry(seeds, radius=1.5)
    traces = reg.run(dt, batch_size=2)
    # radius 1.5 around the clustered seeds: dedup MUST fire for at least
    # one later seed (they start within ~1.7 of the first trace) but the
    # first batch always traces
    assert 1 <= len(traces) <= 3
    assert reg.next_seed() is None          # drained
    for t in traces:
        assert len(t.coords) >= 1


def test_layers_from_model_nonmonotonic_activation_parity(rng):
    """pool-before-activation ordering: extracted stack == model.predict
    for an activation that does NOT commute with max-pooling."""
    from elektronn2_tpu.parallel.pipeline import (layers_from_model,
                                                  _stage_apply,
                                                  extract_params)
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset(seed=9)
    inp = nm.Input([2, 1, 6, 12, 12], "b,f,z,x,y", name="raw")
    h = nm.Conv(inp, 4, (3, 3, 3), (1, 2, 2), activation_func="abs",
                name="e0")
    out = nm.Conv(h, 2, 1, 1, activation_func="lin", name="cls")
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=out)
    layers = layers_from_model(m)
    x = rng.randn(2, 1, 6, 12, 12).astype(np.float32)
    ref = np.asarray(m.predict(x))
    meta, params = extract_params(layers)
    got = np.asarray(_stage_apply(meta, params, range(2), jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_layers_from_model_rejects_interrupted_chain(rng):
    """A standalone Pool between Convs must raise, not silently truncate."""
    from elektronn2_tpu.parallel.pipeline import layers_from_model
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset(seed=10)
    inp = nm.Input([1, 1, 8, 12, 12], "b,f,z,x,y", name="raw")
    h = nm.Conv(inp, 4, (3, 3, 3), (1, 1, 1), name="e0")
    h = nm.Pool(h, (1, 2, 2), name="p0")
    h = nm.Conv(h, 4, (1, 3, 3), (1, 1, 1), name="e1")
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=h)
    with pytest.raises(ValueError, match="interrupted"):
        layers_from_model(m)


def test_shotgun_batched_drain_pads_partial_batch(rng):
    """The final partial batch is padded to batch_size (no recompile) and
    the padding traces are discarded."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    patch = (5, 5, 5)
    w = (rng.randn(int(np.prod(patch)), 3) * 0.02).astype(np.float32)
    m = _ff_step_model(w=w, b=np.array([0.3, 0.2, 0.1], np.float32))
    vol = rng.rand(1, 26, 26, 26).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=4)
    seeds = [[12.0, 12.0, 12.0], [13.0, 11.0, 12.0], [11.0, 13.0, 13.0]]
    reg = ShotgunRegistry(seeds, radius=0.1)
    traces = reg.run(dt, batch_size=2)        # 2 + (1 padded to 2)
    assert len(traces) == 3
    assert reg.next_seed() is None


def test_device_tracer_uint8_volume_matches_host(rng):
    """Integer EM raw volumes: device trilinear must match the host
    (previously the fraction truncated to 0 on int dtypes)."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    patch = (5, 5, 5)
    w = (rng.randn(int(np.prod(patch)), 3) * 0.0005).astype(np.float32)
    m = _ff_step_model(w=w, b=np.array([0.11, 0.37, 0.23], np.float32))
    vol = (rng.rand(1, 28, 28, 28) * 255).astype(np.uint8)
    K = 8
    host = Tracer(m, vol, max_steps=K).trace([13.0, 12.5, 11.0])
    dev = DeviceTracer(m, vol, max_steps=K).trace([13.0, 12.5, 11.0])
    assert len(dev.coords) == len(host.coords)
    np.testing.assert_allclose(dev.coords, host.coords, atol=1e-2)


def test_device_tracer_prelu_head(rng):
    """Axis-sensitive head (prelu Perceptron over the scan output) works:
    the per-step cell output is injected as a length-1 sequence."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    import elektronn2_tpu.neuromancer as nm
    patch = (5, 5, 5)
    T = 3
    nm.model_manager.reset(seed=13)
    seq = nm.Input([T, 1, 1, *patch], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([1, 1, *patch], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, 8, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=8, name="h0")
    gru = nm.GRU(enc, h0, n_f=8, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    mid = nm.Perceptron(scan, 6, activation_func="prelu", name="mid")
    out = nm.Perceptron(mid, 3, activation_func="lin", name="step")
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=seq, prediction_node=out)
    m.params["step"]["b"] = jnp.asarray([0.3, 0.2, 0.1], np.float32)
    vol = rng.rand(1, 26, 26, 26).astype(np.float32)
    tr = DeviceTracer(m, vol, max_steps=4).trace([13.0, 13.0, 13.0])
    assert len(tr.coords) == 5
    assert np.isfinite(tr.coords).all()


def test_tracing_trainer_preview_rollout(rng, tmp_path):
    """TracingTrainer.preview_rollout drives DeviceTracer over a training
    cube with the in-training model."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.data.cnndata import AgentData
    from elektronn2_tpu.training.trainer import TracingTrainer

    vol = rng.rand(1, 32, 32, 32).astype(np.float32)
    lab = (vol[0] > 0.5).astype(np.int16)
    ad = AgentData(input_data=[vol], target_data=[lab])
    ad.set_geometry((5, 5, 5))
    ad.skeletons = [line_skeleton(n=12, step=1.5)]

    T, B = 3, 2
    nm.model_manager.reset(seed=6)
    seq = nm.Input([T, B, 1, 5, 5, 5], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([B, 1, 5, 5, 5], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, 8, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=8, name="h0")
    gru = nm.GRU(enc, h0, n_f=8, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    out = nm.Perceptron(scan, 3, activation_func="lin", name="step")
    tgt = nm.Input([T, B, 3], "s,b,f", name="tgt")
    loss = nm.AggregateLoss(nm.SquaredLoss(out, tgt))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=seq, target_node=tgt, loss_node=loss,
                      prediction_node=out)
    m.params["step"]["b"] = jnp.asarray([0.3, 0.2, 0.1], np.float32)

    tr = TracingTrainer(model=m, data=ad, batch_size=B, n_steps=2,
                        n_scan_steps=T, history_freq=0, save_freq=0,
                        n_workers=0, save_path=str(tmp_path),
                        save_name="pv")
    traces = tr.preview_rollout(n_agents=4, max_steps=6)
    assert len(traces) == 4
    assert all(np.isfinite(t.coords).all() for t in traces)


# ----------------------------------------------------------- SkelLossField

def test_skel_loss_field_matches_callback(rng):
    """Field-sampled squared distance ≈ the host KD-tree callback (densely
    noded skeleton → curve distance == node distance)."""
    from elektronn2_tpu.data.skeleton import (skeleton_distance_field,
                                              register_skeleton,
                                              clear_skeleton_registry,
                                              skel_loss_callback)
    clear_skeleton_registry()
    sk = line_skeleton(n=40, step=0.5)      # dense: nodes every 0.5 vox
    sid = register_skeleton(sk)
    fields = skeleton_distance_field([sk], (32, 32, 32))

    pos = np.array([[sid, 5.0, 5.0, 10.0],
                    [sid, 5.0, 5.0, 14.5]], np.float32)
    pred = jnp.asarray([[0.0, 2.0, 0.0], [1.5, 0.0, 0.0]], np.float32)
    host = np.asarray(skel_loss_callback(pred, jnp.asarray(pos)))

    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer import model_manager
    model_manager.reset(seed=40)
    p_in = nm.Input([2, 3], "b,f", name="pred")
    s_in = nm.GenericInput(name="skel")
    sl = nm.SkelLossField(p_in, s_in, fields, name="slf")
    m = model_manager.getmodel()
    m.designate_nodes(input_node=p_in, prediction_node=sl,
                      extra_inputs=[s_in])
    dev = np.asarray(m.predict(np.asarray(pred), extra=[pos]))
    np.testing.assert_allclose(dev, host, atol=0.6)   # voxel quantisation

    # gradient pulls the landing point toward the skeleton
    outs_grad = jax.grad(
        lambda pr: jnp.sum(m._apply([sl], m.params, m.state,
                                    {"pred": pr, "skel": jnp.asarray(pos)},
                                    None, train=False)[0][0]))(pred)
    g = np.asarray(outs_grad)
    # sample 0: off-line by +2 in x → x is the dominant positive component
    # (the piecewise-linear field has unit-magnitude one-sided slopes on
    # lattice planes, so the other components are only coarsely zero)
    assert g[0, 1] > 2.0
    assert abs(g[0, 0]) <= 1.5 and abs(g[0, 2]) <= 1.5
    assert g[0, 1] > 2 * max(abs(g[0, 0]), abs(g[0, 2]))


def test_skel_loss_field_trains_without_callbacks(rng):
    """A tracing head trained on SkelLossField: loss decreases AND the
    jitted step contains no host callback primitives."""
    from elektronn2_tpu.data.skeleton import skeleton_distance_field
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer import model_manager
    sk = line_skeleton(n=40, step=0.5)
    fields = skeleton_distance_field([sk], (32, 32, 32))
    model_manager.reset(seed=41)
    feat = nm.Input([4, 8], "b,f", name="feat")
    skel = nm.GenericInput(name="skel")
    pred = nm.Perceptron(feat, 3, activation_func="lin", name="step")
    sl = nm.SkelLossField(pred, skel, fields, name="slf")
    loss = nm.AggregateLoss(sl)
    m = model_manager.getmodel()
    m.designate_nodes(input_node=feat, loss_node=loss,
                      prediction_node=pred, extra_inputs=[skel])
    m.set_opt("Adam", lr=5e-2)
    x = rng.randn(4, 8).astype(np.float32)
    skel_feed = np.array([[0, 5, 8, 10], [0, 5, 3, 12],
                          [0, 5, 5, 6], [0, 5, 7, 15]], np.float32)
    losses = []
    for _ in range(40):
        l, _ = m.trainingstep(x, None, extra=[skel_feed])
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.5

    # no host callbacks anywhere in the step program
    m._build_step()
    jaxpr = jax.make_jaxpr(
        lambda p, o, s, f, k, h: m._step_raw(p, o, s, f, k, h))(
        m.params, m.opt_state, m.state,
        {"feat": x, "skel": skel_feed}, jax.random.PRNGKey(0),
        m.optimiser.current_hyper())
    assert "callback" not in str(jaxpr)


def test_skel_loss_field_roundtrip(rng, tmp_path):
    """The field (a non-trainable param) survives save/load."""
    from elektronn2_tpu.data.skeleton import skeleton_distance_field
    from elektronn2_tpu.neuromancer.model import modelload
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer import model_manager
    sk = line_skeleton(n=10, step=2.0)
    fields = skeleton_distance_field([sk], (16, 16, 16))
    model_manager.reset(seed=42)
    p_in = nm.Input([1, 3], "b,f", name="pred")
    s_in = nm.GenericInput(name="skel")
    sl = nm.SkelLossField(p_in, s_in, fields, name="slf")
    m = model_manager.getmodel()
    m.designate_nodes(input_node=p_in, prediction_node=sl,
                      extra_inputs=[s_in])
    f = str(tmp_path / "slf.mdl")
    m.save(f)
    m2 = modelload(f)
    feed = np.array([[0, 8.0, 8.0, 8.0]], np.float32)
    pr = np.array([[0.5, 0.0, 0.0]], np.float32)
    np.testing.assert_allclose(
        np.asarray(m2.predict(pr, extra=[feed])),
        np.asarray(m.predict(pr, extra=[feed])), atol=1e-6)


def test_host_tracer_recurrent_matches_device(rng):
    """The host Tracer supports ScanN models (cell stepping + carried
    hidden state — it used to crash on the sequence input); its first
    steps agree with DeviceTracer's fused rollout."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    nm.model_manager.reset(seed=7)
    T, B = 3, 2
    seq = nm.Input([T, B, 1, 5, 5, 5], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([B, 1, 5, 5, 5], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, 16, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=16, name="h0")
    gru = nm.GRU(enc, h0, n_f=16, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    step_v = nm.Perceptron(scan, 3, activation_func="lin", name="step")
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=seq, prediction_node=step_v)
    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    seed = np.array([12.0, 12.0, 12.0])
    host = Tracer(m, vol, max_steps=4, step_scale=3.0).trace(seed)
    dev = DeviceTracer(m, vol, max_steps=4,
                       step_scale=3.0).trace_batch(seed[None])[0]
    n = min(len(host.coords), len(dev.coords), 3)
    assert n >= 2                      # actually stepped with state
    np.testing.assert_allclose(host.coords[:n], dev.coords[:n], atol=1e-2)


def test_direction_target_endpoint_no_bounce():
    """Lookahead stops at skeleton endpoints instead of bouncing back
    (which emitted the degenerate [0,0,1] default as a training label)."""
    sk = line_skeleton(n=6, step=2.0)    # line along z from 5 to 15
    # query just before the far endpoint, heading toward it
    v = sk.direction_target([5.0, 5.0, 13.5], lookahead=3,
                            heading=[0.0, 0.0, 1.0])
    assert v[2] > 0.9                    # continues toward the endpoint


def test_skeleton_save_returns_written_path(tmp_path):
    sk = line_skeleton()
    p = sk.save(str(tmp_path / "noext"))
    assert p.endswith(".npz") and os.path.exists(p)
    sk2 = SkeletonMFK.load(p)
    np.testing.assert_allclose(sk2.positions, sk.positions)


def test_kzip_load_accepts_annotation_xml(tmp_path):
    """KNOSSOS's own annotation containers store annotation.xml."""
    nml = (b'<?xml version="1.0"?><things><thing id="1"><nodes>'
           b'<node id="1" x="1" y="2" z="3" radius="1"/></nodes>'
           b'<edges/></thing></things>')
    kz = tmp_path / "knossos_saved.k.zip"
    with zipfile.ZipFile(kz, "w") as zf:
        zf.writestr("annotation.xml", nml)
    sk = SkeletonMFK.load(str(kz))
    assert len(sk.positions) == 1
    with pytest.raises(ValueError, match="no .nml/.xml"):
        kz2 = tmp_path / "empty.k.zip"
        with zipfile.ZipFile(kz2, "w") as zf:
            zf.writestr("readme.txt", b"x")
        SkeletonMFK.load(str(kz2))


# ------------------------------------------------- frame-aligned views (r2)

def test_flight_frame_orthonormal_and_degenerate():
    from elektronn2_tpu.data.transformations import flight_frame
    for d in ([1.0, 2.0, -0.5], [0.0, 1.0, 0.0], [3.0, 0.0, 0.0],
              [0.0, 0.0, 0.0]):
        F = flight_frame(d)
        np.testing.assert_allclose(F @ F.T, np.eye(3), atol=1e-12)
        n = np.linalg.norm(d)
        if n > 0:
            np.testing.assert_allclose(F[0], np.asarray(d) / n, atol=1e-12)
        else:   # degenerate heading falls back to (0, 0, 1) — the same
                # fallback direction_target uses
            np.testing.assert_allclose(F[0], [0.0, 0.0, 1.0], atol=1e-12)


def test_get_tracing_slice_z_heading_vs_axis_aligned(rng):
    """direction=None == plain warp_slice; a +z heading samples the same
    z-planes with the view plane rotated 90° in-plane (the frame's gauge:
    n1=(0,0,1), n2=(0,-1,0) for t=(1,0,0)) — axis-aligned values up to a
    rot90."""
    from elektronn2_tpu.data.transformations import (get_tracing_slice,
                                                     warp_slice)
    vol = rng.rand(1, 20, 20, 20).astype(np.float32)
    pos = [10.0, 9.5, 10.5]
    b = warp_slice(vol, (5, 5, 5), position=pos)
    c = get_tracing_slice(vol, (5, 5, 5), pos, direction=None)
    np.testing.assert_allclose(c, b, atol=1e-5)
    a = get_tracing_slice(vol, (5, 5, 5), pos, direction=[1.0, 0.0, 0.0])
    # a[z, i, j] = b[z, N-1-j, i]  (axis1 → world y, axis2 → world -x)
    np.testing.assert_allclose(a, np.rot90(b, k=-1, axes=(2, 3)),
                               atol=1e-5)


def test_get_tracing_slice_samples_along_heading():
    """On a linear ramp f(z,x,y)=z, the patch gradient along local axis i
    equals the i-th frame vector's z-component (the view really looks
    along the heading)."""
    from elektronn2_tpu.data.transformations import (get_tracing_slice,
                                                     flight_frame)
    Z = 40
    vol = np.broadcast_to(np.arange(Z, dtype=np.float32)[None, :, None,
                                                         None],
                          (1, Z, Z, Z)).copy()
    pos = [20.0, 20.0, 20.0]
    for d in ([0.0, 1.0, 0.0], [1.0, 1.0, 0.0], [2.0, -1.0, 0.5]):
        patch, M = get_tracing_slice(vol, (7, 7, 7), pos, direction=d,
                                     return_M=True)
        F = flight_frame(d)
        np.testing.assert_allclose(M[:3, :3], F.T, atol=1e-12)
        g = np.gradient(patch[0])
        for i in range(3):
            np.testing.assert_allclose(np.median(g[i]), F[i, 0], atol=1e-3)


def test_sample_tracing_batch_rotated_targets(rng):
    """rotate_to_heading: straight-line flight -> local target is the
    local z-axis (the agent keeps looking where it is going)."""
    from elektronn2_tpu.data.cnndata import AgentData

    vol = rng.rand(1, 32, 32, 32).astype(np.float32)
    lab = (vol[0] > 0.5).astype(np.int16)
    ad = AgentData(input_data=[vol], target_data=[lab],
                   rotate_to_heading=True)
    ad.set_geometry((5, 5, 5))
    # straight line along +y (axis 2 in (z, x, y) order)
    n = 15
    posn = np.stack([np.full(n, 16.0), np.full(n, 16.0),
                     5.0 + np.arange(n) * 1.5], axis=1)
    ad.skeletons = [SkeletonMFK(posn, [(i, i + 1) for i in range(n - 1)])]
    T, B = 4, 3
    seq_d, seq_t = sample_tracing_batch(ad, B, T, rng)
    assert seq_d.shape == (T, B, 1, 5, 5, 5)
    assert seq_t.shape == (T, B, 3)
    # after the first hop the view frame tracks the (constant) heading:
    # the local-frame target is (1, 0, 0) = straight ahead
    for t in range(1, T):
        np.testing.assert_allclose(seq_t[t], np.tile([1.0, 0.0, 0.0],
                                                     (B, 1)), atol=1e-6)
    # and targets stay unit-length in either frame
    np.testing.assert_allclose(np.linalg.norm(seq_t, axis=-1), 1.0,
                               atol=1e-6)


def test_tracer_rotated_rollout_goes_straight(rng):
    """A model that always predicts 'straight ahead' in the local frame
    traces a straight world line along the initial heading."""

    class LocalAhead:
        class _N:
            pass

        def __init__(self):
            from elektronn2_tpu.neuromancer.graphutils import TaggedShape
            self.input_node = self._N()
            self.input_node.shape = TaggedShape((1, 1, 5, 5, 5),
                                                "b,f,z,x,y")

        def predict(self, patch):
            return np.array([[2.0, 0.0, 0.0]], np.float32)  # local +t

    vol = rng.rand(1, 28, 28, 28).astype(np.float32)
    tracer = Tracer(LocalAhead(), vol, max_steps=6, rotate_to_heading=True)
    tr = tracer.trace([14.0, 5.0, 14.0], initial_heading=[0.0, 1.0, 0.0])
    assert len(tr) > 4
    d = tr.coords[-1] - tr.coords[0]
    # moved along +x (the initial heading) only
    assert d[1] > 4.0
    np.testing.assert_allclose([d[0], d[2]], [0.0, 0.0], atol=1e-4)


def test_device_tracer_mesh_sharded_batch_equals_unsharded(rng):
    """Pod-scale tracing (r3): ``trace_batch(mesh=...)`` shards the agent
    batch over a mesh axis (volume/params replicated, zero collectives —
    the scale-out lever, the single-chip rollout saturating at B≈256).
    Results must equal the unsharded rollout exactly; B=10 on an 8-way
    axis additionally exercises the divisibility padding."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    from elektronn2_tpu.parallel import make_mesh

    patch = (5, 5, 5)
    w = (rng.randn(int(np.prod(patch)), 3) * 0.02).astype(np.float32)
    m = _ff_step_model(w=w, b=np.array([0.25, -0.15, 0.3], np.float32))
    vol = rng.rand(1, 26, 26, 26).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=6)
    seeds = rng.uniform(10, 16, (10, 3)).astype(np.float32)
    plain = dt.trace_batch(seeds)
    mesh = make_mesh({"data": 8})
    sharded = dt.trace_batch(seeds, mesh=mesh)
    assert len(plain) == len(sharded) == 10
    for a, b in zip(plain, sharded):
        assert len(a) == len(b)
        np.testing.assert_allclose(a.coords, b.coords, atol=1e-6)


def test_device_tracer_tune_batch(rng):
    """tune_batch measures candidate agent batches and returns the best:
    table keyed by B, rates positive, tracer state (compiled fn,
    max_steps) restored afterwards."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer

    patch = (5, 5, 5)
    w = (rng.randn(int(np.prod(patch)), 3) * 0.02).astype(np.float32)
    m = _ff_step_model(w=w, b=np.array([0.2, -0.1, 0.2], np.float32))
    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=7)
    res = dt.tune_batch(candidates=(2, 4), steps=3, repeats=1)
    assert set(res["table"]) == {2, 4}
    assert all(v > 0 for v in res["table"].values())
    assert res["best"] in (2, 4)
    assert dt.max_steps == 7 and dt._fn is None
    # the tracer still works after tuning
    assert len(dt.trace([12.0, 12.0, 12.0])) >= 1


def test_trace_pool_no_respawn_matches_trace_batch(rng):
    """N <= B: every seed fills a slot at t=0 and the queue drains
    immediately — pool traces must equal trace_batch exactly."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    patch = (5, 5, 5)
    w = (rng.randn(int(np.prod(patch)), 3) * 0.02).astype(np.float32)
    m = _ff_step_model(w=w, b=np.array([0.3, -0.2, 0.25], np.float32))
    vol = rng.rand(1, 26, 26, 26).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=6)
    seeds = np.asarray([[13.0, 12.0, 12.0], [11.5, 13.5, 12.5],
                        [12.5, 11.5, 13.0]], np.float32)
    ref = dt.trace_batch(seeds)
    traces, stats = dt.trace_pool(seeds, batch_size=4)
    assert stats["consumed"] == 3
    assert len(traces) == 3
    for tp, tb in zip(traces, ref):
        np.testing.assert_allclose(tp.coords, tb.coords, atol=1e-5)
    assert stats["effective_steps"] == sum(len(t) - 1 for t in ref)


def test_trace_pool_respawn_equals_individual(rng):
    """N > B with early deaths (agents march into the wall): respawned
    slots must reproduce each seed's individual rollout exactly — the
    respawn resets position/step-counter correctly."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    patch = (5, 5, 5)
    # strong +z drift: agents hit the z margin after a few steps
    w = (rng.randn(int(np.prod(patch)), 3) * 0.01).astype(np.float32)
    m = _ff_step_model(w=w, b=np.array([1.4, 0.2, -0.1], np.float32))
    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=10)
    seeds = rng.uniform(10.0, 14.0, (7, 3)).astype(np.float32)
    traces, stats = dt.trace_pool(seeds, batch_size=2)
    assert stats["consumed"] == 7
    singles = [dt.trace(s) for s in seeds]
    for i, (tp, ts) in enumerate(zip(traces, singles)):
        assert len(tp.coords) == len(ts.coords), f"seed {i}"
        np.testing.assert_allclose(tp.coords, ts.coords, atol=1e-5,
                                   err_msg=f"seed {i}")
    # respawn actually engaged: more agents than slots were traced
    assert stats["effective_steps"] > 0
    assert stats["slot_steps"] >= stats["effective_steps"]


def test_trace_pool_recurrent_respawn_resets_carry(rng):
    """GRU tracing model through the pool: a respawned slot must start
    from the INITIAL hidden state, not the dead predecessor's — each
    pool trace equals the seed's fresh individual rollout."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    import elektronn2_tpu.neuromancer as nm
    patch = (5, 5, 5)
    T = 4
    nm.model_manager.reset(seed=7)
    seq = nm.Input([T, 1, 1, *patch], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([1, 1, *patch], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, 8, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=8, name="h0")
    gru = nm.GRU(enc, h0, n_f=8, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    step = nm.Perceptron(scan, 3, activation_func="lin", name="step")
    m = nm.model_manager.getmodel("pool_rec")
    m.designate_nodes(input_node=seq, prediction_node=step)
    m.params["step"]["b"] = jnp.asarray([0.9, 0.3, -0.2], np.float32)

    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=8)
    seeds = rng.uniform(10.0, 14.0, (5, 3)).astype(np.float32)
    traces, stats = dt.trace_pool(seeds, batch_size=2)
    assert stats["consumed"] == 5
    for i, s in enumerate(seeds):
        ref = dt.trace(s)
        np.testing.assert_allclose(traces[i].coords, ref.coords,
                                   atol=1e-4, err_msg=f"seed {i}")


def test_trace_pool_oob_seed_and_budget(rng):
    """An out-of-bounds seed is consumed, yields a seed-only trace, and
    the slot respawns next step; seeds beyond the step budget are
    reported unconsumed, not silently dropped."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    patch = (5, 5, 5)
    m = _ff_step_model(
        w=np.zeros((int(np.prod(patch)), 3), np.float32),
        b=np.array([0.5, 0.1, 0.1], np.float32))
    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=4)
    seeds = np.asarray([[1.0, 1.0, 1.0],        # OOB (margin 3.5)
                        [12.0, 12.0, 12.0],
                        [13.0, 11.0, 12.0]], np.float32)
    traces, stats = dt.trace_pool(seeds, batch_size=2)
    assert stats["consumed"] == 3
    assert len(traces[0].coords) == 1           # seed-only
    assert len(traces[1].coords) > 1
    # tiny budget: only the initial fill can consume
    traces2, stats2 = dt.trace_pool(seeds, batch_size=2, total_steps=4)
    assert stats2["consumed"] < 3
    assert len(traces2) == stats2["consumed"]


def test_shotgun_registry_pool_drain(rng):
    """ShotgunRegistry.run(pool=True): the pool drain registers a trace
    per eligible seed and dedupes later waves against earlier traces."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer, \
        ShotgunRegistry
    patch = (5, 5, 5)
    w = (rng.randn(int(np.prod(patch)), 3) * 0.01).astype(np.float32)
    m = _ff_step_model(w=w, b=np.array([0.8, 0.2, -0.1], np.float32))
    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=6)
    seeds = [rng.uniform(10.0, 14.0, 3) for _ in range(5)]
    reg = ShotgunRegistry(seeds, radius=0.05)   # tiny radius: all trace
    out = reg.run(dt, batch_size=2, pool=True)
    assert len(out) == 5
    # dedupe applies ACROSS waves (within a wave it is relaxed, like the
    # batched drain): 9 overlapping seeds at wave size 8 -> the second
    # wave's seed is covered by the first wave's traces and skipped
    close = [np.array([12.0, 12.0, 12.0]) + 0.05 * i for i in range(9)]
    reg2 = ShotgunRegistry(close, radius=50.0)
    out2 = reg2.run(dt, batch_size=1, pool=True)
    assert len(out2) == 8


def test_device_tracer_rotated_matches_host(rng):
    """rotate_to_heading=True on the DeviceTracer (r4): frame-aligned
    views + local->world step rotation inside the scan must reproduce
    the host Tracer(rotate_to_heading=True) trajectory (tamed step head:
    position feedback amplifies interpolation dtype noise)."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    patch = (5, 5, 5)
    w = (rng.randn(int(np.prod(patch)), 3) * 0.01).astype(np.float32)
    b = np.array([0.7, 0.2, 0.1], np.float32)
    m = _ff_step_model(w=w, b=b, patch=patch)
    vol = rng.rand(1, 26, 26, 26).astype(np.float32)
    K = 6
    host = Tracer(m, vol, max_steps=K, rotate_to_heading=True)
    dev = DeviceTracer(m, vol, max_steps=K, rotate_to_heading=True)
    for seed in ([13.0, 12.5, 11.0], [11.0, 14.0, 13.0]):
        ht = host.trace(seed)
        dt = dev.trace(seed)
        assert len(ht.coords) == len(dt.coords), \
            (len(ht.coords), len(dt.coords))
        np.testing.assert_allclose(dt.coords, ht.coords, atol=5e-3)
    # custom initial heading orients the first view
    h0 = np.array([0.2, 0.9, 0.1], np.float32)
    ht = host.trace([12.0, 12.0, 12.0], initial_heading=h0)
    dt = dev.trace([12.0, 12.0, 12.0], initial_heading=h0)
    assert len(ht.coords) == len(dt.coords)
    np.testing.assert_allclose(dt.coords, ht.coords, atol=5e-3)
    # the rotation genuinely matters: axis-aligned rollout differs
    dev_ax = DeviceTracer(m, vol, max_steps=K)
    ax = dev_ax.trace([13.0, 12.5, 11.0])
    assert not np.allclose(ax.coords, dev.trace([13.0, 12.5, 11.0]).coords,
                           atol=1e-4)


def test_device_tracer_rotated_recurrent_and_pool(rng):
    """Rotated mode with a GRU model through BOTH the plain batch and the
    respawning pool: pool traces equal per-seed rollouts (heading resets
    on respawn), batch equals host."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    import elektronn2_tpu.neuromancer as nm
    patch = (5, 5, 5)
    T = 3
    nm.model_manager.reset(seed=5)
    seq = nm.Input([T, 1, 1, *patch], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([1, 1, *patch], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, 8, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=8, name="h0")
    gru = nm.GRU(enc, h0, n_f=8, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    step = nm.Perceptron(scan, 3, activation_func="lin", name="step")
    m = nm.model_manager.getmodel("rot_rec")
    m.designate_nodes(input_node=seq, prediction_node=step)
    m.params["step"]["w"] = jnp.asarray(
        np.asarray(m.params["step"]["w"]) * 0.05)
    m.params["step"]["b"] = jnp.asarray([0.6, 0.2, -0.1], np.float32)

    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    K = 6
    dev = DeviceTracer(m, vol, max_steps=K, rotate_to_heading=True)
    host = Tracer(m, vol, max_steps=K, rotate_to_heading=True)
    seeds = rng.uniform(10.0, 14.0, (4, 3)).astype(np.float32)
    batch = dev.trace_batch(seeds)
    for i, s in enumerate(seeds):
        ht = host.trace(s)
        assert len(batch[i].coords) == len(ht.coords), f"seed {i}"
        np.testing.assert_allclose(batch[i].coords, ht.coords, atol=5e-3,
                                   err_msg=f"seed {i}")
    traces, stats = dev.trace_pool(seeds, batch_size=2)
    assert stats["consumed"] == 4
    for i in range(4):
        np.testing.assert_allclose(traces[i].coords, batch[i].coords,
                                   atol=1e-5, err_msg=f"pool seed {i}")


def test_trace_pool_chain_equals_individual(rng):
    """Chained waves (r5): stitched cross-wave traces == per-seed
    rollouts. wave_steps is deliberately SMALLER than the trace length
    so live agents must carry across dispatch boundaries."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    patch = (5, 5, 5)
    w = (rng.randn(int(np.prod(patch)), 3) * 0.01).astype(np.float32)
    m = _ff_step_model(w=w, b=np.array([0.5, 0.2, -0.15], np.float32))
    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=10)
    seeds = rng.uniform(10.0, 14.0, (7, 3)).astype(np.float32)
    traces, stats = dt.trace_pool_chain(seeds, batch_size=2,
                                        wave_seeds=3, wave_steps=4)
    assert stats["consumed"] == 7
    assert stats["waves"] >= 2           # chaining actually engaged
    assert len(traces) == 7
    singles = [dt.trace(s) for s in seeds]
    for i, (tp, ts) in enumerate(zip(traces, singles)):
        assert len(tp.coords) == len(ts.coords), \
            (i, len(tp.coords), len(ts.coords))
        np.testing.assert_allclose(tp.coords, ts.coords, atol=1e-5,
                                   err_msg=f"seed {i}")


def test_trace_pool_chain_matches_trace_pool(rng):
    """One big wave (N >= all seeds, wave_steps >= total): chained ==
    single-wave trace_pool traces."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    patch = (5, 5, 5)
    w = (rng.randn(int(np.prod(patch)), 3) * 0.02).astype(np.float32)
    m = _ff_step_model(w=w, b=np.array([0.3, -0.2, 0.25], np.float32))
    vol = rng.rand(1, 26, 26, 26).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=6)
    seeds = np.asarray([[13.0, 12.0, 12.0], [11.5, 13.5, 12.5],
                        [12.5, 11.5, 13.0]], np.float32)
    ref, _ = dt.trace_pool(seeds, batch_size=4)
    got, stats = dt.trace_pool_chain(seeds, batch_size=4, wave_seeds=4,
                                     wave_steps=24)
    assert stats["consumed"] == 3 and len(got) == 3
    for tp, tb in zip(got, ref):
        np.testing.assert_allclose(tp.coords, tb.coords, atol=1e-5)


def test_trace_pool_chain_oob_seed_yields_seed_only_trace(rng):
    """A consumed OOB seed dies instantly but still yields its
    seed-only Trace (trace_pool parity)."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    patch = (5, 5, 5)
    w = (rng.randn(int(np.prod(patch)), 3) * 0.02).astype(np.float32)
    m = _ff_step_model(w=w, b=np.array([0.3, 0.2, 0.2], np.float32))
    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=5)
    seeds = np.asarray([[12.0, 12.0, 12.0], [1.0, 1.0, 1.0],
                        [13.0, 12.5, 12.0]], np.float32)
    traces, stats = dt.trace_pool_chain(seeds, batch_size=2,
                                        wave_seeds=2, wave_steps=8)
    assert stats["consumed"] == 3
    assert len(traces) == 3
    assert len(traces[1].coords) == 1          # seed-only
    np.testing.assert_allclose(traces[1].coords[0], seeds[1], atol=1e-6)


def test_trace_pool_chain_callable_source_and_registry(rng):
    """ShotgunRegistry.run(pool=True) drains through the chained path:
    dedupe between waves still works, trace count preserved."""
    from elektronn2_tpu.data.tracing_utils import (DeviceTracer,
                                                   ShotgunRegistry)
    patch = (5, 5, 5)
    w = (rng.randn(int(np.prod(patch)), 3) * 0.01).astype(np.float32)
    m = _ff_step_model(w=w, b=np.array([0.4, 0.1, -0.1], np.float32))
    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=5)
    far = [np.array([12.0, 12.0, 12.0]) + 3.0 * i * np.array([0, 1, 0])
           for i in range(3)]
    reg = ShotgunRegistry(far, radius=1.0)
    out = reg.run(dt, batch_size=2, pool=True)
    assert len(out) == 3
    # close seeds dedupe across waves (radius covers them)
    close = [np.array([12.0, 12.0, 12.0]) + 0.05 * i for i in range(9)]
    reg2 = ShotgunRegistry(close, radius=50.0)
    out2 = reg2.run(dt, batch_size=1, pool=True)
    assert len(out2) == 8       # wave of 8 together, 9th deduped


def test_trace_pool_chain_recurrent_state_crosses_waves(rng):
    """r5 fuzz catch: the chained body must merge rnn_new after the
    step — a GRU agent crossing a wave boundary otherwise rolls out
    with frozen recurrent state (found by the tracing fuzz family,
    seed 0; feedforward tests can't see it)."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    import elektronn2_tpu.neuromancer as nm
    patch = (5, 5, 5)
    T = 3
    nm.model_manager.reset(seed=9)
    seq = nm.Input([T, 1, 1, *patch], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([1, 1, *patch], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, 8, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=8, name="h0")
    gru = nm.GRU(enc, h0, n_f=8, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    step = nm.Perceptron(scan, 3, activation_func="lin", name="step")
    m = nm.model_manager.getmodel("chain_rec")
    m.designate_nodes(input_node=seq, prediction_node=step)
    m.params["step"]["w"] = jnp.asarray(
        np.asarray(m.params["step"]["w"]) * 0.05)
    m.params["step"]["b"] = jnp.asarray([0.5, 0.15, -0.1], np.float32)
    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=8)
    seeds = rng.uniform(10.0, 14.0, (5, 3)).astype(np.float32)
    ref = dt.trace_batch(seeds)
    got, stats = dt.trace_pool_chain(seeds, batch_size=2, wave_seeds=2,
                                     wave_steps=3)
    assert stats["waves"] >= 3
    for i in range(5):
        assert len(got[i].coords) == len(ref[i].coords), i
        np.testing.assert_allclose(got[i].coords, ref[i].coords,
                                   atol=1e-5, err_msg=f"seed {i}")
