"""tracing3d — recurrent neurite-tracing example/config.

Reference: the tracing example driving ``TracingTrainer`` with ``AgentData``
(SURVEY.md §4.D): a conv encoder feeds a GRU iterated by ScanN over a
skeleton-following flight path; the loss is the squared error of predicted
step vectors vs skeleton direction targets.

Run:  elektronn2-train examples/tracing3d.py --cpu --n-steps 50
(Uses a synthetic volume + helix skeleton when no real data is configured.)
"""

import numpy as np

save_name = "tracing3d"
batch_size = 2
n_steps = 500
history_freq = 100
save_freq = 0
optimiser = "Adam"
optimiser_params = {"lr": 1e-3}
n_workers = 0          # tracing batches are stateful; keep in-process

N_SCAN = 6
PATCH = (7, 7, 7)


def _make_data():
    from elektronn2_tpu.data.cnndata import AgentData
    from elektronn2_tpu.data.skeleton import SkeletonMFK
    rng = np.random.RandomState(0)
    vol = rng.rand(1, 48, 48, 48).astype(np.float32)
    lab = (vol[0] > 0.5).astype(np.int16)
    ad = AgentData(input_data=[vol], target_data=[lab])
    ad.set_geometry(PATCH)
    # helix skeleton through the volume
    t = np.linspace(0, 4 * np.pi, 60)
    pos = np.stack([10 + t * 28 / (4 * np.pi),
                    24 + 10 * np.cos(t), 24 + 10 * np.sin(t)], 1)
    ad.skeletons = [SkeletonMFK(pos, [(i, i + 1) for i in range(59)])]
    return ad


_data = _make_data()


def _trainer_factory(exp):       # hook used by elektronn2-train for tracing
    from elektronn2_tpu.training.trainer import TracingTrainer
    return TracingTrainer(exp, data=_data, n_scan_steps=N_SCAN)


trainer_class = "TracingTrainer"
trainer_kwargs = {"n_scan_steps": N_SCAN}
data_instance = _data


def create_model():
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset()
    T, B = N_SCAN, batch_size
    seq = nm.Input([T, B, 1, *PATCH], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([B, 1, *PATCH], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, 32, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=32, name="h0")
    gru = nm.GRU(enc, h0, n_f=32, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    step_vec = nm.Perceptron(scan, 3, activation_func="lin", name="step")
    tgt = nm.Input([T, B, 3], "s,b,f", name="target")
    loss = nm.AggregateLoss(nm.SquaredLoss(step_vec, tgt), name="loss")
    model = nm.model_manager.getmodel("tracing3d")
    model.designate_nodes(input_node=seq, target_node=tgt, loss_node=loss,
                          prediction_node=step_vec)
    return model


def rollout_demo(model, n_agents=8, max_steps=64,
                 kzip_path="tracing3d-traces.k.zip"):
    """Post-training inference: batched agent rollout fused on device
    (one dispatch for the whole batch — see DeviceTracer), exported as a
    KNOSSOS .k.zip annotation — the reference's deployment hand-off
    (``skeleton.py::trace_to_kzip``)."""
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    vol = _data.train_d[0]          # the (f, Z, X, Y) training cube
    tracer = DeviceTracer(model, np.asarray(vol, np.float32),
                          max_steps=max_steps)
    rng = np.random.RandomState(2)
    seeds = rng.uniform(12, 36, size=(n_agents, 3))
    traces = tracer.trace_batch(seeds, save_kzip=kzip_path)
    for i, t in enumerate(traces):
        print(f"agent {i}: {len(t.coords)} points, "
              f"end={np.round(t.coords[-1], 1)}")
    print(f"traces written to {kzip_path} (KNOSSOS-loadable)")
    return traces


if __name__ == "__main__":
    from elektronn2_tpu.scripts.train import main
    import sys
    main([__file__] + sys.argv[1:])
