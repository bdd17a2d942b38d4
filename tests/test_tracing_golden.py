"""Committed tracing-family numeric lock (third self-golden).

Companions: test_parity_golden.py (both dense lowerings) and
test_train_golden.py (optimiser updates). This one locks the recurrent
tracing stack — GRU cell math, ScanN recurrence, trilinear patch
extraction and the DeviceTracer rollout loop (reference semantics:
``tracing_utils.py::Tracer`` + ``various.py::ScanN``) — by pinning the
full trajectory of a seeded rollout of a seeded random model through a
seeded random volume. Drift in any of those components moves the agent
paths and fails here.

Regenerate (ONLY after an intended numeric change, with a changelog
note):
    ELEKTRONN2_TPU_REGEN_GOLDEN=1 python -m pytest \
        tests/test_tracing_golden.py -q
"""

import json
import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "tracing_lock.json")


def _rollout():
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.data.tracing_utils import DeviceTracer

    T, B = 3, 2
    nm.model_manager.reset(seed=31)
    seq = nm.Input([T, B, 1, 5, 5, 5], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([B, 1, 5, 5, 5], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, 8, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=8, name="h0")
    gru = nm.GRU(enc, h0, n_f=8, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=T, name="scan")
    out = nm.Perceptron(scan, 3, activation_func="lin", name="readout")
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=seq, prediction_node=out)

    rng = np.random.RandomState(17)
    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    tracer = DeviceTracer(m, vol, step_scale=1.5, max_steps=12)
    seeds = np.array([[12.0, 12.0, 12.0], [8.0, 14.0, 10.0]], np.float32)
    traces = tracer.trace_batch(seeds)
    return {
        "n_points": [int(len(t.positions)) for t in traces],
        "finals": [[round(float(v), 5) for v in t.positions[-1]]
                   for t in traces],
        "path_sums": [round(float(np.sum(t.positions)), 4)
                      for t in traces],
    }


def test_tracing_numerics_locked():
    got = _rollout()
    if os.environ.get("ELEKTRONN2_TPU_REGEN_GOLDEN"):
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1)
        return
    assert os.path.exists(GOLDEN), "committed tracing_lock.json missing"
    with open(GOLDEN) as f:
        want = json.load(f)
    assert got["n_points"] == want["n_points"], "rollout length drifted"
    np.testing.assert_allclose(got["finals"], want["finals"], atol=1e-3,
                               err_msg="final agent positions drifted")
    np.testing.assert_allclose(got["path_sums"], want["path_sums"],
                               rtol=1e-5, err_msg="agent paths drifted")
