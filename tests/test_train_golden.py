"""Committed training-path numeric lock (all four optimisers).

Companion to the dense-path self-goldens (test_parity_golden.py): a
seeded tiny net trained for 4 steps with each optimiser must reproduce
the committed loss sequence and final-parameter checksum exactly (CPU
backend — the suite forces it — is deterministic for a fixed program).
Any silent change to the update rules (reference:
``elektronn2/neuromancer/optimiser.py``: SGD+Nesterov / Adam / AdaGrad /
AdaDelta), the loss lowering, or gradient flow fails here instead of
shifting every training run quietly.

Regenerate (ONLY after an intended numeric change, with a changelog
note):
    ELEKTRONN2_TPU_REGEN_GOLDEN=1 python -m pytest \
        tests/test_train_golden.py -q
"""

import json
import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "train_lock.json")

OPTS = [
    ("SGD", {"lr": 1e-2, "mom": 0.9}),
    ("Adam", {"lr": 1e-3}),
    ("AdaGrad", {"lr": 1e-2}),
    ("AdaDelta", {}),
]


def _run(opt_name, opt_kwargs, n_steps=4):
    import jax
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer import model_manager

    model_manager.reset(seed=13)
    inp = nm.Input([2, 1, 7, 12, 12], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 5, (3, 3, 3), (1, 2, 2), name="c1")
    c2 = nm.Conv(c1, 6, (1, 3, 3), (1, 1, 1), name="c2")
    probs = nm.Softmax(nm.Conv(c2, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([2, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True)
    loss = nm.AggregateLoss(nll)
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt(opt_name, **opt_kwargs)

    rng = np.random.RandomState(99)
    x = rng.rand(2, 1, 7, 12, 12).astype(np.float32)
    y = (rng.rand(2, *probs.shape.spatial_shape) > 0.5).astype(np.int32)
    losses = [float(m.trainingstep(x, y)[0]) for _ in range(n_steps)]
    l1 = float(sum(float(np.abs(np.asarray(v)).sum())
                   for v in jax.tree_util.tree_leaves(m.params)))
    return {"losses": losses, "param_l1": l1}


def test_train_numerics_locked():
    got = {name: _run(name, kw) for name, kw in OPTS}
    if os.environ.get("ELEKTRONN2_TPU_REGEN_GOLDEN"):
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1)
        return
    assert os.path.exists(GOLDEN), "committed train_lock.json missing"
    with open(GOLDEN) as f:
        want = json.load(f)
    assert set(got) == set(want)
    for name in want:
        np.testing.assert_allclose(
            got[name]["losses"], want[name]["losses"], rtol=1e-6,
            err_msg=f"{name}: loss sequence drifted")
        np.testing.assert_allclose(
            got[name]["param_l1"], want[name]["param_l1"], rtol=1e-6,
            err_msg=f"{name}: final params drifted")


def test_train_lock_is_fresh():
    """The committed lock must correspond to the CURRENT graph/optimiser
    code for at least one optimiser run executed independently (guards a
    stale or hand-edited golden)."""
    with open(GOLDEN) as f:
        want = json.load(f)
    got = _run("Adam", {"lr": 1e-3})
    np.testing.assert_allclose(got["losses"], want["Adam"]["losses"],
                               rtol=1e-6)
