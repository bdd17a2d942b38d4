"""Committed self-golden regression lock.

The BASELINE.json parity gate ("voxel values match the Theano reference
within float tolerance") stays blocked on the empty reference mount, so
this locks the next-best thing: a committed golden file generated from
this framework's own oracle path (r2), checked through the SAME harness
that will check the real reference golden (scripts/parity_vs_reference.py
schema). Any semantic drift in conv/pool/MFP/softmax numerics — across
refactors, JAX upgrades, or lowering rewrites — fails this test instead
of silently shifting every downstream result.

Regenerate (only after an INTENDED numeric change, with a changelog note):
    python scripts/parity_vs_reference.py tests/golden/self_golden.h5 \
        --make-self-golden --cpu
"""

import importlib.util
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "self_golden.h5")
HARNESS = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                       "parity_vs_reference.py")


def _harness():
    spec = importlib.util.spec_from_file_location("parity_harness", HARNESS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_self_golden_locked():
    assert os.path.exists(GOLDEN), "committed golden file missing"
    assert _harness().main([GOLDEN, "--cpu"]) == 0


GOLDEN_UNET = os.path.join(os.path.dirname(__file__), "golden",
                           "self_golden_unet.h5")


def test_self_golden_unet_locked():
    """Decoder-family lock: UpConv/FaithlessMerge/Crop numerics through
    the convolutional dense path (the second dense lowering).
    Regenerate: parity_vs_reference.py ... --make-self-golden --family
    unet (only after an INTENDED numeric change)."""
    assert os.path.exists(GOLDEN_UNET), "committed unet golden missing"
    assert _harness().main([GOLDEN_UNET, "--cpu"]) == 0


def test_self_golden_unet_catches_drift(tmp_path):
    import h5py
    import shutil
    bad = str(tmp_path / "drifted_unet.h5")
    shutil.copy(GOLDEN_UNET, bad)
    with h5py.File(bad, "r+") as f:
        w = f["w2"][()]              # the UpConv weights specifically
        w[0, 0, 0, 0, 0] += 0.25
        del f["w2"]
        f.create_dataset("w2", data=w)
    assert _harness().main([bad, "--cpu"]) == 1


def test_self_golden_unet_convdense_leg_catches_drift(tmp_path):
    """The conv-dense dataset is checked through its OWN lowering
    (convolutional_dense_forward), not the tiled oracle: perturbing only
    probs_convdense must fail even though the tiled leg still passes
    (review r2 s15 — previously the lock never executed the conv-dense
    path at all)."""
    import h5py
    import shutil
    bad = str(tmp_path / "drifted_cd.h5")
    shutil.copy(GOLDEN_UNET, bad)
    with h5py.File(bad, "r+") as f:
        assert "probs_convdense" in f, "golden missing the conv-dense leg"
        p = f["probs_convdense"][()]
        p[0, 0, 0, 0] += 0.25
        del f["probs_convdense"]
        f.create_dataset("probs_convdense", data=p)
    assert _harness().main([bad, "--cpu"]) == 1


def test_self_golden_catches_drift(tmp_path):
    """The harness actually fails when voxels drift (guards against a
    vacuous pass): perturb one weight in a copy of the golden."""
    import h5py
    import shutil
    bad = str(tmp_path / "drifted.h5")
    shutil.copy(GOLDEN, bad)
    with h5py.File(bad, "r+") as f:
        w = f["w0"][()]
        w[0, 0, 0, 0, 0] += 0.25
        del f["w0"]
        f.create_dataset("w0", data=w)
    assert _harness().main([bad, "--cpu"]) == 1
