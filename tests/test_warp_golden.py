"""Committed warp-oracle numeric lock (fourth self-golden).

The host ``warp_slice`` (data/transformations.py) is the PARITY ORACLE
for the whole augmentation stack: the device gather path is tested
voxel-equal against it and the separable path bound against it
(PARITY.md taxonomy). If the oracle itself drifts, every downstream
parity claim silently re-bases — so this pins a seeded warped patch
(rotation + shear + scale + flip + elastic, image trilinear + label
nearest; reference: ``transformations.py::warp_slice``).

Regenerate (ONLY after an intended numeric change, with a changelog
note):
    ELEKTRONN2_TPU_REGEN_GOLDEN=1 python -m pytest \
        tests/test_warp_golden.py -q
"""

import json
import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "warp_lock.json")


def _warp():
    from elektronn2_tpu.data.transformations import (
        get_random_warp_params, make_warp_matrix, warp_slice)

    rng = np.random.RandomState(123)
    img = rng.rand(2, 28, 30, 30).astype(np.float32)
    lab = (rng.rand(28, 30, 30) * 4).astype(np.int16)
    params = get_random_warp_params(rng, amount=0.7)
    patch = (10, 12, 12)
    M = make_warp_matrix(**params)
    d, t = warp_slice(img, patch, M=M, position=(14, 15, 15), target=lab,
                      target_patch_size=(8, 10, 10), rng=rng,
                      elastic_params={"grid": 4, "sigma": 1.5})
    d = np.asarray(d, np.float64)
    t = np.asarray(t, np.float64)
    return {
        "img_sum": round(float(d.sum()), 4),
        "img_corner": [round(float(v), 6)
                       for v in d[0, 0, 0, :4].tolist()],
        "img_center": [round(float(v), 6)
                       for v in d[1, 5, 6, 4:8].tolist()],
        "lab_hist": np.bincount(t.astype(np.int64).ravel(),
                                minlength=4).tolist(),
        "lab_sum": int(t.sum()),
    }


def test_warp_oracle_locked():
    got = _warp()
    if os.environ.get("ELEKTRONN2_TPU_REGEN_GOLDEN"):
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1)
        return
    assert os.path.exists(GOLDEN), "committed warp_lock.json missing"
    with open(GOLDEN) as f:
        want = json.load(f)
    np.testing.assert_allclose(got["img_sum"], want["img_sum"],
                               rtol=1e-6, err_msg="warped image drifted")
    np.testing.assert_allclose(got["img_corner"], want["img_corner"],
                               atol=1e-5)
    np.testing.assert_allclose(got["img_center"], want["img_center"],
                               atol=1e-5)
    assert got["lab_hist"] == want["lab_hist"], "label warp drifted"
    assert got["lab_sum"] == want["lab_sum"]
