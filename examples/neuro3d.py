"""neuro3d — the flagship 3D EM segmentation example/config.

Reference: ``examples/neuro3d.py`` — a small 3D image-to-image CNN on the
``neuro_data_zxy`` EM cubes (the CPU-parity config named in BASELINE.json).
The download server is unreachable in this environment, so if the real
cubes are absent a structurally similar synthetic dataset (smooth 3D noise
with thresholded membrane-like boundaries) is generated — same shapes,
same pipeline, same model.

Run:  elektronn2-train examples/neuro3d.py  [--cpu] [--n-steps N]
"""

import os

import numpy as np

# ------------------------------------------------------ trainer variables
save_name = "neuro3d"
batch_size = 1
n_steps = 3000
max_runtime = 4 * 3600
history_freq = 200
save_freq = 1000
preview_freq = 0
monitor_batch_size = 2
optimiser = "Adam"
optimiser_params = {"lr": 1e-3, "wd": 0.5e-4}
schedules = {"lr": {"dec": 0.98, "interval": 500}}
n_workers = 2
data_class = "BatchCreatorImage"
data_batch_args = {"grey_augment_channels": [0], "warp": 0.5}

_DATA_DIR = os.environ.get("NEURO_DATA_DIR",
                           os.path.expanduser("~/neuro_data_zxy"))


def _synthetic_neuro_cubes(n=3, shape=(40, 120, 120), seed=0):
    """EM-lookalike cubes: smooth noise; labels = membrane/intracellular."""
    from scipy import ndimage
    rng = np.random.RandomState(seed)
    raws, labs = [], []
    for i in range(n):
        field = ndimage.gaussian_filter(rng.randn(*shape), (2, 6, 6))
        lab = (np.abs(field) < 0.08).astype(np.int16)   # thin "membranes"
        raw = (0.55 + 0.3 * np.tanh(field * 4)
               + 0.08 * rng.randn(*shape)).clip(0, 1).astype(np.float32)
        raws.append(raw[None])
        labs.append(lab)
    return raws, labs


def _load_data():
    files = [(f"raw_{i}.h5", "raw") for i in range(3)]
    lfiles = [(f"barrier_{i}.h5", "lab") for i in range(3)]
    if os.path.isdir(_DATA_DIR) and all(
            os.path.exists(os.path.join(_DATA_DIR, f))
            for f, _ in files + lfiles):   # raws AND labels must exist
        return {"d_path": _DATA_DIR, "l_path": _DATA_DIR,
                "d_files": files, "l_files": lfiles, "valid_cubes": [2]}
    raws, labs = _synthetic_neuro_cubes()
    return {"input_data": raws, "target_data": labs, "valid_cubes": [2]}


data_init_kwargs = _load_data()


def create_model():
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.utils.cnncalculator import cnncalculator

    filters = [(1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3)]
    pools = [(1, 2, 2), (1, 2, 2), (1, 1, 1), (1, 1, 1)]
    nof = [20, 30, 40, 40]
    calc = cnncalculator(filters, pools, desired_patch_size=[23, 103, 103],
                         mfp=False, ndim=3)
    z, x, y = calc.input

    nm.model_manager.reset()
    inp = nm.Input([batch_size, 1, z, x, y], "b,f,z,x,y", name="raw")
    h = inp
    for i, (f, p, nf) in enumerate(zip(filters, pools, nof)):
        h = nm.Conv(h, nf, f, p, name=f"conv{i}")
    out = nm.Conv(h, 2, 1, 1, activation_func="lin", name="barrier")
    probs = nm.Softmax(out, name="probs")
    tgt = nm.Input([probs.shape["b"], *probs.shape.spatial_shape],
                   "b,z,x,y", dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True,
                            class_weights=np.array([1.0, 2.0],
                                                   np.float32),
                            name="nll")
    loss = nm.AggregateLoss(nll, name="loss")
    err = nm.Errors(probs, tgt, target_is_sparse=True)
    model = nm.model_manager.getmodel("neuro3d")
    model.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs, error_node=err)
    return model


if __name__ == "__main__":
    from elektronn2_tpu.scripts.train import main
    import sys
    main([__file__] + sys.argv[1:])
