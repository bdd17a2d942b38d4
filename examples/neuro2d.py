"""neuro2d — 2D EM membrane segmentation example/config.

The 2D counterpart of ``neuro3d.py`` (the reference supports 2D and 3D
CNNs with the same node API — SURVEY.md §1): anisotropic data sliced into
2D images, MFP-capable conv stack, on-device 2D augmentation
(`DeviceBatchAugmenter` promotes 2D patches internally).

Run:  elektronn2-train examples/neuro2d.py --cpu --n-steps 200
"""

import numpy as np

save_name = "neuro2d"
batch_size = 8
n_steps = 2000
history_freq = 200
save_freq = 0
optimiser = "Adam"
optimiser_params = {"lr": 1e-3, "clip": 10.0}
n_workers = 0
data_class = "DeviceBatchAugmenter"
data_batch_args = {"warp": 0.5}

PATCH = (64, 64)


def _synth_data():
    """Synthetic membrane-like 2D images (replace with your own)."""
    from scipy import ndimage
    rng = np.random.RandomState(0)
    raws, labs = [], []
    for i in range(3):
        field = ndimage.gaussian_filter(rng.randn(256, 256), 4)
        labs.append((np.abs(field) < 0.08).astype(np.int16))
        raws.append((0.5 + 0.4 * np.tanh(field * 4)
                     + 0.05 * rng.randn(256, 256)
                     ).clip(0, 1).astype(np.float32)[None])
    return raws, labs


def create_model():
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.utils.cnncalculator import cnncalculator

    filters = [3, 3, 3, 3]
    pools = [2, 2, 1, 1]
    nof = [24, 36, 48, 48]
    calc = cnncalculator(filters, pools, desired_patch_size=list(PATCH),
                         mfp=False, ndim=2)
    x, y = calc.input
    nm.model_manager.reset(seed=0)
    inp = nm.Input([batch_size, 1, x, y], "b,f,x,y", name="raw")
    h = inp
    for i, (f, p, nf) in enumerate(zip(filters, pools, nof)):
        h = nm.Conv(h, nf, f, p, name=f"conv{i}")
    out = nm.Conv(h, 2, 1, 1, activation_func="lin", name="mem")
    probs = nm.Softmax(out, name="probs")
    tgt = nm.Input([batch_size, *probs.shape.spatial_shape], "b,x,y",
                   dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True, name="nll")
    loss = nm.AggregateLoss(nll, name="loss")
    err = nm.Errors(probs, tgt, target_is_sparse=True)
    model = nm.model_manager.getmodel("neuro2d")
    model.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs, error_node=err)
    return model


def _data_kwargs():
    raws, labs = _synth_data()
    from elektronn2_tpu.utils.cnncalculator import cnncalculator
    filters = [3, 3, 3, 3, 1]
    pools = [2, 2, 1, 1, 1]
    calc = cnncalculator(filters, pools, desired_patch_size=list(PATCH),
                         mfp=False, ndim=2)
    return {"raws": raws, "labels": labs,
            "patch_size": tuple(calc.input),
            "target_size": tuple(calc.output),
            "target_strides": tuple(calc.pred_stride),
            "warp_amount": 0.5, "grey_channels": [0],
            "valid_cubes": [2]}


data_init_kwargs = _data_kwargs()


if __name__ == "__main__":
    from elektronn2_tpu.scripts.train import main
    import sys
    main([__file__] + sys.argv[1:])
