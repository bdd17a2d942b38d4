"""unet3d_wide — width-realistic 3D U-Net (64->128->256 encoder channels).

The flagship neuro3d family (20-40 channels) is structurally lane-
underfilled on the MXU (its 200 Mvox/s serving ceiling is the model's
N=40, not the framework's — docs/tpu_performance.md). Modern EM
segmentation nets run 64-256 channels, where the 128-lane MXU dim
actually fills; this config is the generality probe (VERDICT r3 #3):
anisotropic EM-style early stages, two x/y pooling levels, transposed-
conv decoder with skip merges, channel widths 64/128/256.

Run:   elektronn2-train examples/unet3d_wide.py --cpu --n-steps 20
Bench: python scripts/exp_wide_unet.py   (serving + training MFU
       campaign on the live device; results in docs/tpu_performance.md)

Serving: decoder graph -> whole-volume convolutional dense path; the
measured lowering knobs are reported by the campaign script.
"""

import numpy as np

save_name = "unet3d_wide"
batch_size = 1
n_steps = 2000
history_freq = 200
save_freq = 0
optimiser = "Adam"
optimiser_params = {"lr": 1e-3, "clip": 10.0}
n_workers = 0
fused_steps = 4
data_class = "BatchCreatorImage"
data_batch_args = {"warp": 0.3}

PATCH = (16, 64, 64)
WIDTHS = (64, 128, 256)


def _data():
    from scipy import ndimage
    rng = np.random.RandomState(0)
    raws, labs = [], []
    for i in range(2):
        field = ndimage.gaussian_filter(rng.randn(32, 96, 96), (2, 4, 4))
        labs.append((np.abs(field) < 0.1).astype(np.int16))
        raws.append((0.5 + 0.4 * np.tanh(field * 3)
                     + 0.05 * rng.randn(32, 96, 96)
                     ).clip(0, 1).astype(np.float32)[None])
    return {"input_data": raws, "target_data": labs, "valid_cubes": [1]}


data_init_kwargs = _data()


def create_model(batch=None, patch=None, widths=None):
    import elektronn2_tpu.neuromancer as nm

    b = batch or batch_size
    p = tuple(patch or PATCH)
    w0, w1, w2 = widths or WIDTHS
    nm.model_manager.reset()
    inp = nm.Input([b, 1, *p], "b,f,z,x,y", name="raw")
    # level 0 (full res, anisotropic — EM z is coarse)
    e0a = nm.Conv(inp, w0, (1, 3, 3), (1, 1, 1), name="e0a")
    e0b = nm.Conv(e0a, w0, (1, 3, 3), (1, 2, 2), name="e0b")   # pool ->L1
    # level 1
    e1a = nm.Conv(e0b, w1, (3, 3, 3), (1, 1, 1), name="e1a")
    e1b = nm.Conv(e1a, w1, (3, 3, 3), (1, 2, 2), name="e1b")   # pool ->L2
    # level 2 (bottleneck)
    bott = nm.Conv(e1b, w2, (3, 3, 3), (1, 1, 1), name="bott")
    # decoder
    u1 = nm.UpConv(bott, w1, (1, 2, 2), activation_func="relu", name="u1")
    m1 = nm.FaithlessMerge(u1, e1a, name="m1")
    d1 = nm.Conv(m1, w1, (3, 3, 3), (1, 1, 1), name="d1")
    u0 = nm.UpConv(d1, w0, (1, 2, 2), activation_func="relu", name="u0")
    m0 = nm.FaithlessMerge(u0, e0a, name="m0")
    d0 = nm.Conv(m0, w0, (1, 3, 3), (1, 1, 1), name="d0")
    out = nm.Conv(d0, 2, 1, 1, activation_func="lin", name="cls")
    probs = nm.Softmax(out, name="probs")
    tgt = nm.Input([probs.shape["b"], *probs.shape.spatial_shape],
                   "b,z,x,y", dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True, name="nll")
    loss = nm.AggregateLoss(nll, name="loss")
    err = nm.Errors(probs, tgt, target_is_sparse=True)
    model = nm.model_manager.getmodel("unet3d_wide")
    model.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs, error_node=err)
    return model


if __name__ == "__main__":
    from elektronn2_tpu.scripts.train import main
    import sys
    main([__file__] + sys.argv[1:])
