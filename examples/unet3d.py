"""unet3d — encoder/decoder (U-Net-style) segmentation example/config.

Exercises the decoder surface of the node API: ``UpConv`` (transposed conv
inverting a pooling), skip connections via ``FaithlessMerge`` (centre-crop +
concat, the reference's merge node for shape-drifted feature maps).

Run:  elektronn2-train examples/unet3d.py --cpu --n-steps 100

Serving: decoder graphs take the whole-volume convolutional dense path;
the measured v5e champion config is
``model.set_convdense_impl(upconv='d2s', zfold=True, ptail=True)``
(92.9 → 231 Mvox/s f32 at 128×512×512 slabs: zfold/d2s lowerings + the
Pallas tail-conv kernel on the (3,3,3) convs — docs/tpu_performance.md
r2 s13/s14), or ``elektronn2-predict --convdense d2s,zfold,ptail`` /
``--tune``.
"""

import numpy as np

save_name = "unet3d"
batch_size = 1
n_steps = 2000
history_freq = 200
save_freq = 0
optimiser = "Adam"
optimiser_params = {"lr": 1e-3, "clip": 10.0}
n_workers = 0
fused_steps = 8        # host-fed fused chunks: one dispatch per 8 steps
data_class = "BatchCreatorImage"
data_batch_args = {"warp": 0.3}

PATCH = (16, 32, 32)


def _data():
    from scipy import ndimage
    rng = np.random.RandomState(0)
    raws, labs = [], []
    for i in range(2):
        field = ndimage.gaussian_filter(rng.randn(32, 64, 64), (2, 4, 4))
        labs.append((np.abs(field) < 0.1).astype(np.int16))
        raws.append((0.5 + 0.4 * np.tanh(field * 3)
                     + 0.05 * rng.randn(32, 64, 64)
                     ).clip(0, 1).astype(np.float32)[None])
    return {"input_data": raws, "target_data": labs, "valid_cubes": [1]}


data_init_kwargs = _data()


def create_model():
    import elektronn2_tpu.neuromancer as nm

    nm.model_manager.reset()
    inp = nm.Input([batch_size, 1, *PATCH], "b,f,z,x,y", name="raw")
    enc0 = nm.Conv(inp, 12, (1, 3, 3), (1, 1, 1), name="enc0")   # skip src
    enc1 = nm.Conv(enc0, 24, (3, 3, 3), (1, 2, 2), name="enc1")
    enc2 = nm.Conv(enc1, 24, (3, 3, 3), (1, 1, 1), name="enc2")
    up = nm.UpConv(enc2, 12, (1, 2, 2), activation_func="relu", name="up")
    merged = nm.FaithlessMerge(up, enc0, name="merge")
    dec = nm.Conv(merged, 16, (1, 3, 3), (1, 1, 1), name="dec")
    out = nm.Conv(dec, 2, 1, 1, activation_func="lin", name="cls")
    probs = nm.Softmax(out, name="probs")
    tgt = nm.Input([probs.shape["b"], *probs.shape.spatial_shape],
                   "b,z,x,y", dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True, name="nll")
    loss = nm.AggregateLoss(nll, name="loss")
    err = nm.Errors(probs, tgt, target_is_sparse=True)
    model = nm.model_manager.getmodel("unet3d")
    model.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs, error_node=err)
    return model


if __name__ == "__main__":
    from elektronn2_tpu.scripts.train import main
    import sys
    main([__file__] + sys.argv[1:])
