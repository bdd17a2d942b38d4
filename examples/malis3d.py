"""malis3d — affinity segmentation with the MALIS structured loss.

Reference workload: Turaga-style maximin-affinity training (SURVEY.md
§3.4 native components): a conv net predicts 3 affinity channels
(z/x/y edges), ``MalisNLL`` weights the binary NLL per edge by
maximin pair counts (C++ union-find core on the host via pure_callback,
exactly the reference's custom-Theano-op structure).

Run:  elektronn2-train examples/malis3d.py --cpu --n-steps 100
"""

import numpy as np

save_name = "malis3d"
batch_size = 1
n_steps = 500
history_freq = 0
save_freq = 0
optimiser = "Adam"
optimiser_params = {"lr": 1e-3}
n_workers = 0
data_class = "BatchCreatorImage"
data_batch_args = {"warp": 0.0}

PATCH = (8, 24, 24)


def _synth_data():
    """Synthetic label cubes with distinct objects + matching raw."""
    from scipy import ndimage
    rng = np.random.RandomState(0)
    raws, labs = [], []
    for i in range(2):
        field = ndimage.gaussian_filter(rng.randn(24, 48, 48), (2, 4, 4))
        seg, _ = ndimage.label(field > 0)
        labs.append(seg.astype(np.int16))
        raws.append((0.5 + 0.4 * np.tanh(field * 3)
                     + 0.05 * rng.randn(24, 48, 48)
                     ).clip(0, 1).astype(np.float32)[None])
    return raws, labs


def create_model():
    import elektronn2_tpu.neuromancer as nm

    nm.model_manager.reset(seed=0)
    inp = nm.Input([batch_size, 1, *PATCH], "b,f,z,x,y", name="raw")
    h = nm.Conv(inp, 12, (1, 3, 3), (1, 1, 1), name="c0")
    h = nm.Conv(h, 24, (3, 3, 3), (1, 1, 1), name="c1")
    aff = nm.Conv(h, 3, 1, 1, activation_func="sig", name="aff")
    seg = nm.Input([batch_size, *aff.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    mal = nm.MalisNLL(aff, None, seg, name="malis")
    loss = nm.AggregateLoss(mal, name="loss")
    model = nm.model_manager.getmodel("malis3d")
    model.designate_nodes(input_node=inp, target_node=seg, loss_node=loss,
                          prediction_node=aff)
    return model


def _data_kwargs():
    raws, labs = _synth_data()
    return {"input_data": raws, "target_data": labs}


data_init_kwargs = _data_kwargs()


if __name__ == "__main__":
    from elektronn2_tpu.scripts.train import main
    import sys
    main([__file__] + sys.argv[1:])
