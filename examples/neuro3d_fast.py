"""neuro3d_fast — the flagship 3D EM segmentation config tuned for
maximum TPU throughput: device-resident data (`DeviceBatchAugmenter`,
separable MXU warp), fused multi-step training (`fused_steps`: one device
dispatch per 16 optimisation steps), bf16 compute, TensorBoard scalars,
and crash-safe auto-resume.

Run:  elektronn2-train examples/neuro3d_fast.py --n-steps 2000
"""

import numpy as np

save_name = "neuro3d_fast"
batch_size = 4
n_steps = 5000
history_freq = 400
save_freq = 1000
optimiser = "Adam"
optimiser_params = {"lr": 1e-3, "clip": 10.0}
schedules = {"lr": {"dec": 0.98, "interval": 500}}

# device-resident pipeline → the fused loop can sample on device
data_class = "DeviceBatchAugmenter"
data_batch_args = {"warp": 0.5}
fused_steps = 16          # 16 train steps per dispatch (lax.scan)
resume = True             # pick up <save_name>-LAST.mdl if present
tensorboard = True
n_workers = 0             # no host workers: batches are made on device

PATCH = (15, 55, 55)


def _synth_data():
    """Synthetic EM-like cubes (replace with your own raws/labels)."""
    from scipy import ndimage
    rng = np.random.RandomState(0)
    raws, labs = [], []
    for i in range(3):
        field = ndimage.gaussian_filter(rng.randn(48, 128, 128), (1, 3, 3))
        labs.append((np.abs(field) < 0.12).astype(np.int16))
        raws.append((0.5 + 0.4 * np.tanh(field * 3)
                     + 0.05 * rng.randn(48, 128, 128)
                     ).clip(0, 1).astype(np.float32)[None])
    return raws, labs


def create_model():
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.utils.cnncalculator import cnncalculator

    filters = [(1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3)]
    pools = [(1, 2, 2), (1, 2, 2), (1, 1, 1), (1, 1, 1)]
    nof = [20, 30, 40, 40]
    calc = cnncalculator(filters, pools, desired_patch_size=list(PATCH),
                         mfp=False, ndim=3)
    z, x, y = calc.input
    nm.model_manager.reset(seed=0)
    inp = nm.Input([batch_size, 1, z, x, y], "b,f,z,x,y", name="raw")
    h = inp
    for i, (f, p, nf) in enumerate(zip(filters, pools, nof)):
        h = nm.Conv(h, nf, f, p, name=f"conv{i}")
    out = nm.Conv(h, 2, 1, 1, activation_func="lin", name="cls")
    probs = nm.Softmax(out, name="probs")
    tgt = nm.Input([batch_size, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True, name="nll")
    loss = nm.AggregateLoss(nll, name="loss")
    err = nm.Errors(probs, tgt, target_is_sparse=True)
    model = nm.model_manager.getmodel("neuro3d_fast")
    model.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs, error_node=err)
    model.set_compute_dtype("bfloat16")    # bf16 operands on the MXU
    return model


def _data_kwargs():
    raws, labs = _synth_data()
    # target grid from the shape calculator (no throwaway model build)
    from elektronn2_tpu.utils.cnncalculator import cnncalculator
    filters = [(1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), 1]
    pools = [(1, 2, 2), (1, 2, 2), (1, 1, 1), (1, 1, 1), 1]
    calc = cnncalculator(filters, pools, desired_patch_size=list(PATCH),
                         mfp=False, ndim=3)
    return {"raws": raws, "labels": labs,
            "patch_size": tuple(calc.input),
            "target_size": tuple(calc.output),
            "target_strides": tuple(calc.pred_stride),
            "warp_amount": 0.5, "grey_channels": [0]}


data_init_kwargs = _data_kwargs()


if __name__ == "__main__":
    from elektronn2_tpu.scripts.train import main
    import sys
    main([__file__] + sys.argv[1:])
