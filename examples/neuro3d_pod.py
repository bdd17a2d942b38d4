"""neuro3d_pod — the flagship config scaled out over a device mesh from
the CONFIG SURFACE: ``mesh_axes`` shards training data-parallel (add a
``"model"`` axis for tensor parallelism) via ``Model.use_mesh``; XLA
inserts the gradient ``psum`` over ICI. Everything else is the ordinary
neuro3d workflow — the mesh is one config key.

On a pod slice this is `mesh_axes = {"data": n_chips}`. The config reads
the actual device count so it also runs on one chip (mesh of 1) and on
the 8-device virtual CPU mesh used by the tests.

Run:  elektronn2-train examples/neuro3d_pod.py --n-steps 500
"""

import numpy as np

save_name = "neuro3d_pod"
n_steps = 2000
history_freq = 200
save_freq = 0
optimiser = "Adam"
optimiser_params = {"lr": 1e-3, "clip": 10.0}
n_workers = 0
data_class = "DeviceBatchAugmenter"
data_batch_args = {"warp": 0.3}
fused_steps = 8        # composes with the mesh: DP fused chunks
                       # (bit-identical to single-device — tests)


def _n_devices():
    import jax
    return len(jax.devices())


mesh_axes = {"data": _n_devices()}
batch_size = max(4, _n_devices())      # global batch, sharded over 'data'

PATCH = (9, 27, 27)


def _synth_data():
    from scipy import ndimage
    rng = np.random.RandomState(0)
    raws, labs = [], []
    for i in range(2):
        field = ndimage.gaussian_filter(rng.randn(32, 64, 64), (1, 2, 2))
        labs.append((np.abs(field) < 0.12).astype(np.int16))
        raws.append((0.5 + 0.4 * np.tanh(field * 3)
                     + 0.05 * rng.randn(32, 64, 64)
                     ).clip(0, 1).astype(np.float32)[None])
    return raws, labs


FILTERS = [(1, 3, 3), (3, 3, 3), 1]
POOLS = [(1, 2, 2), (1, 1, 1), 1]
NOF = [12, 16, 2]


def create_model():
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.utils.cnncalculator import cnncalculator

    calc = cnncalculator(FILTERS[:-1], POOLS[:-1],
                         desired_patch_size=list(PATCH), mfp=False, ndim=3)
    z, x, y = calc.input
    nm.model_manager.reset(seed=0)
    inp = nm.Input([batch_size, 1, z, x, y], "b,f,z,x,y", name="raw")
    h = inp
    for i, (f, p, nf) in enumerate(zip(FILTERS[:-1], POOLS[:-1],
                                       NOF[:-1])):
        h = nm.Conv(h, nf, f, p, name=f"conv{i}")
    out = nm.Conv(h, 2, 1, 1, activation_func="lin", name="cls")
    probs = nm.Softmax(out, name="probs")
    tgt = nm.Input([batch_size, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    nll = nm.MultinoulliNLL(probs, tgt, target_is_sparse=True, name="nll")
    model = nm.model_manager.getmodel("neuro3d_pod")
    model.designate_nodes(input_node=inp, target_node=tgt,
                          loss_node=nm.AggregateLoss(nll, name="loss"),
                          prediction_node=probs)
    return model


def _data_kwargs():
    from elektronn2_tpu.utils.cnncalculator import cnncalculator
    raws, labs = _synth_data()
    calc = cnncalculator(FILTERS, POOLS, desired_patch_size=list(PATCH),
                         mfp=False, ndim=3)
    return {"raws": raws, "labels": labs,
            "patch_size": tuple(calc.input),
            "target_size": tuple(calc.output),
            "target_strides": tuple(calc.pred_stride),
            "warp_amount": 0.3, "grey_channels": [0]}


data_init_kwargs = _data_kwargs()


if __name__ == "__main__":
    from elektronn2_tpu.scripts.train import main
    import sys
    sys.exit(main([__file__] + sys.argv[1:]))
