"""serve_knossos — production dense-serving example (runnable script).

The deployment half of the reference workflow (`KnossosArray` tiles →
`predict_dense` → KNOSSOS output, SURVEY.md §4.B), TPU-style: stage slabs
from a KNOSSOS dataset, sweep them ON DEVICE via the dilated MFP path with
the measured serving knobs, write the prediction back as KNOSSOS uint8
maps. Mirrors what `elektronn2-predict DIR --slab-batch 2 --bf16` does,
as an editable script.

Run (self-contained — synthesises a dataset + model if none given):

    python examples/serve_knossos.py [MODEL.mdl KNOSSOS_DIR OUT_DIR]

Serving knobs demonstrated (measured numbers: docs/tpu_performance.md):
- slab size: bigger amortises per-dispatch overhead (96x512x512 is the
  flagship sweet spot on v5e; here tiny for the demo),
- ``slab_batch=2``: two slabs per dispatch, readback overlapped,
- bf16 conv operands (serving mode, ~0.02 max softmax deviation),
- optional pod scale-out: pass a mesh to shard the slab batch over
  'data' and z over 'space' (halo exchange).
"""

import os
import sys

import numpy as np


def _demo_setup(tmp="/tmp/serve_knossos_demo"):
    """Synthesise a small KNOSSOS dataset + a trained-shape model."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.data.knossos_array import save_knossos

    nm.model_manager.reset(seed=0)
    inp = nm.Input([1, 1, 9, 17, 17], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 12, 3, 2, mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=probs)
    mdl = os.path.join(tmp, "model.mdl")
    os.makedirs(tmp, exist_ok=True)
    m.save(mdl)

    rng = np.random.RandomState(0)
    vol = (rng.rand(32, 64, 64) * 255).astype(np.uint8)
    kdir = os.path.join(tmp, "dataset")
    save_knossos(vol, kdir, exp_name="demo")
    return mdl, kdir, os.path.join(tmp, "out")


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) == 3:
        mdl, kdir, out_dir = argv
    elif argv:
        # partial args must NOT silently fall into the demo (the user
        # would believe their volume was served)
        print("usage: serve_knossos.py MODEL.mdl KNOSSOS_DIR OUT_DIR\n"
              "       (no args: self-contained demo)", file=sys.stderr)
        return 2
    else:
        print("no args — running the self-contained demo")
        mdl, kdir, out_dir = _demo_setup()

    from elektronn2_tpu.data import KnossosArray
    from elektronn2_tpu.data.knossos_array import save_knossos
    from elektronn2_tpu.neuromancer.model import modelload
    from elektronn2_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    model = modelload(mdl)
    model.set_compute_dtype("bfloat16")     # serving mode
    model.set_dilated_impl("s2bg", zfold=True)   # measured-best lowering

    ka = KnossosArray(kdir)
    # production: step=[96, 512, 512] on v5e; small here for the demo.
    # mesh=make_mesh({"data": 2, "space": 4}) adds pod scale-out.
    pred = model.sweep_knossos(ka, step=[16, 32, 32], slab_batch=2,
                               verbose=True)

    for c in range(pred.shape[0]):
        u8 = np.clip(pred[c] * 255.0, 0, 255).astype(np.uint8)
        save_knossos(u8, os.path.join(out_dir, f"c{c}"),
                     exp_name=f"pred_c{c}")
    print(f"wrote {pred.shape[0]} channel maps under {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
