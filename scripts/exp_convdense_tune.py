"""On-chip validation of tune_sweep's decoder (conv-dense) leg: run the
tuner on the unet3d-class bench model at the champion slab and print the
measured table (sustained protocol — same numbers class as
scripts/exp_convdense.py).

Usage: python scripts/exp_convdense_tune.py    (live chip)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_convdense import build_model   # noqa: E402


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    model = build_model()
    res = model.tune_serving(steps=[(64, 384, 384), (96, 512, 512)],
                             slab_batches=(1, 2), K=4, apply=True)
    for row in res["table"]:
        print(row, flush=True)
    print("best:", res["best"], flush=True)
    print("applied:", getattr(model, "_convdense_upconv", None),
          getattr(model, "_convdense_zfold", None),
          getattr(model, "_compute_dtype", None), flush=True)


if __name__ == "__main__":
    main()
