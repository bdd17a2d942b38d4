"""``elektronn2-train`` — train a model from an experiment config file.

Reference: ``scripts/elektronn2-train`` (arg parsing, device flags before
Theano import, exec config, Trainer(...).run()). Device selection is JAX's
job now; ``--cpu`` forces the host backend for debugging (the analog of the
reference's ``--gpu`` flag).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="elektronn2-train",
        description="Train a model from an exec'd Python experiment config")
    ap.add_argument("config", help="path to the experiment config file")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend (debugging)")
    ap.add_argument("--n-steps", type=int, default=None)
    ap.add_argument("--save-path", default=None)
    ap.add_argument("--profile", default=None, metavar="LOGDIR",
                    help="capture a jax.profiler device trace of steps "
                         "~5-15 into LOGDIR (TensorBoard/Perfetto)")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()    # persistent XLA cache (minutes -> <1 s)

    from elektronn2_tpu.config import ExperimentConfig
    from elektronn2_tpu.training.trainer import Trainer
    from elektronn2_tpu.log import logger

    override = {}
    if args.n_steps is not None:
        override["n_steps"] = args.n_steps
    if args.save_path is not None:
        override["save_path"] = args.save_path
    exp = ExperimentConfig.from_file(args.config, override=override)
    logger.info(f"devices: {jax.devices()}")
    cfg = exp.as_dict()
    trainer_cls = Trainer
    if cfg.get("trainer_class"):
        import elektronn2_tpu.training as tmod
        trainer_cls = getattr(tmod, cfg.pop("trainer_class"))
    tkwargs = dict(cfg.pop("trainer_kwargs", {}) or {})
    data = cfg.pop("data_instance", None)
    trainer = trainer_cls(None, data=data, **cfg, **tkwargs)
    if not args.profile:
        trainer.run()
        return

    # trace a post-warmup window; counts both per-step and fused-chunk
    # dispatch units so fused_steps configs are covered, and always stops
    # the trace on exit (a run shorter than the window would otherwise
    # leave the trace unterminated/unusable)
    state = {"n": 0, "active": False}

    def wrap(obj, attr):
        orig = getattr(obj, attr)

        def traced(*a, **kw):
            state["n"] += 1
            if state["n"] == 3 and not state["active"]:
                jax.profiler.start_trace(args.profile)
                state["active"] = True
            out = orig(*a, **kw)
            if state["n"] == 13 and state["active"]:
                jax.profiler.stop_trace()
                state["active"] = False
                logger.info(f"device trace written to {args.profile}")
            return out

        setattr(obj, attr, traced)

    wrap(trainer.model, "trainingstep")
    from elektronn2_tpu.training import fused_loop
    wrap(fused_loop.FusedTrainLoop, "run_chunk")
    wrap(fused_loop.HostFedFusedLoop, "run_chunk")
    try:
        trainer.run()
    finally:
        if state["active"]:
            jax.profiler.stop_trace()
            logger.info(f"device trace written to {args.profile}")


if __name__ == "__main__":
    main()
