"""Profiling and tracing helpers.

Reference: Theano function profiling surfaced via
``graphutils.make_func(profile=...)`` and ``Model.measure_exectimes``, plus
``scripts/elektronn2-profile`` (SURVEY.md §6 tracing/profiling). TPU-native
equivalents: ``jax.profiler`` traces (TensorBoard/Perfetto) and XLA
``cost_analysis`` per compiled function.
"""

from __future__ import annotations

import contextlib
import time

from elektronn2_tpu.log import logger


@contextlib.contextmanager
def trace(logdir="/tmp/jax-trace"):
    """Capture a device trace viewable in TensorBoard/Perfetto.

    Usage:
        with profiling.trace("/tmp/trace"):
            model.trainingstep(d, t)
    """
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        logger.info(f"device trace written to {logdir}")


def cost_analysis(fn, *example_args, **example_kwargs):
    """FLOPs / bytes-accessed estimate of a jitted function via XLA.

    Returns the first computation's cost dict (flops,
    bytes accessed{, operand sizes...}) or {} when unavailable.
    """
    import jax
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    compiled = jitted.lower(*example_args, **example_kwargs).compile()
    costs = compiled.cost_analysis()
    if costs is None:
        return {}
    return dict(costs) if isinstance(costs, dict) else dict(costs[0])


def benchmark(fn, *args, n_warmup=2, n_runs=10, sync=None):
    """Robust wall-clock timing of a device function.

    ``sync``: callable forcing completion (default: block_until_ready on
    the output; pass e.g. ``lambda o: float(jnp.sum(o))`` on transports
    where block_until_ready is unreliable).
    """
    import jax

    def default_sync(o):
        jax.block_until_ready(o)

    sync = sync or default_sync
    for _ in range(n_warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / n_runs
    return dt


def flops_per_second(fn, flops, *args, **bench_kwargs):
    dt = benchmark(fn, *args, **bench_kwargs)
    return flops / dt, dt


def enable_compile_cache(cache_dir=None, min_compile_secs=2.0):
    """Enable JAX's persistent compilation cache (works through the axon
    remote-compile path too: measured 0.6 s vs minutes for the dilated
    dense program in a fresh process). Call BEFORE the first compile.

    Default dir: $ELEKTRONN2_COMPILE_CACHE, else ~/.cache/elektronn2_tpu/xla.
    """
    import os
    import jax
    cache_dir = (cache_dir or os.environ.get("ELEKTRONN2_COMPILE_CACHE")
                 or os.path.expanduser("~/.cache/elektronn2_tpu/xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        logger.debug(f"persistent compilation cache: {cache_dir}")
    except Exception as e:  # never fail the caller over a cache
        logger.warning(f"compilation cache unavailable: {e}")
    return cache_dir
