"""Multi-host (multi-slice) initialisation helpers.

The reference is single-machine; scale across hosts here via JAX's standard
distributed runtime: every host runs the same program, ``initialize()``
wires the global device view, and the existing mesh/DP/CP code works
unchanged (collectives ride ICI within a slice and DCN across slices —
lay out the mesh so the *data* axis spans slices and the *space*/model axes
stay inside one slice).

This module cannot be exercised in the single-host sandbox; it is a thin,
documented veneer over ``jax.distributed`` kept separate so the rest of the
framework has no multi-host conditionals.
"""

from __future__ import annotations

import os

import jax

from elektronn2_tpu.log import logger


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialise the JAX distributed runtime (idempotent).

    On Cloud TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for bring-your-own clusters.
    """
    if jax.process_count() > 1:
        return  # already initialised
    kwargs = {}
    if coordinator_address:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=int(num_processes),
                      process_id=int(process_id))
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # single-host / already-initialised
        logger.debug(f"jax.distributed.initialize skipped: {e}")
    logger.info(f"process {jax.process_index()}/{jax.process_count()}, "
                f"{jax.local_device_count()} local / "
                f"{jax.device_count()} global devices")


def global_mesh(axes=None):
    """Mesh over ALL processes' devices (data axis spans DCN by default)."""
    from elektronn2_tpu.parallel.mesh import make_mesh
    return make_mesh(axes=axes, devices=jax.devices())


def is_main_process():
    return jax.process_index() == 0
