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
    # NOTE: must run BEFORE any other JAX call — touching jax.devices()/
    # process_count() here would initialise the local-only backend and make
    # distributed init impossible. Idempotence is handled by catching the
    # runtime's own already-initialised error below.
    kwargs = {}
    if coordinator_address:
        if num_processes is None or process_id is None:
            raise ValueError("coordinator_address requires num_processes "
                             "and process_id")
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=int(num_processes),
                      process_id=int(process_id))
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        msg = str(e).lower()
        if "already" in msg:
            logger.debug("jax.distributed already initialised")
        elif kwargs:
            # an explicit multi-host request that failed is an error, not
            # a debug line — silently continuing would train N independent
            # un-synchronised copies
            raise
        else:
            logger.warning(f"jax.distributed.initialize failed "
                           f"(single-host run assumed): {e}")
    except ValueError as e:
        # auto-detect found no cluster env: plain single-host run
        logger.debug(f"jax.distributed auto-detect: {e}")
    logger.info(f"process {jax.process_index()}/{jax.process_count()}, "
                f"{jax.local_device_count()} local / "
                f"{jax.device_count()} global devices")


def global_mesh(axes=None):
    """Mesh over ALL processes' devices (data axis spans DCN by default)."""
    from elektronn2_tpu.parallel.mesh import make_mesh
    return make_mesh(axes=axes, devices=jax.devices())


def is_main_process():
    return jax.process_index() == 0
