"""Device-mesh construction helpers."""

from __future__ import annotations

import numpy as np
import jax

from elektronn2_tpu.log import logger


def make_mesh(axes=None, n_devices=None, devices=None):
    """Build a ``jax.sharding.Mesh``.

    ``axes``: dict {axis_name: size} or list of names (sizes inferred:
    first axis takes all devices). Defaults to one ``data`` axis over all
    local devices.
    """
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if axes is None:
        axes = {"data": n}
    if isinstance(axes, (list, tuple)):
        axes = {axes[0]: n, **{a: 1 for a in axes[1:]}}
    sizes = list(axes.values())
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh axes {axes} do not multiply to {n} devices")
    arr = np.asarray(devices).reshape(sizes)
    mesh = jax.sharding.Mesh(arr, tuple(axes.keys()))
    logger.info(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
                f"over {n} {devices[0].platform} devices")
    return mesh


def mesh_info(mesh):
    return {"axes": dict(zip(mesh.axis_names, mesh.devices.shape)),
            "n_devices": mesh.devices.size,
            "platform": mesh.devices.flat[0].platform}
