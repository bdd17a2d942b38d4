"""Device-selection compat shim.

Reference: ``elektronn2/utils/gpu.py`` — Theano-era helpers old configs
and scripts call at startup (``initgpu`` to claim a CUDA device before
importing theano, ``get_free_gpu`` to pick one by utilisation). Device
management is JAX's job now, so these map onto `jax.devices()`:

- ``initgpu(gpu)``: 'auto'/'none'/None/int accepted like the reference;
  logs what JAX actually selected (selection itself happens at backend
  init — there is nothing to claim up front), forces the CPU backend for
  ``'none'`` / ``'cpu'``.
- ``get_free_gpu()``: index of the first accelerator device (JAX owns
  every visible device in its process, so "free" ≙ "first").

Kept so reference-style ``from elektronn2.utils import gpu;
gpu.initgpu(args.gpu)`` startup code runs unchanged under the compat
shim.
"""

from __future__ import annotations

from elektronn2_tpu.log import logger


def initgpu(gpu="auto"):
    """Accepts the reference's ``--gpu`` values: 'auto', 'none', 'cpu',
    None, or a device index. Returns the selected jax device (or None
    for the CPU backend)."""
    import jax

    if gpu in ("none", "cpu"):
        jax.config.update("jax_platforms", "cpu")
        logger.info("initgpu: CPU backend forced")
        return None
    devices = jax.devices()
    accel = [d for d in devices if d.platform != "cpu"]
    if not accel:
        logger.info(f"initgpu: no accelerator — using {devices[0]}")
        return devices[0]
    if gpu in ("auto", None):
        dev = accel[0]
    else:
        idx = int(gpu)
        if idx >= len(accel):
            raise ValueError(f"initgpu: device index {idx} out of range "
                             f"({len(accel)} accelerator(s))")
        dev = accel[idx]
    logger.info(f"initgpu: using {dev}")
    return dev


def get_free_gpu(wait=0, nb_gpus=-1):
    """Index of the first accelerator device (-1 if none). The reference
    polled nvidia-smi utilisation; JAX owns all visible devices in this
    process, so the first one is 'free' by construction. ``wait`` and
    ``nb_gpus`` are accepted for signature compatibility."""
    import jax

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    return 0 if accel else -1
