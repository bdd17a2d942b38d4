"""parallel — device-mesh scale-out (DP + spatial context parallelism).

The reference is single-GPU; its only parallelism is host-side data loading
(SURVEY.md §3.7). The TPU-native equivalents built here:

  * Data parallelism: batch sharded over a ``data`` mesh axis; XLA inserts
    the gradient ``psum`` from sharding annotations (``Model.use_mesh``).
  * Spatial context parallelism (the conv analog of ring attention): volume
    z-axis sharded over a ``space`` mesh axis with per-layer halo exchange
    via ``lax.ppermute`` — valid-mode conv3d over volumes larger than one
    chip's HBM (``halo.py``).
  * Tensor parallelism: GSPMD channel sharding of conv/dense weights over
    a ``model`` mesh axis (``Model.use_mesh(mesh, model_axis=...)``).
  * Pipeline parallelism: GPipe microbatch schedule over a ``pipe`` axis —
    one SPMD program (shard_map + scan + switch + ppermute hand-off), see
    ``pipeline.py``.
  * EP: not applicable (no mixture-of-experts routing in this model
    family — documented reference scope).

All collectives ride ICI within a slice; multi-host via
``jax.distributed.initialize`` composes with the same mesh code.
"""

from elektronn2_tpu.parallel.mesh import make_mesh, mesh_info
from elektronn2_tpu.parallel.halo import (halo_gather, cp_conv_z,
                                          spatial_cp_stack)
from elektronn2_tpu.parallel.spatial_train import (
    make_spatial_dp_trainstep, make_fused_spatial_trainstep,
    pad_target_for_spatial, spatial_tp_shardings)
from elektronn2_tpu.parallel.pipeline import (gpipe_stack, microbatch,
                                              gpipe_reference_loss,
                                              make_gpipe_trainstep,
                                              layers_from_model)

__all__ = ["make_mesh", "mesh_info", "halo_gather", "cp_conv_z",
           "spatial_cp_stack", "make_spatial_dp_trainstep",
           "make_fused_spatial_trainstep",
           "pad_target_for_spatial", "spatial_tp_shardings",
           "gpipe_stack", "microbatch", "gpipe_reference_loss",
           "make_gpipe_trainstep", "layers_from_model"]
