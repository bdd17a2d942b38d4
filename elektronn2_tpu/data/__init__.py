"""data — volumetric pipeline: loading, augmentation, batch creation.

Reference: ``elektronn2/data/``.
"""

from elektronn2_tpu.data.transformations import (
    warp_slice, WarpingOOBError, make_warp_matrix, get_random_warp_params,
    map_coordinates_linear, map_coordinates_nearest,
)
from elektronn2_tpu.data.image import greyAugment, ids2barriers, smearbarriers
from elektronn2_tpu.data.cnndata import (
    BatchCreatorImage, GridData, AgentData,
)
from elektronn2_tpu.data.knossos_array import (
    KnossosArray, KnossosArrayMulti, save_knossos,
)
from elektronn2_tpu.data.skeleton import SkeletonMFK, Trace, trace_to_kzip
from elektronn2_tpu.ops.warp import DeviceBatchAugmenter

__all__ = [
    "warp_slice", "WarpingOOBError", "make_warp_matrix",
    "get_random_warp_params", "map_coordinates_linear",
    "map_coordinates_nearest", "greyAugment", "ids2barriers", "smearbarriers",
    "BatchCreatorImage", "GridData", "AgentData",
    "KnossosArray", "KnossosArrayMulti", "save_knossos",
    "SkeletonMFK", "Trace", "trace_to_kzip",
    "DeviceBatchAugmenter",
]
