"""data — volumetric pipeline: loading, augmentation, batch creation.

Reference: ``elektronn2/data/``.
"""

from elektronn2_tpu.data.transformations import (
    warp_slice, WarpingOOBError, make_warp_matrix, get_random_warp_params,
    map_coordinates_linear, map_coordinates_nearest,
)
from elektronn2_tpu.data.image import greyAugment, ids2barriers, smearbarriers

__all__ = [
    "warp_slice", "WarpingOOBError", "make_warp_matrix",
    "get_random_warp_params", "map_coordinates_linear",
    "map_coordinates_nearest", "greyAugment", "ids2barriers", "smearbarriers",
]

try:
    from elektronn2_tpu.data.cnndata import (  # noqa: F401
        BatchCreatorImage, GridData, AgentData,
    )
    from elektronn2_tpu.data.knossos_array import (  # noqa: F401
        KnossosArray, KnossosArrayMulti,
    )
    __all__ += ["BatchCreatorImage", "GridData", "AgentData",
                "KnossosArray", "KnossosArrayMulti"]
except ImportError:  # pragma: no cover
    pass

try:
    # HBM-resident augmentation pipeline (usable as a data_class in configs)
    from elektronn2_tpu.ops.warp import DeviceBatchAugmenter  # noqa: F401
    __all__ += ["DeviceBatchAugmenter"]
except ImportError:  # pragma: no cover
    pass
