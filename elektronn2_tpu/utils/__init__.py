"""utils — IO helpers, shape calculator, plotting, misc.

Reference: ``elektronn2/utils/``.
"""

from elektronn2_tpu.utils.cnncalculator import (
    cnncalculator, get_valid_patch_sizes, get_cloesest_valid_patch_size,
    get_closest_valid_patch_size,
)
from elektronn2_tpu.utils.basic import (
    h5save, h5load, picklesave, pickleload, timeit, cache,
    AccumulationArray, DynamicKDT, as_list,
)

__all__ = [
    "cnncalculator", "get_valid_patch_sizes", "get_cloesest_valid_patch_size",
    "get_closest_valid_patch_size",
    "h5save", "h5load", "picklesave", "pickleload", "timeit", "cache",
    "AccumulationArray", "DynamicKDT", "as_list",
]
