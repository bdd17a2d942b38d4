"""Reference module path: ``elektronn2/utils/utils_basic.py``.

The reference's core helpers live there; this package keeps them in
``elektronn2_tpu.utils.basic`` and re-exports them here so reference-style
imports (``from elektronn2.utils.utils_basic import h5save``) keep working
through the compat shim. Same objects, not copies.
"""

from elektronn2_tpu.utils.basic import (  # noqa: F401
    as_list, h5save, h5load, picklesave, pickleload, timeit, cache,
    AccumulationArray, DynamicKDT, unique_rows, makeversiondir,
    import_variable_from_file, pretty_string_ops, get_free_cpu_count,
    CircularBuffer,
)
from elektronn2_tpu.training.trainutils import pretty_string_time  # noqa: F401

__all__ = [
    "as_list", "h5save", "h5load", "picklesave", "pickleload", "timeit",
    "cache", "AccumulationArray", "DynamicKDT", "unique_rows",
    "makeversiondir", "import_variable_from_file", "pretty_string_ops",
    "get_free_cpu_count", "CircularBuffer", "pretty_string_time",
]
