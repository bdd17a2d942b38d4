"""Reference module path: ``elektronn2/malis/malis_utils.py``.

Affinity-graph utilities (``mknhood3d``, ``seg_to_affgraph``, …) live in
``elektronn2_tpu.malis`` (package root); this module re-exports them under
the reference path for reference-style deep imports through the compat
shim. Same objects, not copies.
"""

from elektronn2_tpu.malis import (  # noqa: F401
    mknhood3d, mknhood2d, mknhood3d_aniso, default_nhood, seg_to_affgraph,
    bmap_to_affgraph, affgraph_to_edgelist, connected_components,
    compute_V_rand_N2,
)

__all__ = [
    "mknhood3d", "mknhood2d", "mknhood3d_aniso", "default_nhood",
    "seg_to_affgraph", "bmap_to_affgraph", "affgraph_to_edgelist",
    "connected_components", "compute_V_rand_N2",
]
