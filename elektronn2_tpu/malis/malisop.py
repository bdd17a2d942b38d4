"""Reference module path: ``elektronn2/malis/malisop.py``.

The reference registered ``malis_weights`` as a custom Theano op here; the
TPU build's equivalents (host pair-counting through ``jax.pure_callback``
plus the jit-compatible weighted NLL) live in ``elektronn2_tpu.malis`` and
are re-exported under the reference path for compat-shim deep imports.
"""

from elektronn2_tpu.malis import (  # noqa: F401
    malis_weights, malis_weighted_nll,
)

__all__ = ["malis_weights", "malis_weighted_nll"]
