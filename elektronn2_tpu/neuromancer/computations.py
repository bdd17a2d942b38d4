"""Reference module path: ``elektronn2/neuromancer/computations.py``.

The reference kept its symbolic-expression builders (``conv``, ``pooling``,
``upconv``, ``fragmentpool``, ``fragments2dense``, ``softmax``, …) in this
module; here the same functions live in the op layer (``elektronn2_tpu.ops``
— pure JAX, shared by the node layer and the dense-inference lowerings).
This module re-exports them under the reference path so reference-style
deep imports (``from elektronn2.neuromancer.computations import conv``)
keep working through the compat shim. Same objects, not copies.
"""

from elektronn2_tpu.ops.conv import (  # noqa: F401
    conv, conv_s2b, quantized_conv, upconv, dot, pooling, unpooling,
    upsampling, maxout, softmax, apply_activation,
)
from elektronn2_tpu.ops.mfp import (  # noqa: F401
    fragmentpool, fragments2dense, mfp_offsets_product,
)

__all__ = [
    "conv", "conv_s2b", "quantized_conv", "upconv", "dot", "pooling",
    "unpooling", "upsampling", "maxout", "softmax", "apply_activation",
    "fragmentpool", "fragments2dense", "mfp_offsets_product",
]
