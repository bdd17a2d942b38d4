"""ops — pure JAX/XLA/Pallas compute primitives.

Reference: ``elektronn2/neuromancer/computations.py`` (Theano expression
builders). Here these are pure functions on jnp arrays, designed to lower to
MXU convolutions and fused VPU elementwise chains under jit.
"""

from elektronn2_tpu.ops.activations import get_activation, ACTIVATIONS
from elektronn2_tpu.ops.conv import (
    conv, dot, upconv, pooling, unpooling, upsampling, maxout, softmax,
    apply_activation,
)
from elektronn2_tpu.ops.mfp import fragmentpool, fragments2dense, mfp_offsets_product

__all__ = [
    "get_activation", "ACTIVATIONS", "conv", "dot", "upconv", "pooling",
    "unpooling", "upsampling", "maxout", "softmax", "apply_activation",
    "fragmentpool", "fragments2dense", "mfp_offsets_product",
]
