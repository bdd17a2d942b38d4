"""Parameter initialisation helpers.

Reference: ``elektronn2/neuromancer/variables.py::VariableParam,
VariableWeight, ConstantParam`` — Theano shared-variable containers with
layerwise lr/weight-decay flags. In the functional rebuild, parameters are
plain arrays registered on nodes (``Node.register_param`` carries the
trainable/lr_mult/wd_mult flags); this module keeps the *initialisation*
logic.
"""

from __future__ import annotations

import numpy as np

from elektronn2_tpu.neuromancer.graphutils import floatX

RELU_LIKE = ("relu", "lrelu", "leaky_relu", "elu", "gelu", "silu", "swish",
             "prelu")


def init_weight(rng, shape, activation_func="relu", fan_in=None):
    """He-normal for relu-family activations, Glorot-uniform otherwise.

    ``shape`` is (f_out, f_in, *filter) for convs or (f_in, f_out) for dense;
    ``fan_in`` overrides the inferred fan-in.
    """
    shape = tuple(int(s) for s in shape)
    if fan_in is None:
        if len(shape) == 2:      # dense (f_in, f_out)
            fan_in, fan_out = shape[0], shape[1]
        else:                    # conv (f_out, f_in, *filter)
            rf = int(np.prod(shape[2:])) if len(shape) > 2 else 1
            fan_in, fan_out = shape[1] * rf, shape[0] * rf
    else:
        fan_out = fan_in
    name = activation_func if isinstance(activation_func, str) else "relu"
    if name.startswith("maxout"):
        name = "lin"
    if name in RELU_LIKE:
        std = np.sqrt(2.0 / fan_in)
        w = rng.randn(*shape) * std
    else:
        limit = np.sqrt(6.0 / (fan_in + fan_out))
        w = rng.uniform(-limit, limit, size=shape)
    return w.astype(floatX)


def init_bias(shape, activation_func="relu", value=None):
    """Small positive bias for relu (reference habit), zero otherwise."""
    if value is None:
        value = 0.1 if (isinstance(activation_func, str)
                        and activation_func in RELU_LIKE) else 0.0
    return np.full(shape, value, dtype=floatX)
