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


class VariableParam:
    """Parameter container with layerwise lr/weight-decay flags.

    Reference: ``variables.py::VariableParam`` — a Theano shared variable
    with ``apply_train``/``apply_reg`` flags. Functionally rebuilt: holds a
    plain array plus the flags; ``Node.register_param`` accepts one and
    unwraps it, and the shared-variable surface (``get_value`` /
    ``set_value``) is kept for reference-style code.
    """

    trainable_default = True

    def __init__(self, value, name=None, trainable=None, lr_mult=1.0,
                 wd_mult=1.0, apply_train=None, apply_reg=None,
                 dtype=floatX):
        if apply_train is not None and trainable is None:
            trainable = apply_train        # reference flag name
        if trainable is None:
            trainable = self.trainable_default
        if apply_reg is not None and not apply_reg:
            wd_mult = 0.0                  # reference: excluded from L2
        self.value = np.asarray(value, dtype=dtype)
        self.name = name
        self.trainable = bool(trainable)
        self.lr_mult = float(lr_mult)
        self.wd_mult = float(wd_mult)

    # Theano shared-variable surface
    def get_value(self):
        return self.value

    def set_value(self, v):
        self.value = np.asarray(v, dtype=self.value.dtype)

    @property
    def shape(self):
        return self.value.shape

    def __repr__(self):
        flag = "trainable" if self.trainable else "frozen"
        return (f"<{type(self).__name__} {self.name or ''} "
                f"{self.value.shape} {flag}>")


class VariableWeight(VariableParam):
    """Weight parameter; initialises via :func:`init_weight` when given a
    shape instead of values. Reference: ``variables.py::VariableWeight``."""

    def __init__(self, value=None, shape=None, init_kwargs=None, **kwargs):
        if value is None:
            if shape is None:
                raise ValueError("VariableWeight needs value or shape")
            ik = dict(init_kwargs or {})
            rng = ik.pop("rng", None) or np.random.RandomState(0)
            value = init_weight(rng, shape, **ik)
        super().__init__(value, **kwargs)


class ConstantParam(VariableParam):
    """Non-trainable parameter (reference: ``variables.py::ConstantParam``)."""

    trainable_default = False

    def __init__(self, value, name=None, dtype=floatX):
        super().__init__(value, name=name, trainable=False, wd_mult=0.0,
                         dtype=dtype)
