"""Activation functions.

Reference: ``elektronn2/neuromancer/computations.py::apply_activation`` — the
reference's name set (lin, relu, tanh, sig, abs, maxout, prelu) is kept, plus
modern extras. All are jnp-traceable and fuse into the preceding matmul/conv
under XLA.
"""

import jax
import jax.numpy as jnp


def _softsign(x):
    return x / (1 + jnp.abs(x))


ACTIVATIONS = {
    "lin": lambda x: x,
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sig": jax.nn.sigmoid,
    "sigmoid": jax.nn.sigmoid,
    "abs": jnp.abs,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "softplus": jax.nn.softplus,
    "softsign": _softsign,
    "lrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.01),
}


def validate_activation(name):
    """Eager name check for layer constructors (fail fast, not at trace)."""
    if callable(name):
        return name
    if isinstance(name, str) and (name.startswith("maxout")
                                  or name == "prelu"):
        return name
    if name not in ACTIVATIONS:
        raise ValueError(
            f"unknown activation {name!r}; known: {sorted(ACTIVATIONS)} "
            "(+ 'maxout[:k]'/'prelu')")
    return name


def get_activation(name):
    """Look up an activation by its reference name.

    ``maxout`` and ``prelu`` are handled by the calling layer (they change
    shape / carry parameters) and are not returned here.
    """
    if callable(name):
        return name
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(
            f"unknown activation {name!r}; known: {sorted(ACTIVATIONS)} "
            "(+ 'maxout'/'prelu' handled in layers)") from None
