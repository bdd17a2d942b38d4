"""neuromancer — the declarative graph layer.

Reference: ``elektronn2/neuromancer/`` (Theano symbolic nodes). Here every
node is a *spec*: construction computes shapes (``TaggedShape``) and
initialises parameters eagerly, but the computation itself is a pure JAX
function traced lazily by ``Model`` and compiled once with ``jax.jit``.
"""

from elektronn2_tpu.neuromancer.graphutils import TaggedShape, floatX, as_floatX

__all__ = ["TaggedShape", "floatX", "as_floatX"]

# Populated as the node layer lands:
try:
    from elektronn2_tpu.neuromancer.graphmanager import GraphManager, model_manager  # noqa: F401
    from elektronn2_tpu.neuromancer.node_basic import (  # noqa: F401
        Node, Input, Input_like, FromTensor, Concat, ApplyFunc, ValueNode,
        MultMerge, InitialState_like, GenericInput, split,
    )
    from elektronn2_tpu.neuromancer.neural import (  # noqa: F401
        Perceptron, Dot, Conv, UpConv, Crop, Pad, Pool, Dropout,
        FragmentsToDense, FaithlessMerge, GRU, LSTM, BatchNorm,
    )
    from elektronn2_tpu.neuromancer.loss import (  # noqa: F401
        Softmax, MultinoulliNLL, BinaryNLL, GaussianNLL, SquaredLoss, AbsLoss,
        AggregateLoss, Errors, MalisNLL,
    )
    from elektronn2_tpu.neuromancer.various import (  # noqa: F401
        GaussianRV, ScanN, SkelLoss, SkelPrior, SkelGetBatch,
    )
    from elektronn2_tpu.neuromancer.model import (  # noqa: F401
        Model, modelload, rebuild_model, simple_cnn, params_from_model_file,
    )
    from elektronn2_tpu.neuromancer import optimiser  # noqa: F401
    __all__ += [
        "GraphManager", "model_manager", "Node", "Input", "Input_like",
        "FromTensor", "Concat", "ApplyFunc", "ValueNode", "MultMerge",
        "InitialState_like", "GenericInput", "split", "Perceptron", "Dot",
        "Conv", "UpConv", "Crop", "Pad", "Pool", "Dropout",
        "FragmentsToDense", "FaithlessMerge", "GRU", "LSTM", "BatchNorm",
        "Softmax", "MultinoulliNLL", "BinaryNLL", "GaussianNLL",
        "SquaredLoss", "AbsLoss", "AggregateLoss", "Errors", "MalisNLL",
        "GaussianRV", "ScanN", "SkelLoss", "SkelPrior", "SkelGetBatch",
        "Model", "modelload", "rebuild_model", "simple_cnn",
        "params_from_model_file", "optimiser",
    ]
except ImportError:  # pragma: no cover - during incremental bring-up only
    pass
