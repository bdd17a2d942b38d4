"""neuromancer — the declarative graph layer.

Reference: ``elektronn2/neuromancer/`` (Theano symbolic nodes). Here every
node is a *spec*: construction computes shapes (``TaggedShape``) and
initialises parameters eagerly, but the computation itself is a pure JAX
function traced lazily by ``Model`` and compiled once with ``jax.jit``.
"""

from elektronn2_tpu.neuromancer.graphutils import TaggedShape, floatX, as_floatX
from elektronn2_tpu.neuromancer.graphmanager import GraphManager, model_manager
from elektronn2_tpu.neuromancer.node_basic import (
    Node, Input, Input_like, FromTensor, Concat, ApplyFunc, ValueNode,
    MultMerge, InitialState_like, GenericInput, split, Reshape, Transpose,
)
from elektronn2_tpu.neuromancer.neural import (
    Perceptron, Dot, Conv, UpConv, Crop, Pad, Pool, Dropout, LRN,
    FragmentsToDense, FaithlessMerge, GRU, LSTM, BatchNorm,
)
from elektronn2_tpu.neuromancer.loss import (
    Softmax, MultinoulliNLL, BinaryNLL, GaussianNLL, SquaredLoss, AbsLoss,
    AggregateLoss, Errors, MalisNLL,
)
from elektronn2_tpu.neuromancer.various import (
    GaussianRV, ScanN, SkelLoss, SkelLossField, SkelPrior,
    SkelGetBatch,
)
from elektronn2_tpu.neuromancer.model import (
    Model, modelload, rebuild_model, simple_cnn, params_from_model_file,
)
from elektronn2_tpu.neuromancer import optimiser

__all__ = [
    "TaggedShape", "floatX", "as_floatX", "GraphManager", "model_manager",
    "Node", "Input", "Input_like", "FromTensor", "Concat", "ApplyFunc",
    "ValueNode", "MultMerge", "InitialState_like", "GenericInput", "split",
    "Reshape", "Transpose",
    "Perceptron", "Dot", "Conv", "UpConv", "Crop", "Pad", "Pool", "Dropout",
    "LRN", "FragmentsToDense", "FaithlessMerge", "GRU", "LSTM", "BatchNorm",
    "Softmax", "MultinoulliNLL", "BinaryNLL", "GaussianNLL", "SquaredLoss",
    "AbsLoss", "AggregateLoss", "Errors", "MalisNLL",
    "GaussianRV", "ScanN", "SkelLoss", "SkelLossField", "SkelPrior",
    "SkelGetBatch",
    "Model", "modelload", "rebuild_model", "simple_cnn",
    "params_from_model_file", "optimiser",
]
