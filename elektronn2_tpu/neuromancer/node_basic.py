"""Node base class and basic graph nodes.

Reference: ``elektronn2/neuromancer/node_basic.py::Node, Input, Input_like,
Concat, ApplyFunc, FromTensor, split, ValueNode, MultMerge,
InitialState_like, GenericInput`` and the module-global ``model_manager``.

TPU-first redesign: a reference Node eagerly builds a Theano symbolic
expression; here a Node eagerly computes only *static* things (TaggedShape,
parameter initial values) and defines ``_compute`` — a pure function on jnp
arrays. ``Model`` walks the graph inside a traced function, so the whole
network compiles to one XLA program (no per-node dispatch at runtime).
Construction args are captured so graphs are replayable (GraphManager
contract, the "neuromancer node specs" public surface).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from elektronn2_tpu.neuromancer import graphmanager
from elektronn2_tpu.neuromancer.graphmanager import register_node_class
from elektronn2_tpu.neuromancer.graphutils import TaggedShape, floatX


class TraceCtx:
    """Per-trace evaluation context threaded through ``Node._compute``.

    Fields:
      params  : {node_name: {param_name: jnp array}} — current parameters
      feed    : {input_node_name: jnp array}
      rng     : jax PRNG key or None (None → stochastic nodes act as identity)
      train   : static bool — training mode (dropout on, BN batch stats)
      state_in/state_out : {node_name: pytree} mutable aux state (BN stats)
    """

    def __init__(self, params, feed, rng=None, train=False, state_in=None,
                 node_index=None, compute_dtype=None):
        self.params = params or {}
        self.feed = feed or {}
        self.rng = rng
        self.train = train
        self.state_in = state_in or {}
        self.state_out = {}
        self.values = {}
        self._node_index = node_index or {}
        #: mixed precision: compute-heavy nodes cast activations/weights to
        #: this dtype (bfloat16 on TPU), accumulate in float32.
        #: 'int8' is a DENSE-SERVING mode (quantised convs live in
        #: inference.py::dilated_dense_forward); casting float activations
        #: through .astype('int8') here would truncate them — node traces
        #: (training, patch predict, tiled/conv fallbacks) stay f32
        self.compute_dtype = None if compute_dtype == "int8" \
            else compute_dtype
        #: rematerialise node outputs in the backward pass (jax.checkpoint)
        self.remat = False

    def get(self, node):
        """Memoised evaluation of ``node`` (and, recursively, its parents)."""
        v = self.values.get(node.name)
        if v is None:
            if getattr(node, "_lazy", False):
                # lazy nodes (ScanN) orchestrate their own sub-evaluation
                v = node._compute_lazy(self)
            else:
                # fused-evaluation hook (r5): a node may claim its own
                # parent evaluation for ctx-dependent fusions (e.g. the
                # conv-dense ``skipsum`` lowering, where a Conv consumes
                # its FaithlessMerge parent's PIECES so the skip concat
                # is never materialised). Returns None to decline.
                fused = getattr(node, "_compute_fused", None)
                if fused is not None and not (self.remat and node.params):
                    # (under remat the hook steps aside so the
                    # checkpoint below stays whole-node)
                    v = fused(self)
                    if v is not None:
                        self.values[node.name] = v
                        return v
                parent_vals = [self.get(p) for p in node.parents]
                if self.remat and node.params:
                    # rematerialise parameterised nodes in the backward pass
                    import jax
                    v = jax.checkpoint(
                        lambda *pv: node._compute(self, *pv))(*parent_vals)
                else:
                    v = node._compute(self, *parent_vals)
            self.values[node.name] = v
        return v

    def param(self, node, pname):
        try:
            return self.params[node.name][pname]
        except KeyError:
            raise KeyError(f"missing param {node.name}/{pname}; model params "
                           "out of sync with graph") from None

    def rng_for(self, node):
        if self.rng is None:
            return None
        return jax.random.fold_in(self.rng, self._node_index.get(node.name, 0))

    def state(self, node, default=None):
        return self.state_in.get(node.name, default)

    def set_state(self, node, value):
        self.state_out[node.name] = value


class Node:
    """Base class of all graph nodes.

    Subclasses must set ``self.shape`` (a TaggedShape) in ``__init__`` and
    implement ``_compute(ctx, *parent_values) -> jnp array``.
    """

    _lazy = False  # lazy nodes implement _compute_lazy(ctx) instead

    def __new__(cls, *args, **kwargs):
        obj = object.__new__(cls)
        # capture the OUTERMOST constructor call for replayable specs
        obj._init_args = (args, dict(kwargs))
        return obj

    def __init__(self, parent, name="node", print_repr=True):
        if parent is None:
            parents = []
        elif isinstance(parent, (list, tuple)):
            parents = list(parent)
        else:
            parents = [parent]
        for p in parents:
            if not isinstance(p, Node):
                raise TypeError(f"parent {p!r} is not a Node")
        self.parents = parents
        self.children = []
        gm = graphmanager.current_manager()
        self.name = gm.unique_name(name)
        self.print_repr = print_repr
        self.params = {}       # pname -> np.ndarray initial value
        self.param_flags = {}  # pname -> {"trainable","lr_mult","wd_mult"}
        self.shape = None
        self.is_source = not parents
        for p in parents:
            p.children.append(self)
        gm.register(self)
        self._gm = gm

    # -- params ----------------------------------------------------------------
    def register_param(self, pname, value, trainable=True, lr_mult=1.0,
                       wd_mult=1.0):
        from elektronn2_tpu.neuromancer.variables import VariableParam
        if isinstance(value, VariableParam):   # container carries the flags
            trainable, lr_mult, wd_mult = (value.trainable, value.lr_mult,
                                           value.wd_mult)
            value = value.value
        self.params[pname] = np.asarray(value, dtype=floatX)
        self.param_flags[pname] = {"trainable": bool(trainable),
                                   "lr_mult": float(lr_mult),
                                   "wd_mult": float(wd_mult)}

    @property
    def param_count(self):
        return sum(int(np.prod(v.shape)) for v in self.params.values())

    # -- graph traversal ---------------------------------------------------------
    def all_parents(self):
        """Ancestors (including self), parents-before-children order."""
        seen, order = set(), []

        def visit(n):
            if n.name in seen:
                return
            seen.add(n.name)
            for p in n.parents:
                visit(p)
            order.append(n)

        visit(self)
        return order

    @property
    def input_nodes(self):
        return [n for n in self.all_parents() if isinstance(n, Input)]

    # -- compute -------------------------------------------------------------
    def _compute(self, ctx, *parent_values):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        raise TypeError(
            "Nodes are declarative specs; build a Model and use "
            "model.predict / model.trainingstep (reference semantics)")

    def predict_dense(self, raw_img, pad_raw=False, as_uint8=False,
                      tile_batch=1, verbose=False, prefer_device=True,
                      device_budget=4 << 30):
        """Dense prediction with THIS node as the output map.

        Reference surface: ``node_basic.py::Node.predict_dense`` hangs
        dense inference off the output node (SURVEY §4.B). Here the
        machinery lives on the owning :class:`Model` (params/state are
        functional model attributes, not graph state) — this shim finds
        the most recent live model on the node's graph WHOSE NODE INDEX
        CONTAINS this node and delegates, temporarily presenting this
        node as the dense output when it is not the designated
        prediction node. With several models on one graph, the latest
        containing one wins (and serves ITS params) — matching the
        reference's global-model_manager semantics.
        """
        model = self._gm.last_model(node_name=self.name)
        if model is None:
            raise RuntimeError(
                f"no Model containing node {self.name!r} has been built "
                f"on its graph; call model_manager.getmodel() (and "
                f"designate_nodes) before node-level predict_dense")
        kw = dict(pad_raw=pad_raw, as_uint8=as_uint8,
                  tile_batch=tile_batch, verbose=verbose,
                  prefer_device=prefer_device, device_budget=device_budget)
        if model.prediction_node is self:
            return model.predict_dense(raw_img, **kw)
        # swap this node in as the dense output; the compiled-fn caches
        # are keyed on the designated graph, so stash and restore them
        # rather than invalidating the model's real serving caches
        prev = model.prediction_node
        prev_pred, prev_dil = model._predict_fns, model._dilated_fns
        model.prediction_node = self
        model._predict_fns, model._dilated_fns = {}, {}
        try:
            return model.predict_dense(raw_img, **kw)
        finally:
            model.prediction_node = prev
            model._predict_fns, model._dilated_fns = prev_pred, prev_dil

    def __repr__(self):
        sh = tuple(self.shape) if self.shape is not None else "?"
        return (f"<{type(self).__name__} {self.name!r} shape={sh} "
                f"n_params={self.param_count}>")


@register_node_class
class Input(Node):
    """Graph input placeholder with a TaggedShape.

    Reference: ``node_basic.py::Input``.
    """

    def __init__(self, shape, tags, dtype=None, name="input",
                 print_repr=True):
        super().__init__(None, name, print_repr)
        self.shape = shape if isinstance(shape, TaggedShape) \
            else TaggedShape(shape, tags)
        self.dtype = dtype or "float32"

    def _compute(self, ctx):
        try:
            v = ctx.feed[self.name]
        except KeyError:
            raise KeyError(f"no value fed for input {self.name!r}; "
                           f"fed: {list(ctx.feed)}") from None
        if v.ndim != self.shape.ndim:
            raise ValueError(
                f"input {self.name!r}: fed rank {v.ndim} != declared "
                f"{self.shape.ndim}")
        return jnp.asarray(v, dtype=self.dtype)


def Input_like(ref, dtype=None, name="input", print_repr=True,
               override_f=None):
    """Create an Input with the same TaggedShape as ``ref`` (Node or
    TaggedShape), optionally overriding the feature count.

    Reference: ``node_basic.py::Input_like``.
    """
    ts = ref.shape if isinstance(ref, Node) else ref
    if override_f:
        ts = ts.updateshape("f", override_f)
    return Input(list(ts.shape), list(ts.tags), dtype=dtype, name=name,
                 print_repr=print_repr)


@register_node_class
class GenericInput(Node):
    """Input with no shape checking (auxiliary feeds, e.g. skeleton data).

    Reference: ``node_basic.py::GenericInput``.
    """

    def __init__(self, name="generic_input", print_repr=False):
        super().__init__(None, name, print_repr)
        self.shape = TaggedShape((1,), ("b",))

    def _compute(self, ctx):
        return ctx.feed[self.name]


@register_node_class
class FromTensor(Node):
    """Wrap a constant array as a node.

    Reference: ``node_basic.py::FromTensor`` (wraps an existing symbolic
    tensor; here: a constant).
    """

    def __init__(self, tensor, tags, name="from_tensor", print_repr=True):
        super().__init__(None, name, print_repr)
        tensor = np.asarray(tensor, dtype=floatX)
        self.shape = TaggedShape(tensor.shape, tags)
        self.register_param("value", tensor, trainable=False)

    def _compute(self, ctx):
        return ctx.param(self, "value")


@register_node_class
class ValueNode(Node):
    """A named (optionally trainable) value, e.g. a learnable initial state.

    Reference: ``node_basic.py::ValueNode``.
    """

    def __init__(self, shape, tags, value=0.0, trainable=False, name="value",
                 print_repr=True):
        super().__init__(None, name, print_repr)
        self.shape = TaggedShape(shape, tags)
        init = np.broadcast_to(np.asarray(value, dtype=floatX),
                               tuple(self.shape)).copy()
        self.register_param("value", init, trainable=trainable)

    def _compute(self, ctx):
        return ctx.param(self, "value")


@register_node_class
class Concat(Node):
    """Concatenate along a tagged axis (default features).

    Reference: ``node_basic.py::Concat``.
    """

    def __init__(self, parent_nodes, axis="f", name="concat",
                 print_repr=True):
        super().__init__(parent_nodes, name, print_repr)
        shapes = [p.shape for p in self.parents]
        ax = shapes[0].tag2index(axis) if isinstance(axis, str) else axis
        self.axis = ax
        for s in shapes[1:]:
            if s.tags != shapes[0].tags:
                raise ValueError("Concat parents must share tags")
            for i, (a, b) in enumerate(zip(s.shape, shapes[0].shape)):
                if i != ax and a != b:
                    raise ValueError(
                        f"Concat shape mismatch off-axis: {s} vs {shapes[0]}")
        total = sum(s.shape[ax] for s in shapes)
        self.shape = shapes[0].updateshape(shapes[0].tags[ax], total)

    def _compute(self, ctx, *parent_values):
        return jnp.concatenate(parent_values, axis=self.axis)


@register_node_class
class MultMerge(Node):
    """Elementwise product of two nodes (broadcasting).

    Reference: ``node_basic.py::MultMerge``.
    """

    def __init__(self, n1, n2, name="multmerge", print_repr=True):
        super().__init__([n1, n2], name, print_repr)
        s1, s2 = n1.shape, n2.shape
        big = s1 if s1.ndim >= s2.ndim else s2
        self.shape = big.copy(shape=np.broadcast_shapes(tuple(s1), tuple(s2)))

    def _compute(self, ctx, a, b):
        return a * b


@register_node_class
class ApplyFunc(Node):
    """Apply an arbitrary jnp-traceable function to the parent's output.

    Reference: ``node_basic.py::ApplyFunc``. NOTE: models containing an
    ApplyFunc with a Python callable cannot be serialised to a node-spec
    file (same limitation as the reference's pickled lambdas, made explicit).
    """

    def __init__(self, parent, functor, new_shape=None, new_tags=None,
                 args=(), kwargs=None, name="applyfunc", print_repr=True):
        super().__init__(parent, name, print_repr)
        self.functor = functor
        self.args = tuple(args)
        self.kwargs = dict(kwargs or {})
        if new_shape is not None:
            self.shape = TaggedShape(new_shape,
                                     new_tags or parent.shape.tags)
        else:
            self.shape = parent.shape.copy()
        # callables are not JSON-serialisable → mark spec as unavailable
        self._init_args = None

    def _compute(self, ctx, x):
        return self.functor(x, *self.args, **self.kwargs)


@register_node_class
class InitialState_like(Node):
    """Learnable initial recurrent state, broadcast to the parent's batch.

    Reference: ``node_basic.py::InitialState_like`` — used to seed GRU/LSTM
    hidden state for the tracing models.
    """

    _lazy = True  # must not force-compute its parent (often a per-step
    #               placeholder inside a ScanN sub-graph); shapes are static

    def __init__(self, parent, override_f, init_kwargs=None,
                 name="initial_state", print_repr=True):
        super().__init__(parent, name, print_repr)
        init_kwargs = init_kwargs or {}
        self.shape = parent.shape.updateshape("f", override_f)
        scale = float(init_kwargs.get("scale", 0.0))
        mode = init_kwargs.get("mode", "const")
        f_ax = self.shape.tag2index("f")
        per_f = [1] * self.shape.ndim
        per_f[f_ax] = override_f
        rng = self._gm.init_rng()
        if mode == "const":
            val = np.full(per_f, scale, dtype=floatX)
        else:
            val = (rng.randn(*per_f) * scale).astype(floatX)
        self.register_param("state0", val, trainable=True)

    def _compute_lazy(self, ctx):
        if self.name in ctx.feed:
            # externally-carried state (truncated BPTT across batches):
            # a fed value overrides the learnable initial state
            return jnp.asarray(ctx.feed[self.name])
        state0 = ctx.param(self, "state0")
        return jnp.broadcast_to(state0, tuple(self.shape))


@register_node_class
class Split(Node):
    """One output slice of ``split`` (below). With
    ``strip_singleton_dims``, a size-1 slice drops its axis (reference
    semantics of ``split(..., strip_singleton_dims=True)``)."""

    def __init__(self, parent, axis, start, stop, name="split",
                 print_repr=True, strip_singleton_dims=False):
        super().__init__(parent, name, print_repr)
        ax = parent.shape.tag2index(axis) if isinstance(axis, str) else axis
        self.axis, self.start, self.stop = ax, int(start), int(stop)
        self.strip_singleton_dims = bool(strip_singleton_dims)
        tag = parent.shape.tags[ax]
        self._strip = (self.strip_singleton_dims
                       and self.stop - self.start == 1)
        if self._strip:
            self.shape = parent.shape.delaxis(ax)
        else:
            self.shape = parent.shape.updateshape(tag,
                                                  self.stop - self.start)

    def _compute(self, ctx, x):
        idx = [slice(None)] * x.ndim
        idx[self.axis] = slice(self.start, self.stop)
        y = x[tuple(idx)]
        if self._strip:
            y = jnp.squeeze(y, axis=self.axis)
        return y


@register_node_class
class Reshape(Node):
    """Reshape to a new tagged shape (same element count).

    Convenience node (the reference used flatten flags / ApplyFunc for
    this; a first-class node keeps specs serialisable).
    """

    def __init__(self, parent, shape, tags, name="reshape", print_repr=True):
        super().__init__(parent, name, print_repr)
        self.shape = TaggedShape(shape, tags)
        if int(np.prod(tuple(self.shape))) != int(np.prod(
                tuple(parent.shape))):
            raise ValueError(f"cannot reshape {tuple(parent.shape)} "
                             f"to {tuple(self.shape)}")

    def _compute(self, ctx, x):
        return x.reshape(tuple(self.shape))


@register_node_class
class Transpose(Node):
    """Permute axes (tags follow the permutation)."""

    def __init__(self, parent, perm, name="transpose", print_repr=True):
        super().__init__(parent, name, print_repr)
        self.perm = [parent.shape.tag2index(p) if isinstance(p, str) else
                     int(p) for p in perm]
        shape = [parent.shape.shape[i] for i in self.perm]
        tags = [parent.shape.tags[i] for i in self.perm]
        self.shape = TaggedShape(shape, tags)

    def _compute(self, ctx, x):
        return x.transpose(self.perm)


def split(node, axis="f", index=None, n_out=None, strip_singleton_dims=False,
          name="split"):
    """Split a node along a tagged axis into several nodes.

    Reference: ``node_basic.py::split``. Either ``n_out`` equal parts or
    explicit boundary ``index`` list.
    """
    ax = node.shape.tag2index(axis) if isinstance(axis, str) else axis
    size = node.shape.shape[ax]
    if index is None:
        if n_out is None or size % n_out:
            raise ValueError(f"cannot split axis of size {size} into "
                             f"{n_out} parts")
        step = size // n_out
        bounds = [(i * step, (i + 1) * step) for i in range(n_out)]
    else:
        edges = [0] + list(index) + [size]
        bounds = list(zip(edges[:-1], edges[1:]))
    return [Split(node, axis, a, b, name=f"{name}{i}",
                  strip_singleton_dims=strip_singleton_dims)
            for i, (a, b) in enumerate(bounds)]


# make the module-global manager importable from here, as in the reference
model_manager = graphmanager.model_manager
