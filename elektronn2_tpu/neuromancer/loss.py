"""Loss nodes.

Reference: ``elektronn2/neuromancer/loss.py::MultinoulliNLL, BinaryNLL,
GaussianNLL, SquaredLoss, AbsLoss, AggregateLoss, Softmax, Errors,
MalisNLL``. Per-voxel losses return (b, *spatial) maps; ``AggregateLoss``
reduces to the scalar the optimiser differentiates. Class weighting and
ignore/background label masking are first-class (sparse EM ground truth,
SURVEY.md §3.1).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from elektronn2_tpu.neuromancer.graphmanager import register_node_class
from elektronn2_tpu.neuromancer.graphutils import TaggedShape, floatX
from elektronn2_tpu.neuromancer.node_basic import Node

_EPS = 1e-10


def _loss_map_shape(pred_shape):
    """TaggedShape of a per-voxel loss map: drop the feature axis."""
    return pred_shape.delaxis("f")


@register_node_class
class Softmax(Node):
    """Softmax over the feature axis, optionally in independent groups.

    Reference: ``loss.py::Softmax`` (``n_indep`` groups, e.g. two
    independent binary decisions in one output tensor).
    """

    def __init__(self, parent, n_indep=1, name="softmax", print_repr=True):
        super().__init__(parent, name, print_repr)
        self.n_indep = int(n_indep)
        if parent.shape["f"] % self.n_indep:
            raise ValueError("features not divisible by n_indep")
        self.shape = parent.shape.copy()

    def _compute(self, ctx, x):
        ax = self.shape.tag2index("f")
        if self.n_indep == 1:
            return jax.nn.softmax(x, axis=ax)
        parts = jnp.split(x, self.n_indep, axis=ax)
        return jnp.concatenate([jax.nn.softmax(p, axis=ax) for p in parts],
                               axis=ax)


def _resolve_aux(value):
    """Normalise a class/example-weight argument: arrays become static
    floatX constants; Node instances pass through unchanged (the caller
    registers them as extra parents so they stay schedulable)."""
    if value is None or isinstance(value, Node):
        return value
    return np.asarray(value, dtype=floatX)


@register_node_class
class MultinoulliNLL(Node):
    """Weighted multinoulli (categorical) negative log-likelihood.

    Reference: ``loss.py::MultinoulliNLL``. ``pred`` must be probabilities
    (post-Softmax). Supports sparse integer targets, per-class weights,
    per-example weights, and ``mask_class_labeled`` (b, n_class) — a 0/1
    mask marking which classes are actually labeled in each example, so
    unlabeled ground truth doesn't push gradients (EM sparse GT).
    """

    def __init__(self, pred, target, target_is_sparse=False,
                 class_weights=None, example_weights=None,
                 mask_class_labeled=None, name="nll", print_repr=True):
        parents = [pred, target]
        self.class_weights = _resolve_aux(class_weights)
        self.example_weights = _resolve_aux(example_weights)
        self.mask_class_labeled = _resolve_aux(mask_class_labeled)
        for aux in (self.class_weights, self.example_weights,
                    self.mask_class_labeled):
            if isinstance(aux, Node):
                parents.append(aux)
        super().__init__(parents, name, print_repr)
        self.target_is_sparse = bool(target_is_sparse)
        self.n_class = pred.shape["f"]
        self.shape = _loss_map_shape(pred.shape)

    def _aux_value(self, ctx, aux, parent_vals, parents):
        if aux is None:
            return None
        if isinstance(aux, Node):
            return parent_vals[parents.index(aux)]
        return jnp.asarray(aux)

    def _compute(self, ctx, *pv):
        pred, target = pv[0], pv[1]
        f_ax = self.parents[0].shape.tag2index("f")
        cw = self._aux_value(ctx, self.class_weights, pv, self.parents)
        ew = self._aux_value(ctx, self.example_weights, pv, self.parents)
        mcl = self._aux_value(ctx, self.mask_class_labeled, pv, self.parents)

        logp = jnp.log(jnp.maximum(pred, _EPS))
        if self.target_is_sparse:
            t = target.astype(jnp.int32)
            # gather log p at the target class along f_ax
            nll = -jnp.take_along_axis(
                logp, jnp.expand_dims(t, f_ax), axis=f_ax
            ).squeeze(f_ax)
            if cw is not None:
                nll = nll * cw[t]
            if mcl is not None:
                # mcl: (b, n_class); weight 0 for voxels whose true class is
                # unlabeled in this example
                b_idx = jnp.arange(t.shape[0]).reshape(
                    (-1,) + (1,) * (t.ndim - 1))
                nll = nll * mcl[b_idx, t]
        else:
            t = target
            w = jnp.ones((self.n_class,), pred.dtype) if cw is None else cw
            wshape = [1] * pred.ndim
            wshape[f_ax] = self.n_class
            nll = -jnp.sum(t * logp * w.reshape(wshape), axis=f_ax)
            if mcl is not None:
                lab = jnp.sum(t * mcl.reshape(mcl.shape[:1] + (self.n_class,)
                                              + (1,) * (pred.ndim - 2)),
                              axis=f_ax)
                nll = nll * lab
        if ew is not None:
            # per-example weights are (b,); broadcast over the spatial loss
            # map from the left (trailing-dim numpy broadcasting would
            # misalign or fail against (b, *spatial))
            ew = jnp.asarray(ew)
            if ew.ndim < nll.ndim:
                ew = ew.reshape(ew.shape + (1,) * (nll.ndim - ew.ndim))
            nll = nll * ew
        return nll


@register_node_class
class BinaryNLL(Node):
    """Binary cross-entropy on probabilities.

    Reference: ``loss.py::BinaryNLL``.
    """

    def __init__(self, pred, target, name="binary_nll", print_repr=True):
        super().__init__([pred, target], name, print_repr)
        self.shape = _loss_map_shape(pred.shape)

    def _compute(self, ctx, pred, target):
        f_ax = self.parents[0].shape.tag2index("f")
        nll = -(target * jnp.log(jnp.maximum(pred, _EPS))
                + (1 - target) * jnp.log(jnp.maximum(1 - pred, _EPS)))
        return jnp.sum(nll, axis=f_ax)


@register_node_class
class GaussianNLL(Node):
    """Gaussian NLL with predicted mean and std.

    Reference: ``loss.py::GaussianNLL`` (constant term omitted, as there).
    """

    def __init__(self, mu, sig, target, sig_is_log=False, name="gaussian_nll",
                 print_repr=True):
        super().__init__([mu, sig, target], name, print_repr)
        self.sig_is_log = bool(sig_is_log)
        self.shape = _loss_map_shape(mu.shape)

    def _compute(self, ctx, mu, sig, target):
        f_ax = self.parents[0].shape.tag2index("f")
        if self.sig_is_log:
            log_sig, sig = sig, jnp.exp(sig)
        else:
            sig = jnp.maximum(sig, _EPS)
            log_sig = jnp.log(sig)
        nll = 0.5 * jnp.square((target - mu) / sig) + log_sig
        return jnp.sum(nll, axis=f_ax)


@register_node_class
class SquaredLoss(Node):
    """Mean squared error over features, per voxel.

    Reference: ``loss.py::SquaredLoss`` (``margin`` clamps small residuals
    to zero; ``scale_correct`` unsupported-unverified).
    """

    def __init__(self, pred, target, margin=None, name="squared_loss",
                 print_repr=True):
        super().__init__([pred, target], name, print_repr)
        self.margin = margin
        self.shape = _loss_map_shape(pred.shape)

    def _compute(self, ctx, pred, target):
        f_ax = self.parents[0].shape.tag2index("f")
        r = pred - target
        if self.margin is not None:
            r = jnp.where(jnp.abs(r) < self.margin, 0.0, r)
        return jnp.sum(jnp.square(r), axis=f_ax)


@register_node_class
class AbsLoss(Node):
    """L1 loss over features, per voxel. Reference: ``loss.py::AbsLoss``."""

    def __init__(self, pred, target, name="abs_loss", print_repr=True):
        super().__init__([pred, target], name, print_repr)
        self.shape = _loss_map_shape(pred.shape)

    def _compute(self, ctx, pred, target):
        f_ax = self.parents[0].shape.tag2index("f")
        return jnp.sum(jnp.abs(pred - target), axis=f_ax)


@register_node_class
class AggregateLoss(Node):
    """Reduce one or more loss maps to the scalar training objective.

    Reference: ``loss.py::AggregateLoss`` (weighted mean over everything).
    """

    def __init__(self, parent_nodes, mixing_weights=None, name="loss",
                 print_repr=True):
        if isinstance(parent_nodes, Node):
            parent_nodes = [parent_nodes]
        super().__init__(parent_nodes, name, print_repr)
        if mixing_weights is not None and len(mixing_weights) != len(self.parents):
            raise ValueError("need one mixing weight per parent")
        self.mixing_weights = ([float(w) for w in mixing_weights]
                               if mixing_weights is not None
                               else [1.0] * len(self.parents))
        self.shape = TaggedShape((1,), ("f",))

    def _compute(self, ctx, *parent_values):
        total = 0.0
        for w, v in zip(self.mixing_weights, parent_values):
            total = total + w * jnp.mean(v)
        return jnp.reshape(total, (1,))


@register_node_class
class Errors(Node):
    """Classification error rate (argmax mismatch fraction).

    Reference: ``loss.py::Errors``.
    """

    def __init__(self, pred, target, target_is_sparse=False, name="errors",
                 print_repr=True):
        super().__init__([pred, target], name, print_repr)
        self.target_is_sparse = bool(target_is_sparse)
        self.shape = TaggedShape((1,), ("f",))

    def _compute(self, ctx, pred, target):
        f_ax = self.parents[0].shape.tag2index("f")
        cls = jnp.argmax(pred, axis=f_ax)
        if self.target_is_sparse:
            t = target.astype(jnp.int32)
        else:
            t = jnp.argmax(target, axis=f_ax)
        return jnp.reshape(jnp.mean((cls != t).astype(jnp.float32)), (1,))


@register_node_class
class MalisNLL(Node):
    """MALIS structured loss (maximin affinity).

    Reference: ``loss.py::MalisNLL`` bridging to the C++ MALIS op
    (``elektronn2/malis/``). Implemented via the native extension in
    ``elektronn2_tpu.malis`` through ``jax.pure_callback`` with a custom
    VJP (the pair-counting is an inherently sequential host computation,
    as in the reference).
    """

    def __init__(self, pred, aff_gt, seg_gt, nhood=None, unrestrict_neg=True,
                 name="malis_nll", print_repr=True):
        # aff_gt may be None — ground-truth affinities are derived from
        # seg_gt via seg_to_affgraph inside the loss (reference behaviour)
        parents = [pred, seg_gt] if aff_gt is None else [pred, aff_gt,
                                                         seg_gt]
        self._has_aff_gt = aff_gt is not None
        super().__init__(parents, name, print_repr)
        from elektronn2_tpu.malis import default_nhood
        self.nhood = (np.asarray(nhood, dtype=np.int32) if nhood is not None
                      else default_nhood(3))
        self.unrestrict_neg = bool(unrestrict_neg)
        self.shape = _loss_map_shape(pred.shape)

    def _compute(self, ctx, *pv):
        from elektronn2_tpu.malis import malis_weighted_nll
        if self._has_aff_gt:
            pred, aff_gt, seg_gt = pv
        else:
            (pred, seg_gt), aff_gt = pv, None
        return malis_weighted_nll(pred, aff_gt, seg_gt, self.nhood,
                                  self.unrestrict_neg)
