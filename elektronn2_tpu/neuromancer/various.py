"""Misc nodes: reparameterised sampling, scan/recurrence, skeleton losses.

Reference: ``elektronn2/neuromancer/various.py::GaussianRV, ScanN, SkelLoss,
SkelPrior, SkelGetBatch``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from elektronn2_tpu.neuromancer.graphmanager import register_node_class
from elektronn2_tpu.neuromancer.graphutils import TaggedShape
from elektronn2_tpu.neuromancer.node_basic import Node, TraceCtx


@register_node_class
class GaussianRV(Node):
    """Reparameterised Gaussian sample: mu + sig * eps (train mode);
    returns mu in eval mode. Reference: ``various.py::GaussianRV``.
    ``n_samples > 1`` draws that many eps per element and averages them
    (the Monte-Carlo mean — reduces sample variance by 1/n while keeping
    the output shape, the reference's multi-sample semantics).
    """

    def __init__(self, mu, sig, n_samples=1, name="gaussian_rv",
                 print_repr=True):
        super().__init__([mu, sig], name, print_repr)
        self.n_samples = int(n_samples)
        if self.n_samples < 1:
            raise ValueError(f"n_samples must be >= 1, got {n_samples}")
        self.shape = mu.shape.copy()

    def _compute(self, ctx, mu, sig):
        if not ctx.train or ctx.rng is None:
            return mu
        key = ctx.rng_for(self)
        if self.n_samples == 1:
            eps = jax.random.normal(key, mu.shape, mu.dtype)
        else:
            eps = jax.random.normal(
                key, (self.n_samples,) + tuple(mu.shape), mu.dtype
            ).mean(axis=0)
        return mu + sig * eps


@register_node_class
class ScanN(Node):
    """Iterate a sub-graph with carried state — the recurrence engine.

    Reference: ``various.py::ScanN`` (wraps ``theano.scan``; here
    ``lax.scan``, which XLA compiles to a single fused loop — the idiomatic
    TPU control flow for recurrence).

    Parameters (mirroring the reference):
      step_result   : node computed each step (the cell output)
      in_memory     : node(s) whose value is the carried state; their normal
                      value (e.g. ``InitialState_like``) seeds step 0
      out_memory    : node(s) giving the next carry (default: [step_result])
      in_iterate    : placeholder node(s) fed a new time slice each step
      in_iterate_0  : node(s) providing full sequences; time on axis 0
      n_steps       : static iteration count (required if no sequences)
      last_only     : return only the final step's result

    Output shape: (s=n_steps,) + step_result.shape, or step_result.shape if
    ``last_only``. Aux state updates (BatchNorm EMA) inside the scanned
    sub-graph are not propagated (documented deviation).
    """

    _lazy = True

    def __init__(self, step_result, in_memory, out_memory=None,
                 in_iterate=None, in_iterate_0=None, n_steps=None,
                 last_only=False, name="scan", print_repr=True):
        def aslist(x):
            if x is None:
                return []
            return list(x) if isinstance(x, (list, tuple)) else [x]

        self.step_result = step_result
        self.in_memory = aslist(in_memory)
        self.out_memory = aslist(out_memory) or [step_result]
        self.in_iterate = aslist(in_iterate)
        self.in_iterate_0 = aslist(in_iterate_0)
        if len(self.in_iterate) != len(self.in_iterate_0):
            raise ValueError("in_iterate and in_iterate_0 must pair up")
        if len(self.in_memory) != len(self.out_memory):
            raise ValueError("in_memory and out_memory must pair up")
        if n_steps is None:
            if not self.in_iterate_0:
                raise ValueError("need n_steps or sequence inputs")
            n_steps = self.in_iterate_0[0].shape["s"]
        self.n_steps = int(n_steps)
        self.last_only = bool(last_only)

        parents = ([step_result] + self.in_memory + self.out_memory
                   + self.in_iterate_0)
        # dedupe, keep order
        seen, uniq = set(), []
        for p in parents:
            if p.name not in seen:
                seen.add(p.name)
                uniq.append(p)
        super().__init__(uniq, name, print_repr)
        if self.last_only:
            self.shape = step_result.shape.copy()
        else:
            self.shape = step_result.shape.addaxis(0, self.n_steps, "s")

    def _compute_lazy(self, ctx):
        carry_init = tuple(ctx.get(m) for m in self.in_memory)
        seqs = tuple(ctx.get(s) for s in self.in_iterate_0)
        for s, node in zip(seqs, self.in_iterate_0):
            if s.shape[0] != self.n_steps:
                raise ValueError(
                    f"sequence {node.name} has {s.shape[0]} steps, scan "
                    f"expects {self.n_steps} on axis 0")
        base_rng = ctx.rng

        def body(carry, xs):
            t, slices = xs[0], xs[1:]
            sub = TraceCtx(ctx.params, ctx.feed,
                           rng=(jax.random.fold_in(base_rng, t)
                                if base_rng is not None else None),
                           train=ctx.train, state_in=ctx.state_in,
                           node_index=ctx._node_index,
                           compute_dtype=ctx.compute_dtype)
            sub.remat = ctx.remat
            sub.halo_axis = getattr(ctx, "halo_axis", None)
            for m, c in zip(self.in_memory, carry):
                sub.values[m.name] = c
            for it, x in zip(self.in_iterate, slices):
                sub.values[it.name] = x
            out = sub.get(self.step_result)
            new_carry = tuple(sub.get(o) for o in self.out_memory)
            return new_carry, out

        xs = (jnp.arange(self.n_steps),) + seqs
        _, ys = jax.lax.scan(body, carry_init, xs, length=self.n_steps)
        return ys[-1] if self.last_only else ys

    def _compute(self, ctx, *parent_values):  # pragma: no cover
        raise RuntimeError("ScanN is lazily evaluated via _compute_lazy")


@register_node_class
class SkelLoss(Node):
    """Loss on predicted tracing step vectors vs skeleton geometry.

    Reference: ``various.py::SkelLoss`` — distance of the predicted step
    (a 3-vector in the local frame) to the nearest skeleton point, with
    penalties for leaving the neurite. The heavy geometry (nearest-point
    queries against the skeleton KD-tree) runs host-side via
    ``jax.pure_callback`` exactly like the reference's non-symbolic Python
    op (it queries SkeletonMFK inside the graph).
    """

    def __init__(self, pred, skel_data, loss_kwargs=None, name="skel_loss",
                 print_repr=True):
        super().__init__([pred, skel_data], name, print_repr)
        self.loss_kwargs = dict(loss_kwargs or {})
        self.shape = TaggedShape((pred.shape["b"],), ("b",))

    def _compute(self, ctx, pred, skel):
        from elektronn2_tpu.data.skeleton import skel_loss_callback
        return skel_loss_callback(pred, skel, **self.loss_kwargs)


@register_node_class
class SkelLossField(Node):
    """Device-side skeleton distance loss: zero host callbacks.

    Same objective as ``SkelLoss`` — squared distance of the landing
    position (current position + predicted step) to the skeleton — but the
    distance lives in a precomputed SQUARED-distance field stack (one
    (Z, X, Y) volume per skeleton, from
    ``data.skeleton.skeleton_distance_field``) resident in HBM as a
    non-trainable parameter. The loss trilinearly samples the field at the
    landing point, which is differentiable wrt the prediction through the
    interpolation weights — so the whole training step stays ONE device
    program (it fuses into ``fused_steps`` scans and sharded steps, where
    ``SkelLoss``'s per-step ``pure_callback`` would cost a host round-trip
    each iteration). Distance is measured to the rasterised skeleton
    CURVE (the continuous version of the callback's nearest-node
    distance; they agree for densely-noded skeletons).

    Inputs: ``pred`` (b, 3) step vectors; ``skel_data`` (b, 4) rows of
    [skel_id, z, x, y] current positions (same feed as ``SkelLoss``).
    """

    def __init__(self, pred, skel_data, fields, name="skel_loss_field",
                 print_repr=True):
        super().__init__([pred, skel_data], name, print_repr)
        fields = np.asarray(fields, np.float32)
        if fields.ndim != 4:
            raise ValueError("fields must be (n_skel, Z, X, Y) squared-"
                             f"distance volumes, got {fields.shape}")
        self.shape = TaggedShape((pred.shape["b"],), ("b",))
        self.register_param("fields", fields, trainable=False)

    def _compute(self, ctx, pred, skel):
        fields = ctx.param(self, "fields")
        dims = jnp.asarray(fields.shape[1:], jnp.float32)
        landing = skel[:, 1:4] + pred.astype(jnp.float32)
        sid = skel[:, 0].astype(jnp.int32)

        def sample(fid, p):
            f = jax.lax.dynamic_index_in_dim(fields, fid, 0,
                                             keepdims=False)
            # clamp so the 2³ interpolation cell stays inside the volume
            p = jnp.clip(p, 0.0, dims - 1.0 - 1e-4)
            base = jnp.floor(p)
            frac = p - base
            b = base.astype(jnp.int32)
            cell = jax.lax.dynamic_slice(f, (b[0], b[1], b[2]), (2, 2, 2))
            wz = jnp.stack([1.0 - frac[0], frac[0]])
            wx = jnp.stack([1.0 - frac[1], frac[1]])
            wy = jnp.stack([1.0 - frac[2], frac[2]])
            return jnp.einsum("i,j,k,ijk->", wz, wx, wy, cell)

        return jax.vmap(sample)(sid, landing)


@register_node_class
class SkelPrior(Node):
    """Prior pulling predicted steps toward plausible step lengths/angles.

    Reference: ``various.py::SkelPrior`` (details unverified — SURVEY.md
    §3.1): implemented as a soft penalty on step-vector norm deviation from
    a target length.
    """

    def __init__(self, pred, target_length=1.0, name="skel_prior",
                 print_repr=True):
        super().__init__(pred, name, print_repr)
        self.target_length = float(target_length)
        self.shape = TaggedShape((pred.shape["b"],), ("b",))

    def _compute(self, ctx, pred):
        norm = jnp.sqrt(jnp.sum(jnp.square(pred), axis=-1) + 1e-8)
        return jnp.square(norm - self.target_length)


@register_node_class
class SkelGetBatch(Node):
    """Fetch a tracing batch from skeleton data inside the graph.

    Reference: ``various.py::SkelGetBatch`` (host-side op). Here training
    data flows through ``AgentData`` (see data/cnndata.py) instead; this
    node passes through an externally-fed batch for API compatibility.
    """

    def __init__(self, skel_data, shape, tags, name="skel_batch",
                 print_repr=True):
        super().__init__(skel_data, name, print_repr)
        self.shape = TaggedShape(shape, tags)

    def _compute(self, ctx, skel):
        return skel
