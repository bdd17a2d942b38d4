"""Tracing runtime: roll out a trained recurrent model as an agent.

Reference: ``elektronn2/data/tracing_utils.py::Tracer, CubeShape,
ShotgunRegistry`` — steps a recurrent model voxel-by-voxel through a
volume following a neurite; batches agent states; registry of seed points.
"""

from __future__ import annotations

import numpy as np

from elektronn2_tpu.log import logger
from elektronn2_tpu.data.skeleton import Trace
from elektronn2_tpu.data.transformations import warp_slice, WarpingOOBError


class CubeShape:
    """Geometry helper for a volume being traced (bounds, safe margins)."""

    def __init__(self, shape, margin):
        self.shape = np.asarray(shape, np.float64)
        self.margin = np.asarray(margin, np.float64)

    def inside(self, pos):
        return np.all(pos >= self.margin) and np.all(
            pos < self.shape - self.margin)

    def clip(self, pos):
        return np.clip(pos, self.margin, self.shape - self.margin - 1)


def _discover_scan(model):
    """(scan_node, per-step input node) for a tracing model: the single
    ScanN's sequence input for recurrent graphs, the designated input for
    feedforward step predictors."""
    from elektronn2_tpu.neuromancer.various import ScanN
    nodes = getattr(model, "nodes", None)
    if not nodes:           # duck-typed step predictor (has .predict only)
        return None, model.input_node
    scan = next((n for n in nodes.values()
                 if isinstance(n, ScanN)), None)
    if scan is not None:
        its = scan.in_iterate
        if len(its) != 1:
            raise ValueError("tracing needs a ScanN with exactly one "
                             f"sequence input, got {len(its)}")
        return scan, its[0]
    return None, model.input_node


class _AgentStepper:
    """Shared per-step model evaluation for the host ``Tracer`` and the
    fused ``DeviceTracer``: patches (+ carried recurrent state) → step
    prediction, routed through the model graph (the ScanN CELL for
    recurrent models — the sequence input is bypassed entirely)."""

    def _step_apply(self, params, state, patches, carry):
        """One agent step: patches (B, f, *p) + carried state → (pred,
        new_carry), evaluated through the model graph."""
        from elektronn2_tpu.neuromancer.node_basic import TraceCtx
        model, scan = self.model, self.scan_node
        if scan is None:
            ctx = TraceCtx(params, {self._x_node.name: patches}, rng=None,
                           train=False, state_in=state,
                           node_index=model._node_index)
            return ctx.get(model.prediction_node), carry
        ctx = TraceCtx(params, {}, rng=None, train=False, state_in=state,
                       node_index=model._node_index)
        for m, c in zip(scan.in_memory, carry):
            ctx.values[m.name] = c
        ctx.values[self._x_node.name] = patches
        cell_out = ctx.get(scan.step_result)
        new_carry = tuple(ctx.get(o) for o in scan.out_memory)
        if model.prediction_node is scan:
            return cell_out, new_carry
        # head nodes downstream of the scan were built against the
        # time-stacked (s, b, ...) scan shape — their static axis indices
        # (Perceptron f-axis, prelu/maxout axes) assume that rank, so the
        # per-step cell output is injected as a length-1 sequence
        ctx2 = TraceCtx(params, {}, rng=None, train=False, state_in=state,
                        node_index=model._node_index)
        ctx2.values[scan.name] = cell_out[None]
        return ctx2.get(model.prediction_node)[0], new_carry

    def _init_carry(self, params, state, batch):
        """Initial carried state, re-broadcast from the model's design
        batch to the rollout batch (initial states are batch-constant)."""
        import jax.numpy as jnp
        from elektronn2_tpu.neuromancer.node_basic import TraceCtx
        if self.scan_node is None:
            return ()
        ctx = TraceCtx(params, {}, rng=None, train=False, state_in=state,
                       node_index=self.model._node_index)
        vals = []
        for m in self.scan_node.in_memory:
            v = ctx.get(m)
            vals.append(jnp.broadcast_to(v[:1], (batch,) + v.shape[1:]))
        return tuple(vals)


class Tracer(_AgentStepper):
    """Iteratively apply a step-prediction model to follow a neurite.

    Works for feedforward step predictors AND recurrent (ScanN) tracing
    models: the per-step patch feeds the scan CELL directly with the
    hidden state carried across steps (review r2 s5 — feeding the
    sequence-shaped designated input crashed, and no state was carried).
    One device dispatch per voxel step — use ``DeviceTracer`` for
    production rollouts (whole batch in one dispatch).
    """

    def __init__(self, model, volume, step_scale=1.0, max_steps=500,
                 stop_on_oob=True, rotate_to_heading=False):
        self.model = model
        self.volume = volume            # (f, Z, X, Y)
        self.step_scale = float(step_scale)
        self.max_steps = int(max_steps)
        self.stop_on_oob = stop_on_oob
        #: frame-aligned views (``get_tracing_slice``): cut each view
        #: along the agent's last step and interpret the model's
        #: prediction IN that local frame — the rollout counterpart of
        #: ``AgentData(rotate_to_heading=True)`` training
        self.rotate_to_heading = bool(rotate_to_heading)
        self.scan_node, self._x_node = _discover_scan(model)
        ps = self._x_node.shape.spatial_shape
        self.patch_size = ps
        self.cube = CubeShape(volume.shape[1:],
                              np.asarray(ps) / 2 + 1)

    def trace(self, seed_position, initial_heading=None):
        """Trace from a seed; returns a ``Trace``.

        ``initial_heading`` orients the first frame-aligned view when
        ``rotate_to_heading=True`` (default (0, 0, 1), matching the
        degenerate-heading fallback of ``flight_frame`` /
        ``direction_target``)."""
        import jax.numpy as jnp
        from elektronn2_tpu.data.transformations import (get_tracing_slice,
                                                         flight_frame)
        pos = np.asarray(seed_position, np.float64)
        heading = (np.array([0.0, 0.0, 1.0]) if initial_heading is None
                   else np.asarray(initial_heading, np.float64))
        trace = Trace([pos])
        carry = (self._init_carry(self.model.params, self.model.state, 1)
                 if hasattr(self.model, "_node_index") else ())
        for _ in range(self.max_steps):
            if not self.cube.inside(pos):
                if self.stop_on_oob:
                    break
                pos = self.cube.clip(pos)
            try:
                if self.rotate_to_heading:
                    patch = get_tracing_slice(self.volume, self.patch_size,
                                              position=pos,
                                              direction=heading)
                else:
                    patch = warp_slice(self.volume, self.patch_size,
                                       position=pos)
            except WarpingOOBError:
                break
            if not hasattr(self.model, "_node_index"):
                # duck-typed step predictor (tests/simple callables)
                pred = np.asarray(self.model.predict(patch[None]))
            else:
                pred, carry = self._step_apply(
                    self.model.params, self.model.state,
                    jnp.asarray(patch[None]), carry)
            step = np.asarray(pred)[0].reshape(-1)[:3] * self.step_scale
            if self.rotate_to_heading:
                # prediction lives in the view's local frame → world
                step = flight_frame(heading).T @ step
            if np.linalg.norm(step) < 1e-4:
                break
            pos = pos + step
            if self.rotate_to_heading:
                heading = step
            trace.append(pos)
        return trace

    def trace_many(self, seeds):
        return [self.trace(s) for s in seeds]


class ShotgunRegistry:
    """Seed-point registry: dedupes seeds against already-traced paths.

    Reference: ``tracing_utils.py::ShotgunRegistry`` (unverified detail —
    SURVEY.md §3.2): seeds within ``radius`` of an existing trace are
    considered covered and skipped.
    """

    def __init__(self, seeds, radius=5.0):
        self.pending = [np.asarray(s, np.float64) for s in seeds]
        self.radius = float(radius)
        self.traces = []
        self._kdt = None         # built lazily on first register()

    def next_seed(self):
        while self.pending:
            s = self.pending.pop()
            if self._kdt is None or len(self._kdt) == 0:
                return s
            d, _, _ = self._kdt.get_knn(s, k=1)
            if float(d) > self.radius:
                return s
        return None

    def register(self, trace):
        from elektronn2_tpu.utils.basic import DynamicKDT
        self.traces.append(trace)
        if self._kdt is None:
            self._kdt = DynamicKDT(trace.coords)
        else:
            for p in trace.coords:
                self._kdt.append(p)

    def save_kzip(self, fname, scale=(1.0, 1.0, 1.0)):
        """Export every registered trace as a KNOSSOS annotation (one
        ``thing`` per trace) — the deployment hand-off: trace → inspect
        in KNOSSOS. Reference: ``skeleton.py::trace_to_kzip``."""
        from elektronn2_tpu.data.skeleton import trace_to_kzip
        return trace_to_kzip(self.traces, fname, scale=scale)

    def run(self, tracer, batch_size=1, save_kzip=None, pool=False):
        """Drain the registry through a tracer.

        With ``batch_size > 1`` and a batch-capable tracer
        (``DeviceTracer.trace_batch``), eligible seeds are rolled out
        together in one device dispatch per batch. Seeds in the same batch
        are deduped against previously-registered traces only, not against
        each other's fresh paths (a documented relaxation of the serial
        drain's semantics, bounded by ``radius``).

        ``pool=True`` (r4, DeviceTracer only): drain through
        ``trace_pool`` — slots respawn from the seed queue ON DEVICE the
        step after their agent dies, so a wave of ~8x``batch_size`` seeds
        rolls out in one dispatch at near-full slot utilization instead
        of one dispatch per batch with a decaying alive fraction. Same
        dedupe relaxation, wave-sized.

        ``save_kzip``: path — after the drain, write all traces as a
        KNOSSOS .k.zip/.nml annotation (``save_kzip`` method).
        """
        batch_size = int(batch_size)
        if pool and hasattr(tracer, "trace_pool_chain"):
            # r5: chained waves — the scan carry crosses dispatches, so
            # live agents continue into the next wave and the drain tail
            # is paid ONCE at the end of the whole registry (single-wave
            # trace_pool measured util 0.84; the 16% was all tail).
            # register() feeds the dedupe KDT between waves.
            _, stats = tracer.trace_pool_chain(
                self.next_seed, batch_size=batch_size,
                register=self.register)
            logger.info(
                f"chained pool drain: {stats['consumed']} seeds over "
                f"{stats['waves']} waves at {stats['util']:.0%} slot "
                "utilization")
            if save_kzip:
                self.save_kzip(save_kzip)
            return self.traces
        if pool and hasattr(tracer, "trace_pool"):
            while True:
                seeds = []
                while len(seeds) < batch_size * 8:
                    s = self.next_seed()
                    if s is None:
                        break
                    seeds.append(s)
                if not seeds:
                    break
                traces, stats = tracer.trace_pool(seeds,
                                                  batch_size=batch_size)
                for t in traces:
                    self.register(t)
                n_used = stats["consumed"]
                if n_used < len(seeds):   # budget-truncated: re-queue
                    self.pending.extend(seeds[n_used:])
                logger.info(
                    f"pool wave: {n_used} seeds, "
                    f"{stats['effective_steps']} steps at "
                    f"{stats['effective_steps'] / max(1, stats['slot_steps']):.0%}"
                    " slot utilization")
            if save_kzip:
                self.save_kzip(save_kzip)
            return self.traces
        if pool:
            logger.warning("pool=True needs a trace_pool-capable tracer "
                           "(DeviceTracer); draining without it")
        if batch_size > 1 and not hasattr(tracer, "trace_batch"):
            logger.warning(
                f"batch_size={batch_size} requested but {type(tracer).__name__} "
                "has no trace_batch — draining serially (use DeviceTracer "
                "for batched rollouts)")
        if batch_size > 1 and hasattr(tracer, "trace_batch"):
            while True:
                seeds = []
                while len(seeds) < batch_size:
                    s = self.next_seed()
                    if s is None:
                        break
                    seeds.append(s)
                if not seeds:
                    break
                # pad the final partial batch to a constant batch size so
                # the device rollout never recompiles on a new seed count
                n_real = len(seeds)
                seeds = seeds + [seeds[0]] * (batch_size - n_real)
                for t in tracer.trace_batch(seeds)[:n_real]:
                    self.register(t)
                logger.info(f"traced a batch of {n_real} seeds")
        else:
            while True:
                seed = self.next_seed()
                if seed is None:
                    break
                t = tracer.trace(seed)
                self.register(t)
                logger.info(f"traced {len(t)} steps from {seed}")
        if save_kzip:
            self.save_kzip(save_kzip)
        return self.traces


def _flight_frame_jnp(h):
    """jnp ``transformations.flight_frame``: orthonormal rows
    (tangent, normal1, normal2) with the same degenerate fallback
    ((0,0,1)) and reference-vector switch (|t·x̂| > 0.9 → ŷ)."""
    import jax.numpy as jnp

    n = jnp.linalg.norm(h)
    t = jnp.where(n > 1e-12, h / jnp.where(n > 1e-12, n, 1.0),
                  jnp.asarray([0.0, 0.0, 1.0], h.dtype))
    ref = jnp.where(jnp.abs(t[0]) > 0.9,
                    jnp.asarray([0.0, 1.0, 0.0], h.dtype),
                    jnp.asarray([1.0, 0.0, 0.0], h.dtype))
    n1 = jnp.cross(t, ref)
    n1 = n1 / jnp.linalg.norm(n1)
    n2 = jnp.cross(t, n1)
    return jnp.stack([t, n1, n2])


class DeviceTracer(_AgentStepper):
    """Fused on-device agent rollout — the TPU-native ``Tracer``.

    The host ``Tracer`` dispatches one device program per agent step
    (host-side patch cut, ``model.predict``, scalar readback): at sandbox
    tunnel latencies that is a ~20 ms floor PER VOXEL STEP. Here the whole
    rollout runs inside one ``lax.scan`` for a BATCH of agents — trilinear
    patch extraction at float positions (pure translation: 8 blended
    ``dynamic_slice`` corners, no gather op), recurrent cell step via the
    model's ``ScanN`` sub-graph, position update, out-of-bounds /
    convergence masking — one dispatch per rollout, volume HBM-resident.

    Reference semantics mirrored from ``tracing_utils.py::Tracer``
    (SURVEY.md §3.2): OOB margin = patch/2 + 1 (``CubeShape``), a step
    shorter than ``min_step`` stops the agent, stopped agents freeze in
    place. Works with recurrent models built around a single-sequence
    ``ScanN`` (the tracing-model family) and with feedforward
    step-predictors (no carried state).

    ``rotate_to_heading=True`` (r4): frame-aligned views inside the scan
    — each agent's patch is resampled along its flight heading
    (``get_tracing_slice`` semantics: world = pos + F.T @ grid offsets,
    ``flight_frame`` rows, degenerate fallback (0,0,1)), the predicted
    step is rotated back to world through the same frame, and the
    heading carries. Models trained with
    ``AgentData(rotate_to_heading=True)`` can now deploy fused on-device
    (previously host-``Tracer``-only: ~20 ms/step through the tunnel).
    r5: the rotated resample runs through the Mosaic kernel in
    ``ops/pallas_extract_rot.py`` when the geometry is eligible
    (26-71 K agent-steps/s depending on ``rot_compute_dtype``; the XLA
    8-corner gather at 2.4 K remains the fallback and oracle).
    """

    def __init__(self, model, volume, step_scale=1.0, max_steps=500,
                 min_step=1e-4, use_pallas_extract=None,
                 rotate_to_heading=False, use_pallas_rot=None,
                 rot_compute_dtype="float32", rot_precision="high"):
        import jax.numpy as jnp

        self.model = model
        self.rotate_to_heading = bool(rotate_to_heading)
        #: r5 rotated-extraction Pallas kernel (None = auto: TPU +
        #: eligible geometry). ``rot_compute_dtype='bfloat16'`` is the
        #: opt-in single-pass-MXU speed mode (~4e-3 relative on the
        #: patch values; 'float32' is parity-grade).
        #: ``rot_precision``: f32-mode MXU dot — 'high' (deployment
        #: default) is the manual 3-pass bf16x3 decomposition, measured
        #: on-chip at the SAME accuracy class as the 6-pass dot
        #: (1.44e-5 vs 1.39e-5 against the f32 oracle) at 1.48x the
        #: rollout rate (39.0K vs 26.3K agent-steps/s, B=512 K=64);
        #: None selects the 6-pass true-f32 dot (oracle-grade).
        self.use_pallas_rot = use_pallas_rot
        self.rot_compute_dtype = str(rot_compute_dtype)
        self.rot_precision = (None if rot_precision is None
                              else str(rot_precision))
        #: Pallas patch-extraction kernel (ops/pallas_extract.py): the
        #: r3 attribution found the vmapped dynamic_slice extraction is
        #: 97% of the rollout (XLA lowers it as a whole-volume gather);
        #: the kernel measured ~4x on it (docs/tpu_performance.md).
        #: None = auto (TPU + eligible geometry); the XLA path remains
        #: the exactness oracle and the CPU path.
        self.use_pallas_extract = use_pallas_extract
        # float32 like the host path (warp_slice interpolates and returns
        # float32): an integer volume would truncate the trilinear
        # fractions to zero and silently degrade to nearest sampling
        self.volume = jnp.asarray(volume, jnp.float32)
        if self.volume.ndim != 4:
            raise ValueError("DeviceTracer volume must be (f, Z, X, Y), "
                             f"got {self.volume.shape}")
        self.step_scale = float(step_scale)
        self.max_steps = int(max_steps)
        self.min_step = float(min_step)
        self.scan_node, self._x_node = _discover_scan(model)
        ps = self._x_node.shape.spatial_shape
        if len(ps) != 3:
            raise ValueError("DeviceTracer expects a 3D patch input, got "
                             f"spatial shape {tuple(ps)}")
        self.patch_size = tuple(int(p) for p in ps)
        if any(v < p + 2 for v, p in zip(self.volume.shape[1:],
                                         self.patch_size)):
            raise ValueError(
                f"volume {tuple(self.volume.shape[1:])} too small for "
                f"patch {self.patch_size} (+1 interpolation slab)")
        # NOTE: the rollout program specialises on the seed-batch size —
        # keep it constant across calls (ShotgunRegistry pads partial
        # batches) or pay a recompile
        self._fn = None
        self._rot_kernel = self._use_pallas_rot()

    def _use_pallas_rot(self):
        import jax
        if not self.rotate_to_heading:
            return False
        if self.use_pallas_rot is not None:
            return bool(self.use_pallas_rot)
        from elektronn2_tpu.ops.pallas_extract_rot import \
            rotated_extract_eligible
        return (jax.devices()[0].platform != "cpu"
                and bool(rotated_extract_eligible(self.volume.shape,
                                                  self.volume.dtype,
                                                  self.patch_size)))

    # -- trilinear patch at a float position (translation-only warp_slice:
    #    source coord of output voxel i = pos - (p-1)/2 + i) --------------
    def _extract(self, vol, pos):
        import jax.numpy as jnp
        from jax import lax
        p = self.patch_size
        f = vol.shape[0]
        corner = pos - (jnp.asarray(p, jnp.float32) - 1.0) / 2.0
        base = jnp.floor(corner)
        frac = (corner - base).astype(vol.dtype)
        base = base.astype(jnp.int32)
        # keep the (p+1)-slab in bounds; OOB agents are masked by the caller
        maxc = jnp.asarray([vol.shape[1 + d] - (p[d] + 1) for d in range(3)],
                           jnp.int32)
        base = jnp.clip(base, 0, maxc)
        slab = lax.dynamic_slice(vol, (0, base[0], base[1], base[2]),
                                 (f, p[0] + 1, p[1] + 1, p[2] + 1))
        out = jnp.zeros((f, *p), vol.dtype)
        for dz in (0, 1):
            wz = frac[0] if dz else 1.0 - frac[0]
            for dx in (0, 1):
                wx = frac[1] if dx else 1.0 - frac[1]
                for dy in (0, 1):
                    wy = frac[2] if dy else 1.0 - frac[2]
                    out = out + (wz * wx * wy) * slab[
                        :, dz:dz + p[0], dx:dx + p[1], dy:dy + p[2]]
        return out

    # -- frame-aligned (rotated) extraction: get_tracing_slice semantics
    #    on device — world coord of output voxel i = pos + F.T @ (i - c)
    def _extract_rot_batch(self, vol, pos, headings):
        """Rotated trilinear patches for a batch: returns
        ``(patches (B, f, *p), ok (B,), F (B, 3, 3))`` — ``ok`` is the
        host ``WarpingOOBError`` criterion (every sample's interpolation
        cell inside the volume), ``F`` the per-agent flight frame.

        Cost note (measured, r4/r5): the scattered 8-corner gather is
        the whole step cost of THIS XLA path — ~2.4 K agent-steps/s on
        v5e (vs ~16/s for the host path this mode replaces). A windowed
        variant (per-agent ``dynamic_slice`` then a local gather)
        measured SLOWER (1.9 K): vmapped batch-varying dynamic_slice
        itself lowers as a gather (the r3 extraction finding). The r5
        Pallas kernel (``ops/pallas_extract_rot.py``, auto-selected
        when eligible) replaces the gather with an MXU hat-weight
        contraction over a per-agent DMA window: rollout 26.3 K
        agent-steps/s parity-grade f32 (11x; 2.4e-6 vs float64 truth)
        and 70.6 K in the bf16 single-pass mode (29x; 3.8e-3) —
        docs/tpu_performance.md r5 study. This XLA path remains the
        oracle and the fallback for ineligible geometries."""
        import jax
        import jax.numpy as jnp

        p = self.patch_size
        if getattr(self, "_rot_kernel", False):
            # r5: Pallas rotated-extraction kernel — per-agent ring-DMA
            # windows + MXU hat-weight contraction instead of the
            # whole-volume 8-corner gather (ops/pallas_extract_rot.py;
            # measured attribution in docs/tpu_performance.md r5)
            from elektronn2_tpu.ops.pallas_extract_rot import \
                rotated_patches_pallas
            F = jax.vmap(_flight_frame_jnp)(headings)
            patches, ok = rotated_patches_pallas(
                vol, pos, F, p,
                compute_dtype=getattr(self, "rot_compute_dtype",
                                      "float32"),
                precision=getattr(self, "rot_precision", None),
                interpret=jax.devices()[0].platform == "cpu")
            return patches, ok, F
        grids = jnp.meshgrid(
            *[jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0
              for n in p], indexing="ij")
        offs = jnp.stack([g.ravel() for g in grids])          # (3, P)
        dims = jnp.asarray(vol.shape[1:], jnp.float32)
        maxc = jnp.asarray([vol.shape[1 + d] - 2 for d in range(3)],
                           jnp.int32)

        def one(pos1, h):
            F = _flight_frame_jnp(h)
            # HIGHEST: on TPU this (3,P) matmul otherwise runs as a
            # single-pass-bf16 MXU dot — measured 1.7e-2 coordinate
            # noise vs float64 truth (r5 rotated-kernel study; the
            # Pallas kernel computes coords in exact f32 FMAs and lands
            # at 2.4e-6)
            coords = pos1[:, None] + jnp.matmul(
                F.T, offs,
                precision=__import__("jax").lax.Precision.HIGHEST)
            # Host criterion (transformations.source_bbox, margin=1):
            # accept iff ceil(max)+2 <= shape, i.e. coords <= dims-2
            # (ceil(x) <= n <=> x <= n for integer n); lo: floor(min) >= 0
            # <=> min >= 0.  Matches warp_slice's WarpingOOBError exactly.
            ok = jnp.all((coords >= 0.0)
                         & (coords <= dims[:, None] - 2.0))
            c0 = jnp.floor(coords)
            fr = (coords - c0).astype(vol.dtype)
            c0 = jnp.clip(c0.astype(jnp.int32), 0, maxc[:, None])
            acc = jnp.zeros((vol.shape[0], offs.shape[1]), vol.dtype)
            for dz in (0, 1):
                wz = fr[0] if dz else 1.0 - fr[0]
                for dx in (0, 1):
                    wx = fr[1] if dx else 1.0 - fr[1]
                    for dy in (0, 1):
                        wy = fr[2] if dy else 1.0 - fr[2]
                        acc = acc + (wz * wx * wy) * vol[
                            :, c0[0] + dz, c0[1] + dx, c0[2] + dy]
            return acc.reshape((vol.shape[0], *p)), ok, F

        return jax.vmap(one)(pos, headings)

    def _use_pallas(self):
        import jax
        if self.rotate_to_heading:
            return False          # translation-only kernel: not applicable
        if self.use_pallas_extract is not None:
            return bool(self.use_pallas_extract)
        from elektronn2_tpu.ops.pallas_extract import extract_eligible
        return (jax.devices()[0].platform != "cpu"
                and bool(extract_eligible(self.volume.shape,
                                          self.volume.dtype,
                                          self.patch_size)))

    def _build(self):
        import jax
        import jax.numpy as jnp

        margin = jnp.asarray(self.patch_size, jnp.float32) / 2.0 + 1.0
        dims = jnp.asarray(self.volume.shape[1:], jnp.float32)
        use_pallas = self._use_pallas()

        def inbounds(pos):
            return jnp.all((pos >= margin) & (pos < dims - margin), axis=1)

        rotate = self.rotate_to_heading

        def rollout(params, state, vol, seeds, headings0=None):
            B = seeds.shape[0]

            def body(carry, _):
                # ``alive``: the current position is a valid margin-safe
                # start. Host-Tracer parity: a step taken FROM a valid
                # position is always recorded — even if it lands beyond the
                # margin (the reference appends, then breaks on the next
                # iteration's inside() check); the agent dies afterwards.
                pos, alive, heading, rnn = carry
                if rotate:
                    patches, ok, F = self._extract_rot_batch(vol, pos,
                                                             heading)
                    alive = alive & ok     # host: rotated-cut OOB → break
                elif use_pallas:
                    from elektronn2_tpu.ops.pallas_extract import \
                        trilinear_patches_pallas
                    patches = trilinear_patches_pallas(vol, pos,
                                                       self.patch_size)
                else:
                    patches = jax.vmap(
                        lambda q: self._extract(vol, q))(pos)
                pred, rnn_new = self._step_apply(params, state, patches,
                                                 rnn)
                step = (pred.reshape(B, -1)[:, :3].astype(jnp.float32)
                        * self.step_scale)
                if rotate:
                    # prediction lives in the view's local frame → world
                    # (host: flight_frame(heading).T @ step)
                    step = jnp.einsum("bji,bj->bi", F, step)
                moved = alive & (jnp.linalg.norm(step, axis=1)
                                 >= self.min_step)
                newpos = pos + step
                pos = jnp.where(moved[:, None], newpos, pos)
                if rotate:
                    heading = jnp.where(moved[:, None], step, heading)
                alive = moved & inbounds(newpos)
                rnn = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(
                        moved.reshape((-1,) + (1,) * (new.ndim - 1)),
                        new, old),
                    rnn_new, rnn)
                return (pos, alive, heading, rnn), (pos, moved)

            pos0 = seeds.astype(jnp.float32)
            alive0 = inbounds(pos0)
            h0 = (jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0],
                                               jnp.float32), (B, 3))
                  if headings0 is None else headings0.astype(jnp.float32))
            carry0 = self._init_carry(params, state, B)
            _, (traj, alive) = jax.lax.scan(
                body, (pos0, alive0, h0, carry0), None,
                length=self.max_steps)
            return traj, alive      # (K, B, 3), (K, B)

        self._rollout = rollout          # unjitted (mesh shard_map wraps it)
        return jax.jit(rollout)

    def _build_pool(self, B, total_steps, n_seeds):
        """Respawning pool rollout (r4): ``B`` agent SLOTS scan
        ``total_steps`` steps; the moment a slot's agent dies
        (min_step stop / out-of-bounds / per-agent ``max_steps`` cap) the
        slot respawns from a DEVICE-RESIDENT seed queue on the very next
        step — so extraction+model cost is paid for useful steps, not for
        a dead batch majority (the plain rollout measured alive≈0.61 at
        the champion config: 39% of its cost bought nothing —
        docs/tpu_performance.md r3 study).

        Respawn happens INSIDE the scan (prefix-sum slot→queue matching,
        one small gather, masked carry resets): zero host syncs — at the
        tunnel's ~30 ms sync floor, host-side periodic compaction would
        cost more than the dead agents do. Slots stop consuming seeds
        after ``total_steps - max_steps`` so every consumed agent gets
        its full step budget (tail slots then idle; the driver loop
        re-queues unconsumed seeds).

        Returns a jitted ``fn(params, state, vol, seeds) -> (traj,
        moved, ids, n_consumed)`` with ``traj`` (K, B, 3), ``moved``
        (K, B) bool, ``ids`` (K, B) int32 (queue index of the agent that
        took the step; slots hold one agent contiguously), and
        ``n_consumed`` the number of queue entries taken.
        """
        import jax
        import jax.numpy as jnp

        margin = jnp.asarray(self.patch_size, jnp.float32) / 2.0 + 1.0
        dims = jnp.asarray(self.volume.shape[1:], jnp.float32)
        use_pallas = self._use_pallas()
        t_cut = max(0, int(total_steps) - int(self.max_steps))
        N = int(n_seeds)

        def inbounds(pos):
            return jnp.all((pos >= margin) & (pos < dims - margin), axis=1)

        rotate = self.rotate_to_heading

        def rollout(params, state, vol, seeds):
            carry0 = self._init_carry(params, state, B)
            import jax.numpy as _jnp
            h_def = _jnp.broadcast_to(
                _jnp.asarray([0.0, 0.0, 1.0], _jnp.float32), (B, 3))

            def body(carry, t):
                pos, alive, heading, steps, ids, ptr, rnn = carry
                # ---- respawn dead slots from the queue (device-side) --
                dead = ~alive
                do_spawn = dead & (t <= t_cut)
                cand = ptr + jnp.cumsum(do_spawn.astype(jnp.int32)) - 1
                valid = do_spawn & (cand < N)
                newpos = seeds[jnp.clip(cand, 0, N - 1)]
                vmask = valid[:, None]
                pos = jnp.where(vmask, newpos, pos)
                heading = jnp.where(vmask, h_def, heading)
                ids = jnp.where(valid, cand, ids)
                steps = jnp.where(valid, 0, steps)
                alive = alive | (valid & inbounds(newpos))
                rnn = jax.tree_util.tree_map(
                    lambda init, old: jnp.where(
                        valid.reshape((-1,) + (1,) * (init.ndim - 1)),
                        init, old),
                    carry0, rnn)
                ptr = jnp.minimum(
                    jnp.int32(N), ptr + jnp.sum(valid.astype(jnp.int32)))
                # ---- one agent step (same semantics as _build) --------
                if rotate:
                    patches, ok, F = self._extract_rot_batch(vol, pos,
                                                             heading)
                    alive = alive & ok
                elif use_pallas:
                    from elektronn2_tpu.ops.pallas_extract import \
                        trilinear_patches_pallas
                    patches = trilinear_patches_pallas(vol, pos,
                                                       self.patch_size)
                else:
                    patches = jax.vmap(
                        lambda q: self._extract(vol, q))(pos)
                pred, rnn_new = self._step_apply(params, state, patches,
                                                 rnn)
                step = (pred.reshape(B, -1)[:, :3].astype(jnp.float32)
                        * self.step_scale)
                if rotate:
                    step = jnp.einsum("bji,bj->bi", F, step)
                moved = alive & (jnp.linalg.norm(step, axis=1)
                                 >= self.min_step)
                newp = pos + step
                pos = jnp.where(moved[:, None], newp, pos)
                if rotate:
                    heading = jnp.where(moved[:, None], step, heading)
                steps = steps + moved.astype(jnp.int32)
                alive = moved & inbounds(newp) & (steps < self.max_steps)
                rnn = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(
                        moved.reshape((-1,) + (1,) * (new.ndim - 1)),
                        new, old),
                    rnn_new, rnn)
                return ((pos, alive, heading, steps, ids, ptr, rnn),
                        (pos, moved, ids))

            init = (jnp.zeros((B, 3), jnp.float32),
                    jnp.zeros((B,), bool),           # all dead → t=0 fill
                    h_def,
                    jnp.zeros((B,), jnp.int32),
                    jnp.full((B,), -1, jnp.int32),
                    jnp.int32(0),
                    carry0)
            final, (traj, moved, ids) = jax.lax.scan(
                body, init, jnp.arange(int(total_steps), dtype=jnp.int32))
            return traj, moved, ids, final[5]

        return jax.jit(rollout)

    def trace_pool(self, seeds, batch_size=512, total_steps=None,
                   save_kzip=None):
        """Compacting pool rollout over a seed queue (VERDICT r3 #4).

        ``trace_batch`` pays full extraction+model cost for dead agents
        for the remainder of the scan; this drives ``_build_pool`` —
        slots respawn from the queue on-device the step after their
        agent dies — and decodes per-slot step streams back into one
        ``Trace`` per consumed seed (slot streams are contiguous per
        agent; rows are grouped by the recorded queue index).

        ``total_steps`` (default ``max_steps * ceil(N / batch_size) +
        max_steps``) bounds the single fused dispatch; seeds not consumed
        within it are reported, not silently dropped. In
        ``rotate_to_heading`` mode every pool agent starts with the
        default (0, 0, 1) heading (per-seed initial headings would need a
        second device queue; ``trace_batch(initial_headings=...)`` covers
        that need). Returns
        ``(traces, stats)``: traces in seed order for the first
        ``stats['consumed']`` seeds; ``stats`` carries ``consumed``,
        ``effective_steps`` (recorded agent steps) and ``slot_steps``
        (B × total_steps) — effective/slot_steps is the utilization the
        respawn buys (the plain rollout's was its alive fraction).
        """
        import jax.numpy as jnp

        seeds = np.asarray(seeds, np.float32).reshape(-1, 3)
        N = len(seeds)
        B = int(batch_size)
        if total_steps is None:
            total_steps = self.max_steps * (-(-N // B) + 1)
        total_steps = int(total_steps)
        key = ("pool", B, total_steps, N)
        if not hasattr(self, "_pool_fns"):
            self._pool_fns = {}
        fn = self._pool_fns.get(key)
        if fn is None:
            fn = self._build_pool(B, total_steps, N)
            if len(self._pool_fns) >= 4:
                self._pool_fns.pop(next(iter(self._pool_fns)))
            self._pool_fns[key] = fn
        traj, moved, ids, n_used = fn(self.model.params, self.model.state,
                                      self.volume, jnp.asarray(seeds))
        traj = np.asarray(traj)                     # (K, B, 3)
        moved = np.asarray(moved)
        ids = np.asarray(ids)
        n_used = int(n_used)
        # vectorised decode (ADVICE/VERDICT r4): the per-slot Python
        # double loop was O(B * total_steps) host iterations (~tens of
        # millions at deployment scale, B=2048 x t~16k). An agent holds
        # one slot contiguously, so flattening slot-major keeps each
        # agent's steps in k-order and ONE stable argsort groups them.
        mt = moved.T                                # (B, K)
        ids_f = ids.T[mt]                           # (M,) recorded rows
        pts_f = traj.transpose(1, 0, 2)[mt]         # (M, 3)
        order = np.argsort(ids_f, kind="stable")
        ids_s = ids_f[order]
        pts_s = pts_f[order].astype(np.float64)
        cuts = np.searchsorted(ids_s, np.arange(n_used + 1))
        traces = []
        for i in range(n_used):
            traces.append(Trace(np.concatenate(
                [seeds[i:i + 1].astype(np.float64),
                 pts_s[cuts[i]:cuts[i + 1]]], axis=0)))
        stats = {"consumed": n_used,
                 "effective_steps": int(moved.sum()),
                 "slot_steps": B * total_steps}
        if save_kzip:
            from elektronn2_tpu.data.skeleton import trace_to_kzip
            trace_to_kzip(traces, save_kzip)
        return traces, stats

    def _build_pool_chained(self, B, wave_steps, N):
        """Chained-wave pool rollout (r5, VERDICT r4 #4b): like
        ``_build_pool`` but the scan carry crosses dispatches — live
        agents CONTINUE into the next wave instead of idling out a
        single wave's drain tail (the plain pool measured util 0.84:
        the residual 16% was entirely that tail).

        Differences from the single-wave builder: (1) the carry comes
        in as an argument and returns with the results, (2) there is no
        consumption time-cut — an agent spawned near the wave's end
        carries its remaining budget into the next wave, (3) the queue
        length is a traced scalar ``n_q`` (final waves run with a
        partial or empty queue to drain carried agents), (4) recorded
        ids are globalised with ``id_offset`` so the decoder can stitch
        steps across waves.

        Returns a jitted ``fn(params, state, vol, seeds, n_q,
        id_offset, carry) -> (traj, moved, ids, n_consumed,
        carry_out)``; ``carry`` = (pos, alive, heading, steps, ids,
        rnn) — build the first one with ``_pool_carry0``.
        """
        import jax
        import jax.numpy as jnp

        margin = jnp.asarray(self.patch_size, jnp.float32) / 2.0 + 1.0
        dims = jnp.asarray(self.volume.shape[1:], jnp.float32)
        use_pallas = self._use_pallas()
        N = int(N)

        def inbounds(pos):
            return jnp.all((pos >= margin) & (pos < dims - margin), axis=1)

        rotate = self.rotate_to_heading

        def rollout(params, state, vol, seeds, n_q, id_offset, carry_in):
            h_def = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (B, 3))

            def body(carry, t):
                pos, alive, heading, steps, ids, ptr, rnn = carry
                dead = ~alive
                cand = ptr + jnp.cumsum(dead.astype(jnp.int32)) - 1
                valid = dead & (cand < n_q)
                newpos = seeds[jnp.clip(cand, 0, N - 1)]
                vmask = valid[:, None]
                pos = jnp.where(vmask, newpos, pos)
                heading = jnp.where(vmask, h_def, heading)
                ids = jnp.where(valid, cand + id_offset, ids)
                steps = jnp.where(valid, 0, steps)
                alive = alive | (valid & inbounds(newpos))
                rnn = jax.tree_util.tree_map(
                    lambda init, old: jnp.where(
                        valid.reshape((-1,) + (1,) * (init.ndim - 1)),
                        init, old),
                    carry0, rnn)
                ptr = jnp.minimum(
                    jnp.int32(N), ptr + jnp.sum(valid.astype(jnp.int32)))
                if rotate:
                    patches, ok, F = self._extract_rot_batch(vol, pos,
                                                             heading)
                    alive = alive & ok
                elif use_pallas:
                    from elektronn2_tpu.ops.pallas_extract import \
                        trilinear_patches_pallas
                    patches = trilinear_patches_pallas(vol, pos,
                                                       self.patch_size)
                else:
                    patches = jax.vmap(
                        lambda q: self._extract(vol, q))(pos)
                pred, rnn_new = self._step_apply(params, state, patches,
                                                 rnn)
                step = (pred.reshape(B, -1)[:, :3].astype(jnp.float32)
                        * self.step_scale)
                if rotate:
                    step = jnp.einsum("bji,bj->bi", F, step)
                moved = alive & (jnp.linalg.norm(step, axis=1)
                                 >= self.min_step)
                newp = pos + step
                pos = jnp.where(moved[:, None], newp, pos)
                if rotate:
                    heading = jnp.where(moved[:, None], step, heading)
                steps = steps + moved.astype(jnp.int32)
                alive = moved & inbounds(newp) & (steps < self.max_steps)
                rnn = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(
                        moved.reshape((-1,) + (1,) * (new.ndim - 1)),
                        new, old),
                    rnn_new, rnn)
                return ((pos, alive, heading, steps, ids, ptr, rnn),
                        (pos, moved, ids))

            carry0 = self._init_carry(params, state, B)
            pos_i, alive_i, head_i, steps_i, ids_i, rnn_i = carry_in
            init = (pos_i, alive_i, head_i, steps_i, ids_i,
                    jnp.int32(0), rnn_i)
            final, (traj, moved, ids) = jax.lax.scan(
                body, init, jnp.arange(int(wave_steps), dtype=jnp.int32))
            carry_out = (final[0], final[1], final[2], final[3],
                         final[4], final[6])
            return traj, moved, ids, final[5], carry_out

        return jax.jit(rollout)

    def _pool_carry0(self, B):
        """All-dead initial chain carry (host-built, one device init)."""
        import jax
        import jax.numpy as jnp
        rnn0 = jax.jit(lambda p, s: self._init_carry(p, s, B))(
            self.model.params, self.model.state)
        return (jnp.zeros((B, 3), jnp.float32),
                jnp.zeros((B,), bool),
                jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0],
                                             jnp.float32), (B, 3)),
                jnp.zeros((B,), jnp.int32),
                jnp.full((B,), -1, jnp.int32),
                rnn0)

    def trace_pool_chain(self, seed_source, batch_size=512,
                         wave_seeds=None, wave_steps=None, register=None,
                         save_kzip=None):
        """Drain seeds through CHAINED pool waves (r5, VERDICT r4 #4b).

        ``trace_pool`` pays one drain tail PER WAVE (slots idle once the
        wave's queue empties — measured util 0.84). Here the scan carry
        crosses dispatches, so live agents keep stepping into the next
        wave and the tail is paid once at the very end of the whole
        drain: interior-wave utilization approaches 1.

        ``seed_source``: either an array-like of seeds or a callable
        returning one seed per call (``None`` = exhausted) — e.g.
        ``ShotgunRegistry.next_seed`` for between-wave dedupe.
        ``register``: optional callback invoked with each COMPLETED
        ``Trace`` between waves (feeds the registry's dedupe KDT while
        later waves still run). Returns ``(traces, stats)`` with traces
        in global consumption order; stats adds ``waves`` and ``util``.
        """
        import jax.numpy as jnp

        B = int(batch_size)
        if wave_seeds is None:
            wave_seeds = 8 * B
        N = int(wave_seeds)
        if wave_steps is None:
            wave_steps = self.max_steps * max(1, N // max(1, B))
        wave_steps = int(wave_steps)
        if callable(seed_source):
            get_seed = seed_source
        else:
            _pending = [np.asarray(s, np.float64)
                        for s in np.asarray(seed_source,
                                            np.float64).reshape(-1, 3)]
            _pending.reverse()

            def get_seed():
                return _pending.pop() if _pending else None

        key = ("chain", B, wave_steps, N)
        if not hasattr(self, "_pool_fns"):
            self._pool_fns = {}
        fn = self._pool_fns.get(key)
        if fn is None:
            fn = self._build_pool_chained(B, wave_steps, N)
            if len(self._pool_fns) >= 4:
                self._pool_fns.pop(next(iter(self._pool_fns)))
            self._pool_fns[key] = fn

        carry = self._pool_carry0(B)
        offset = 0
        queue_back = []                       # unconsumed wave seeds
        global_seeds = []                     # gid -> seed (consumed)
        open_pts = {}                         # gid -> [np (n,3) chunks]
        pending_fin = set()                   # consumed, not finalized
        traces_by_gid = {}
        eff = 0
        waves = 0
        while True:
            wave = list(queue_back)
            queue_back = []
            while len(wave) < N:
                s = get_seed()
                if s is None:
                    break
                wave.append(np.asarray(s, np.float64))
            n_q = len(wave)
            any_alive = bool(np.asarray(carry[1]).any())
            if n_q == 0 and not any_alive:
                break
            padded = np.zeros((N, 3), np.float32)
            if n_q:
                padded[:n_q] = np.asarray(wave, np.float32)
            traj, moved, ids, n_used, carry = fn(
                self.model.params, self.model.state, self.volume,
                jnp.asarray(padded), jnp.int32(n_q), jnp.int32(offset),
                carry)
            waves += 1
            n_used = int(n_used)
            moved_np = np.asarray(moved)
            eff += int(moved_np.sum())
            # ---- vectorised cross-wave decode (slot-major, stable) ----
            mt = moved_np.T
            ids_f = np.asarray(ids).T[mt]
            pts_f = np.asarray(traj).transpose(1, 0, 2)[mt]
            order = np.argsort(ids_f, kind="stable")
            ids_s = ids_f[order]
            pts_s = pts_f[order].astype(np.float64)
            bounds = np.searchsorted(
                ids_s, np.unique(ids_s))
            for gi, lo in zip(np.unique(ids_s), bounds):
                hi = np.searchsorted(ids_s, gi, side="right")
                open_pts.setdefault(int(gi), []).append(pts_s[lo:hi])
            global_seeds.extend(wave[:n_used])
            pending_fin.update(range(offset, offset + n_used))
            queue_back = wave[n_used:]
            offset += n_used
            # ---- finalize traces whose agent is no longer live --------
            # (a consumed seed with zero recorded steps — e.g. an OOB
            # spawn that died instantly — still yields its seed-only
            # Trace, matching trace_pool)
            live = set(np.asarray(carry[4])[np.asarray(carry[1])]
                       .tolist())
            for gi in sorted(pending_fin - live):
                pts = np.concatenate(
                    [np.asarray(global_seeds[gi],
                                np.float64).reshape(1, 3)]
                    + open_pts.pop(gi, []), axis=0)
                t = Trace(pts)
                traces_by_gid[gi] = t
                pending_fin.discard(gi)
                if register is not None:
                    register(t)
        # agents all dead at loop exit; every open gid is finalized
        traces = [traces_by_gid[g] for g in sorted(traces_by_gid)]
        stats = {"consumed": offset,
                 "effective_steps": eff,
                 "slot_steps": B * wave_steps * waves,
                 "waves": waves,
                 "util": round(eff / max(1, B * wave_steps * waves), 3)}
        if save_kzip:
            from elektronn2_tpu.data.skeleton import trace_to_kzip
            trace_to_kzip(traces, save_kzip)
        return traces, stats

    def trace_batch(self, seeds, save_kzip=None, mesh=None,
                    axis_name="data", initial_headings=None):
        """Roll out a batch of agents; returns a list of ``Trace``.
        ``save_kzip``: also write the traces as a KNOSSOS annotation
        (``skeleton.trace_to_kzip``). ``initial_headings``: (B, 3) world
        headings orienting the first frame-aligned views when
        ``rotate_to_heading=True`` (default (0, 0, 1) — the host
        ``Tracer.trace`` convention; ignored otherwise).

        ``mesh``: shard the AGENT batch over ``axis_name`` of a device
        mesh (pod-scale tracing). Agents are embarrassingly parallel and
        the single-chip rollout saturates at B≈256
        (docs/tpu_performance.md r3 study), so DP over agents is the
        scale-out lever: the volume and params replicate, seeds shard,
        one program runs on every chip with zero collectives in the
        rollout. The batch is padded to a multiple of the axis size
        (surplus trimmed) and results are identical to the unsharded
        rollout."""
        import jax
        import jax.numpy as jnp
        seeds = np.asarray(seeds, np.float32).reshape(-1, 3)
        heads = (np.broadcast_to(np.asarray([0.0, 0.0, 1.0], np.float32),
                                 seeds.shape).copy()
                 if initial_headings is None
                 else np.asarray(initial_headings,
                                 np.float32).reshape(-1, 3))
        if len(heads) != len(seeds):
            raise ValueError(f"initial_headings: {len(heads)} headings "
                             f"for {len(seeds)} seeds")
        if self._fn is None:
            self._fn = self._build()
        n_real = len(seeds)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            n = int(mesh.shape[axis_name])
            pad = (-n_real) % n
            seeds_dev = np.concatenate(
                [seeds, np.repeat(seeds[-1:], pad, axis=0)]) \
                if pad else seeds
            heads_dev = np.concatenate(
                [heads, np.repeat(heads[-1:], pad, axis=0)]) \
                if pad else heads
            sh = NamedSharding(mesh, P(axis_name))
            seeds_dev = jax.device_put(jnp.asarray(seeds_dev), sh)
            heads_dev = jax.device_put(jnp.asarray(heads_dev), sh)
            repl = NamedSharding(mesh, P())
            params = jax.device_put(self.model.params, repl)
            state = jax.device_put(self.model.state, repl)
            vol = jax.device_put(self.volume, repl)
            # shard_map (not GSPMD propagation): agents are independent,
            # so each device runs the whole rollout program — incl. the
            # Pallas extraction kernel, which XLA cannot auto-partition —
            # on its local seed shard with zero collectives
            key = ("mesh", id(mesh), axis_name)
            fn_m = self._mesh_fns.get(key) if hasattr(self, "_mesh_fns") \
                else None
            if fn_m is None:
                if not hasattr(self, "_mesh_fns"):
                    self._mesh_fns = {}
                fn_m = jax.jit(jax.shard_map(
                    self._rollout, mesh=mesh,
                    in_specs=(P(), P(), P(), P(axis_name), P(axis_name)),
                    out_specs=(P(None, axis_name, None),
                               P(None, axis_name)),
                    check_vma=False))
                if len(self._mesh_fns) >= 4:    # FIFO: a fresh Mesh per
                    # call would otherwise pin meshes+executables forever
                    self._mesh_fns.pop(next(iter(self._mesh_fns)))
                self._mesh_fns[key] = fn_m
            traj, alive = fn_m(params, state, vol, seeds_dev, heads_dev)
            if not traj.is_fully_addressable:
                # the outputs span non-addressable devices: assemble the
                # global value on every host (each process returns ALL
                # traces — the single-host contract, kept multi-host).
                # ADVICE r4: gate on addressability, NOT process_count():
                # a host-local mesh in a multi-process job is already
                # fully addressable and an allgather would concatenate
                # along the step axis, corrupting shapes.
                from jax.experimental import multihost_utils
                traj = multihost_utils.process_allgather(traj,
                                                         tiled=True)
                alive = multihost_utils.process_allgather(alive,
                                                          tiled=True)
            traj = jax.device_get(traj)[:, :n_real]
            alive = jax.device_get(alive)[:, :n_real]
        else:
            traj, alive = self._fn(self.model.params, self.model.state,
                                   self.volume, jnp.asarray(seeds),
                                   jnp.asarray(heads))
        traj = np.asarray(traj).transpose(1, 0, 2)      # (B, K, 3)
        alive = np.asarray(alive).T                     # (B, K)
        traces = []
        for b in range(len(seeds)):
            pts = np.concatenate([seeds[b:b + 1].astype(np.float64),
                                  traj[b][alive[b]]], axis=0)
            traces.append(Trace(pts))
        if save_kzip:
            from elektronn2_tpu.data.skeleton import trace_to_kzip
            trace_to_kzip(traces, save_kzip)
        return traces

    def trace(self, seed_position, initial_heading=None):
        """Single-agent convenience wrapper (host ``Tracer`` interface)."""
        heads = None if initial_heading is None \
            else np.asarray(initial_heading, np.float32).reshape(1, 3)
        return self.trace_batch([seed_position],
                                initial_headings=heads)[0]

    def tune_batch(self, candidates=(256, 512, 1024, 2048), steps=64,
                   repeats=2, verbose=False):
        """Measure agent-batch throughput on the live device and return
        ``{"best": B, "table": {B: agent_steps_per_s}}``.

        Per-chip rollout throughput is NOT monotonic in the agent batch
        (the r3 study found a B=1024 cliff; r4 attributed it to one-call
        kernel grid size and fixed it by splitting extraction calls at
        512 agents — throughput now grows to B≈2048, but the XLA path
        still peaks ≈256 and tails exist — docs/tpu_performance.md), so
        deployments batching thousands of seeds (``ShotgunRegistry``)
        should split them at the measured optimum. Each
        candidate is measured with the sustained protocol on a SHORT
        rollout (``steps``) — per-step cost is what varies with B, so
        the short probe ranks like the full one.
        """
        import time as _time

        import jax.numpy as jnp

        saved_fn, saved_steps = self._fn, self.max_steps
        rng = np.random.RandomState(0)
        lo = [m + 1 for m in np.asarray(self.patch_size) / 2.0 + 1.0]
        hi = [d - m - 1 for d, m in zip(self.volume.shape[1:], lo)]
        if any(h < l for l, h in zip(lo, hi)):
            # np.random.uniform silently accepts a reversed range, which
            # would probe OOB seeds without complaint (advisor r3)
            raise ValueError(
                f"volume {tuple(self.volume.shape[1:])} too small to "
                f"sample interior probe seeds for patch "
                f"{tuple(self.patch_size)} (need every dim > patch + 4)")
        table = {}
        try:
            self.max_steps = int(steps)
            for B in candidates:
                self._fn = None              # respecialise on (B, steps)
                seeds = jnp.asarray(
                    np.stack([rng.uniform(l, h, B)
                              for l, h in zip(lo, hi)], 1), jnp.float32)
                fn = self._build()
                traj, _ = fn(self.model.params, self.model.state,
                             self.volume, seeds)
                traj.block_until_ready()
                traj, _ = fn(self.model.params, self.model.state,
                             self.volume, seeds)     # double warm-up
                traj.block_until_ready()
                best = None
                for _ in range(2):
                    t0 = _time.perf_counter()
                    for _ in range(repeats):
                        traj, _ = fn(self.model.params, self.model.state,
                                     self.volume, seeds)
                    traj.block_until_ready()
                    dt = (_time.perf_counter() - t0) / repeats
                    best = dt if best is None else min(best, dt)
                table[int(B)] = round(B * steps / best, 1)
                if verbose:
                    print(f"tune_batch: B={B} -> "
                          f"{table[int(B)] / 1e3:.1f} K agent-steps/s",
                          flush=True)
        finally:
            self._fn, self.max_steps = saved_fn, saved_steps
        best_b = max(table, key=table.get)
        return {"best": best_b, "table": table}
