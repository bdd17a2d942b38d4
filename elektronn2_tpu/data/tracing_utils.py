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


class Tracer:
    """Iteratively apply a step-prediction model to follow a neurite.

    The model must predict a 3-vector step from an image patch (plus a
    carried hidden state when recurrent). ``model.predict`` is called per
    step on a batch of one agent (batching multiple agents: use
    ``trace_many``).
    """

    def __init__(self, model, volume, step_scale=1.0, max_steps=500,
                 stop_on_oob=True):
        self.model = model
        self.volume = volume            # (f, Z, X, Y)
        self.step_scale = float(step_scale)
        self.max_steps = int(max_steps)
        self.stop_on_oob = stop_on_oob
        ps = model.input_node.shape.spatial_shape
        self.patch_size = ps
        self.cube = CubeShape(volume.shape[1:],
                              np.asarray(ps) / 2 + 1)

    def trace(self, seed_position):
        """Trace from a seed; returns a ``Trace``."""
        pos = np.asarray(seed_position, np.float64)
        trace = Trace([pos])
        for _ in range(self.max_steps):
            if not self.cube.inside(pos):
                if self.stop_on_oob:
                    break
                pos = self.cube.clip(pos)
            try:
                patch = warp_slice(self.volume, self.patch_size,
                                   position=pos)
            except WarpingOOBError:
                break
            step = np.asarray(self.model.predict(patch[None]))[0]
            step = step.reshape(-1)[:3] * self.step_scale
            if np.linalg.norm(step) < 1e-4:
                break
            pos = pos + step
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
        from elektronn2_tpu.utils.basic import DynamicKDT
        self._kdt = None

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

    def run(self, tracer):
        """Drain the registry through a tracer."""
        while True:
            seed = self.next_seed()
            if seed is None:
                break
            t = tracer.trace(seed)
            self.register(t)
            logger.info(f"traced {len(t)} steps from {seed}")
        return self.traces
