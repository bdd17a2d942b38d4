"""Neurite skeletons: representation, sampling, tracing targets.

Reference: ``elektronn2/data/skeleton.py::SkeletonMFK, Trace`` — skeleton
graphs from KNOSSOS NML / k.zip annotation files, geometry for the tracing
agent (local frames along the neurite, next-step direction targets, KD-tree
nearest-node queries, flight-path generation).

The KD-tree query lives on the host (scipy cKDTree via
``utils.basic.DynamicKDT``); inside jitted losses it is reached through
``jax.pure_callback`` with a custom VJP (``skel_loss_callback``) — the same
host-op pattern as the reference's non-symbolic skeleton ops.
"""

from __future__ import annotations

import io
import os
import zipfile
import xml.etree.ElementTree as ET

import numpy as np
import jax
import jax.numpy as jnp

from elektronn2_tpu.log import logger
from elektronn2_tpu.utils.basic import AccumulationArray, DynamicKDT


class Trace:
    """A recorded flight path of the tracing agent.

    Reference: ``skeleton.py::Trace`` — positions + runtime features,
    incremental direction statistics.
    """

    def __init__(self, positions=None):
        self.positions = AccumulationArray(right_shape=(3,),
                                           dtype=np.float64)
        if positions is not None:
            for p in np.asarray(positions, np.float64).reshape(-1, 3):
                self.positions.append(p)

    def append(self, position):
        self.positions.append(np.asarray(position, np.float64))

    @property
    def coords(self):
        return self.positions.data

    def avg_dir(self, n_last=5):
        c = self.coords
        if len(c) < 2:
            return np.array([0.0, 0.0, 1.0])
        seg = c[-1] - c[max(0, len(c) - n_last)]
        n = np.linalg.norm(seg)
        return seg / n if n > 0 else np.array([0.0, 0.0, 1.0])

    def tortuosity(self, n_last=None):
        c = self.coords if n_last is None else self.coords[-n_last:]
        if len(c) < 3:
            return 1.0
        path = np.linalg.norm(np.diff(c, axis=0), axis=1).sum()
        chord = np.linalg.norm(c[-1] - c[0])
        return float(path / max(chord, 1e-9))

    def __len__(self):
        return len(self.positions)


def _parse_nml(data):
    """Parse KNOSSOS NML XML → (nodes {id: (z,x,y)}, edges [(a,b)], radii)."""
    root = ET.fromstring(data)
    nodes, edges, radii = {}, [], {}
    for thing in root.iter("thing"):
        for node in thing.iter("node"):
            nid = int(node.get("id"))
            # NML stores x, y, z; framework order is (z, x, y)
            nodes[nid] = (float(node.get("z")), float(node.get("x")),
                          float(node.get("y")))
            radii[nid] = float(node.get("radius", 1.0))
        for edge in thing.iter("edge"):
            edges.append((int(edge.get("source")), int(edge.get("target"))))
    return nodes, edges, radii


def _build_nml(things, scale=(1.0, 1.0, 1.0), experiment="elektronn2_tpu"):
    """Serialise skeleton graphs to KNOSSOS NML XML (the inverse of
    ``_parse_nml``). ``things``: list of ``(positions (n,3) zxy, edges
    (m,2) 0-based, radii (n,)|None, comment|None)``. Node ids are global
    across things (KNOSSOS requires uniqueness file-wide); float
    coordinates are written with ``repr`` so load(save(x)) round-trips
    bit-exactly. Reference: ``skeleton.py::trace_to_kzip`` (SURVEY §3.2).
    """
    root = ET.Element("things")
    params = ET.SubElement(root, "parameters")
    ET.SubElement(params, "experiment", name=str(experiment))
    ET.SubElement(params, "scale", x=repr(float(scale[1])),
                  y=repr(float(scale[2])), z=repr(float(scale[0])))
    next_id = 1
    for t_id, (pos, edges, radii, comment) in enumerate(things, start=1):
        pos = np.asarray(pos, np.float64).reshape(-1, 3)
        attrs = {"id": str(t_id)}
        if comment is not None:     # '' is a valid (empty) comment
            attrs["comment"] = str(comment)
        thing = ET.SubElement(root, "thing", **attrs)
        nodes_el = ET.SubElement(thing, "nodes")
        base = next_id
        for i, p in enumerate(pos):
            r = 1.0 if radii is None else float(radii[i])
            # framework order (z, x, y) → NML stores x, y, z
            ET.SubElement(nodes_el, "node", id=str(base + i),
                          radius=repr(r), x=repr(float(p[1])),
                          y=repr(float(p[2])), z=repr(float(p[0])),
                          inVp="0", inMag="1", time="0")
        next_id = base + len(pos)
        edges_el = ET.SubElement(thing, "edges")
        for a, b in np.asarray(edges, np.int64).reshape(-1, 2):
            ET.SubElement(edges_el, "edge", source=str(base + int(a)),
                          target=str(base + int(b)))
    ET.SubElement(root, "comments")
    ET.SubElement(root, "branchpoints")
    ET.indent(root)
    return ET.tostring(root, encoding="utf-8", xml_declaration=True)


def _write_nml_file(fname, things, scale=(1.0, 1.0, 1.0),
                    experiment="elektronn2_tpu", force_zip=False):
    """Write NML — bare ``.nml``, or zipped as ``annotation.xml`` inside a
    ``.k.zip``/``.zip`` (the member name KNOSSOS itself writes and
    expects in its annotation container; our loader accepts .nml too)."""
    fname = os.fspath(fname)
    data = _build_nml(things, scale=scale, experiment=experiment)
    if force_zip or fname.endswith((".k.zip", ".zip")):
        with zipfile.ZipFile(fname, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("annotation.xml", data)
    else:
        with open(fname, "wb") as f:
            f.write(data)
    return fname


def trace_to_kzip(traces, fname, scale=(1.0, 1.0, 1.0),
                  experiment="elektronn2_tpu", comments=None):
    """Export tracing results as a KNOSSOS-loadable annotation.

    ``traces``: ``Trace`` objects (or bare (n,3) coordinate arrays, z,x,y
    order). Each trace becomes one ``thing`` whose nodes are chained by
    consecutive edges — the flight path as a KNOSSOS skeleton. This closes
    the reference's deployment loop (trace → inspect in KNOSSOS):
    ``skeleton.py::trace_to_kzip`` (SURVEY §3.2).
    """
    things = []
    for i, tr in enumerate(traces):
        coords = tr.coords if isinstance(tr, Trace) else \
            np.asarray(tr, np.float64).reshape(-1, 3)
        n = len(coords)
        edges = np.stack([np.arange(n - 1), np.arange(1, n)], 1) \
            if n > 1 else np.zeros((0, 2), np.int64)
        # a short comments list falls back per-trace (review r2: indexing
        # comments[i] unguarded raised IndexError); None entries fall back
        # too, but an explicit '' is preserved
        comment = (comments[i]
                   if comments is not None and i < len(comments)
                   and comments[i] is not None
                   else f"trace_{i}")
        things.append((coords, edges, None, comment))
    return _write_nml_file(fname, things, scale=scale,
                           experiment=experiment)


class SkeletonMFK:
    """A neurite skeleton graph with tracing geometry.

    Reference: ``skeleton.py::SkeletonMFK`` (Killinger's "MFK" skeleton).
    Holds node positions (z, x, y), edges, radii; provides KD-tree queries,
    flight-path sampling and next-step direction targets.
    """

    def __init__(self, positions, edges, radii=None):
        self.positions = np.asarray(positions, np.float64).reshape(-1, 3)
        self.edges = np.asarray(edges, np.int64).reshape(-1, 2)
        self.radii = (np.asarray(radii, np.float64)
                      if radii is not None
                      else np.ones(len(self.positions)))
        self._adj = [[] for _ in range(len(self.positions))]
        for a, b in self.edges:
            self._adj[a].append(b)
            self._adj[b].append(a)
        self._kdt = DynamicKDT(self.positions)

    # ------------------------------------------------------------- loading
    @classmethod
    def load(cls, fname):
        """Load from .nml, .k.zip, or .npz (positions/edges arrays)."""
        fname = os.fspath(fname)
        if fname.endswith(".npz"):
            z = np.load(fname)
            return cls(z["positions"], z["edges"],
                       z["radii"] if "radii" in z.files else None)
        if fname.endswith((".k.zip", ".zip")):
            with zipfile.ZipFile(fname) as zf:
                # KNOSSOS itself stores the skeleton as annotation.xml;
                # our own writer (and some tools) use .nml — accept both
                nml_names = [n for n in zf.namelist()
                             if n.endswith((".nml", ".xml"))]
                if not nml_names:
                    raise ValueError(
                        f"{fname}: no .nml/.xml skeleton file inside the "
                        f"zip (members: {zf.namelist()[:5]}...)")
                data = zf.read(nml_names[0])
        else:
            with open(fname, "rb") as f:
                data = f.read()
        nodes, edges, radii = _parse_nml(data)
        ids = sorted(nodes)
        remap = {nid: i for i, nid in enumerate(ids)}
        pos = np.array([nodes[i] for i in ids])
        e = np.array([(remap[a], remap[b]) for a, b in edges
                      if a in remap and b in remap])
        r = np.array([radii[i] for i in ids])
        return cls(pos, e, r)

    def save(self, fname, scale=(1.0, 1.0, 1.0)):
        """Save as .npz (arrays), .nml (KNOSSOS XML), or .k.zip/.zip
        (zipped NML) — format picked from the extension, so the skeleton
        round-trips through KNOSSOS as well as numpy."""
        fname = os.fspath(fname)
        if fname.endswith((".nml", ".k.zip", ".zip")):
            return _write_nml_file(
                fname, [(self.positions, self.edges, self.radii, None)],
                scale=scale)
        np.savez(fname, positions=self.positions, edges=self.edges,
                 radii=self.radii)
        # np.savez appends .npz when missing — return the path it WROTE
        return fname if fname.endswith(".npz") else fname + ".npz"

    def to_kzip(self, fname, scale=(1.0, 1.0, 1.0)):
        """Explicit KNOSSOS export (k.zip), regardless of extension."""
        return _write_nml_file(
            fname, [(self.positions, self.edges, self.radii, None)],
            scale=scale, force_zip=True)

    # ------------------------------------------------------------- queries
    def get_closest_node(self, position):
        dist, pts, idx = self._kdt.get_knn(np.asarray(position,
                                                      np.float64), k=1)
        return int(idx), float(dist)

    def distance_to_skeleton(self, positions):
        """Distance of arbitrary points to the nearest skeleton node."""
        d, _, _ = self._kdt.get_knn(np.asarray(positions, np.float64), k=1)
        return np.atleast_1d(d)

    # ------------------------------------------------------ flight sampling
    def sample_node(self, rng):
        return int(rng.randint(len(self.positions)))

    def walk(self, start, n_steps, rng, avoid_backtrack=True):
        """Random walk along edges: list of node indices (may repeat at
        dead ends)."""
        path = [start]
        prev = -1
        cur = start
        for _ in range(n_steps):
            nbrs = self._adj[cur]
            if not nbrs:
                path.append(cur)
                continue
            cand = [n for n in nbrs if n != prev] or nbrs
            nxt = cand[rng.randint(len(cand))]
            path.append(nxt)
            prev, cur = cur, nxt
        return path

    def direction_target(self, position, lookahead=2, heading=None):
        """Unit direction from ``position`` toward the skeleton, then along
        it: the tracing training target (reference: next-step vector toward
        / along the neurite).

        A bare skeleton is undirected, so "along" is ambiguous; pass
        ``heading`` (the agent's flight direction — e.g. the walk step in
        ``sample_tracing_batch``) to pick the continuation aligned with
        it. Without a heading the walk greedily maximises distance from
        ``position``, which can point backward when the query sits just
        past a node.
        """
        position = np.asarray(position, np.float64)
        idx, dist = self.get_closest_node(position)
        target_node = idx
        prev = None
        for _ in range(lookahead):
            # never step BACK to where we came from: at a skeleton
            # endpoint the walk used to bounce (N-1 → N → N-1), landing
            # the target on top of the query and emitting the degenerate
            # [0,0,1] default as a training label (review r2 s5)
            nbrs = [n for n in self._adj[target_node] if n != prev]
            if not nbrs:
                break
            if heading is not None:
                h = np.asarray(heading, np.float64)
                nxt = max(nbrs, key=lambda n: float(
                    (self.positions[n] - position) @ h))
            else:
                # walk toward the neighbour farthest from current position
                nxt = max(nbrs, key=lambda n: np.linalg.norm(
                    self.positions[n] - position))
            prev, target_node = target_node, nxt
        vec = self.positions[target_node] - position
        n = np.linalg.norm(vec)
        return vec / n if n > 0 else np.array([0.0, 0.0, 1.0])

    def local_frame(self, node_idx):
        """Orthonormal frame at a node: (tangent, normal1, normal2)."""
        from elektronn2_tpu.data.transformations import flight_frame
        nbrs = self._adj[node_idx]
        if nbrs:
            t = self.positions[nbrs[0]] - self.positions[node_idx]
        else:
            t = np.array([0.0, 0.0, 1.0])
        return flight_frame(t)

    def __repr__(self):
        return (f"<SkeletonMFK {len(self.positions)} nodes, "
                f"{len(self.edges)} edges>")


# --------------------------------------------------------------- skel loss

def _make_skel_loss(skeletons):
    """Host function: squared distance of landing points to skeleton +
    gradient, per sample. ``skeletons``: list indexed by sample skel id."""

    def host(landing, skel_ids):
        landing = np.asarray(landing, np.float64)
        out_d = np.zeros(len(landing), np.float32)
        out_g = np.zeros((len(landing), 3), np.float32)
        for i, (p, sid) in enumerate(zip(landing, skel_ids)):
            sk = skeletons[int(sid)]
            idx, dist = sk.get_closest_node(p)
            diff = p - sk.positions[idx]
            out_d[i] = dist ** 2
            out_g[i] = 2.0 * diff
        return out_d, out_g

    return host


def skel_loss_callback(pred, skel_feed, positions=None, skeletons=None):
    """Differentiable skeleton distance loss inside jit.

    ``pred``: (b, 3) predicted step vectors; ``skel_feed``: (b, 4) rows of
    [skel_id, z, x, y] current positions (fed as a GenericInput). Loss per
    sample = squared distance of (position + step) to the skeleton.
    Gradient flows to ``pred`` through a custom VJP whose backward uses the
    host-computed direction to the nearest node.
    """
    if skeletons is None:
        skeletons = _SKELETON_REGISTRY
    host = _make_skel_loss(skeletons)

    @jax.custom_vjp
    def loss(pred, skel_feed):
        landing = skel_feed[:, 1:4] + pred
        d, _ = jax.pure_callback(
            host,
            (jax.ShapeDtypeStruct((pred.shape[0],), jnp.float32),
             jax.ShapeDtypeStruct((pred.shape[0], 3), jnp.float32)),
            landing, skel_feed[:, 0].astype(jnp.int32),
            vmap_method="sequential")
        return d

    def fwd(pred, skel_feed):
        landing = skel_feed[:, 1:4] + pred
        d, g = jax.pure_callback(
            host,
            (jax.ShapeDtypeStruct((pred.shape[0],), jnp.float32),
             jax.ShapeDtypeStruct((pred.shape[0], 3), jnp.float32)),
            landing, skel_feed[:, 0].astype(jnp.int32),
            vmap_method="sequential")
        return d, g

    def bwd(g_saved, ct):
        return (ct[:, None] * g_saved, None)

    loss.defvjp(fwd, bwd)
    return loss(pred, skel_feed)


#: module registry so SkelLoss nodes can reference skeletons by integer id
#: (node specs must stay JSON-serialisable)
_SKELETON_REGISTRY = []


def register_skeleton(sk):
    _SKELETON_REGISTRY.append(sk)
    return len(_SKELETON_REGISTRY) - 1


def clear_skeleton_registry():
    _SKELETON_REGISTRY.clear()


# ------------------------------------------------------- tracing batches

def sample_tracing_batch(agent_data, batch_size, n_steps, rng,
                         source="train"):
    """(patch sequences, direction targets) for TracingTrainer.

    For each sample: pick a skeleton + walk; at each step cut the image
    patch at the current position and compute the direction target. Returns
    sequences shaped (n_steps, b, ...) for ScanN consumption.

    With ``agent_data.rotate_to_heading`` the views are cut in the local
    flight frame (``get_tracing_slice`` — the patch z-axis looks along the
    agent's last hop) and the direction targets are expressed in that same
    frame; roll out with ``Tracer(rotate_to_heading=True)``, which inverts
    the frame per step. Default: axis-aligned views, world-frame targets
    (what ``DeviceTracer`` supports on device).

    t=0 convention: training teacher-forces the first view along the
    walk's first hop (the sampler knows it; a cold rollout does not) —
    at deployment pass the seed's orientation as
    ``Tracer.trace(initial_heading=...)`` to match; the default
    ``(0, 0, 1)`` first view is off-distribution for one step and the
    frame locks onto the agent's own motion from step 1.
    ``source='valid'`` cuts patches from the held-out cubes so validation
    metrics are genuinely out-of-sample.

    Skeletons are PAIRED with the cube they annotate (review r2 s5: an
    independent draw trained on mismatched supervision): explicitly via
    ``agent_data.skeleton_cube`` (one ORIGINAL-order cube index per
    skeleton — the order cubes were passed to AgentData, before the
    train/valid split), by position when the counts match, or trivially
    with a single cube; ambiguous configurations raise. With explicit
    pairing, each source draws only from skeletons that annotate one of
    ITS cubes (a valid batch never cuts patches at train-skeleton
    coordinates and vice versa).
    """
    from elektronn2_tpu.data.transformations import (
        warp_slice, WarpingOOBError, get_tracing_slice, flight_frame)
    rotate = bool(getattr(agent_data, "rotate_to_heading", False))
    if not agent_data.skeletons:
        raise ValueError("AgentData has no skeletons loaded")
    if source == "valid":
        vols = agent_data.valid_d
        if not vols:
            raise ValueError("no validation cubes configured")
    else:
        vols = agent_data.train_d
    ps = agent_data.patch_size
    seq_d = np.zeros((n_steps, batch_size, agent_data.n_ch, *ps), np.float32)
    seq_t = np.zeros((n_steps, batch_size, 3), np.float32)
    cubes = getattr(agent_data, "skeleton_cube", None)
    n_sk = len(agent_data.skeletons)
    eligible = None
    orig2local = None
    if cubes is not None:
        # skeleton_cube holds ORIGINAL-order indices; map them into this
        # source's split and restrict the draw to skeletons that annotate
        # one of its cubes (review r2 s6: resolving the raw index against
        # the split list crashed or re-introduced mismatched supervision
        # on the validation path)
        vset = sorted(set(getattr(agent_data, "valid_cubes", []) or []))
        if source == "valid":
            orig2local = {orig: k for k, orig in enumerate(vset)}
        else:
            orig2local = {}
            k = 0
            n_orig = len(vols) + len(vset)
            for orig in range(n_orig):
                if orig not in vset:
                    orig2local[orig] = k
                    k += 1
        eligible = [j for j in range(n_sk)
                    if int(cubes[j]) in orig2local]
        if not eligible:
            raise ValueError(
                f"no skeletons annotate a {source} cube "
                f"(skeleton_cube={list(map(int, cubes))}, "
                f"valid_cubes={vset})")
    for b in range(batch_size):
        if eligible is not None:
            j = eligible[rng.randint(len(eligible))]
            sk = agent_data.skeletons[j]
            ci = orig2local[int(cubes[j])]
        else:
            j = rng.randint(n_sk)
            sk = agent_data.skeletons[j]
            if len(vols) == 1:
                ci = 0
            elif len(vols) == n_sk:
                ci = j
            else:
                raise ValueError(
                    f"cannot pair {n_sk} skeletons with {len(vols)} "
                    f"{source} cubes — pass AgentData(skeleton_cube=[...])"
                    f" with one ORIGINAL-order cube index per skeleton")
        vol = vols[ci]
        path = sk.walk(sk.sample_node(rng), n_steps, rng)
        prev_head = None
        for t in range(n_steps):
            pos = sk.positions[path[t]]
            pos = np.clip(pos, np.asarray(ps) / 2 + 1,
                          np.asarray(vol.shape[1:]) - np.asarray(ps) / 2 - 1)
            # target follows the FLIGHT direction (the walk's next hop) —
            # the undirected nearest-node heuristic can point backward
            nxt = sk.positions[path[min(t + 1, len(path) - 1)]]
            head = nxt - sk.positions[path[t]]
            if np.linalg.norm(head) == 0:
                head = None
            tgt = sk.direction_target(pos, heading=head)
            if rotate:
                # frame-aligned view (reference get_tracing_slice
                # semantics): cut along the CURRENT heading — at t the
                # agent knows where it came from, not where it is going,
                # so the view frame uses the PREVIOUS hop and the target
                # is expressed in that same local frame (what the rollout
                # Tracer(rotate_to_heading=True) inverts per step)
                view_dir = (prev_head if prev_head is not None
                            else (head if head is not None
                                  else (0.0, 0.0, 1.0)))
                tgt = flight_frame(view_dir) @ tgt
                try:
                    seq_d[t, b] = get_tracing_slice(vol, ps, position=pos,
                                                    direction=view_dir)
                except WarpingOOBError:
                    pass  # keep zeros for degenerate geometry
            else:
                try:
                    seq_d[t, b] = warp_slice(vol, ps, position=pos)
                except WarpingOOBError:
                    pass  # keep zeros for degenerate geometry
            seq_t[t, b] = tgt
            if head is not None:
                prev_head = head
    return seq_d, seq_t


def skeleton_distance_field(skeletons, shape, oversample=2.0):
    """(n_skel, Z, X, Y) float32 stack of SQUARED distances to each
    skeleton's rasterised curve — the device-side substitute for the
    KD-tree in ``skel_loss_callback`` (see ``SkelLossField``): computed
    once on the host (EDT), then resident in HBM where trilinear sampling
    makes the loss differentiable with zero callbacks.

    Edges are rasterised with ``oversample`` points per voxel of edge
    length, so the field measures distance to the skeleton CURVE (the
    continuous version of the callback's nearest-node distance).
    """
    from scipy import ndimage
    shape = tuple(int(s) for s in shape)
    fields = []
    for sk in skeletons:
        mask = np.zeros(shape, bool)
        pts_all = [sk.positions]
        for a, b in sk.edges:
            pa, pb = sk.positions[a], sk.positions[b]
            n = max(2, int(np.ceil(np.linalg.norm(pb - pa) * oversample)))
            t = np.linspace(0.0, 1.0, n)[:, None]
            pts_all.append(pa[None] + t * (pb - pa)[None])
        pts = np.concatenate(pts_all, axis=0)
        ijk = np.clip(np.round(pts).astype(int), 0,
                      np.asarray(shape) - 1)
        mask[tuple(ijk.T)] = True
        d = ndimage.distance_transform_edt(~mask)
        fields.append((d.astype(np.float32)) ** 2)
    return np.stack(fields)
