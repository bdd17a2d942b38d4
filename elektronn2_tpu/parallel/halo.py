"""Spatial context parallelism: halo exchange for valid-mode conv.

The conv analog of ring attention (SURVEY.md §3.7): the z axis of a volume
is sharded across a ``space`` mesh axis; each valid conv layer needs
``filter_z - 1`` extra voxels from the next neighbour, fetched with
``lax.ppermute`` over ICI, overlapping naturally with local compute under
XLA's scheduler. This scales the *spatial extent* ("sequence length" of the
volumetric workload) beyond one chip's HBM — the reference instead tiled on
the host (``predict_dense`` overlap tiling + KnossosArray, see SURVEY §6).

Convention: arrays inside ``shard_map`` are the local z-shard
(b, f, z_local, x, y). After a stack of valid convs, each shard's trailing
``total_shrink`` outputs are invalid (they belong to the next shard's
region); ``spatial_cp_stack`` returns them trimmed on gather.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from elektronn2_tpu.ops.conv import (conv as ops_conv, apply_layer,
                                     pooling as ops_pooling)
from elektronn2_tpu.ops.activations import get_activation


def halo_gather(x_loc, halo, axis_name):
    """Append ``halo`` z-slabs from the following rank(s), zero-padded past
    the global end.

    x_loc: (b, f, z_local, x, y) local shard inside shard_map. When the
    halo exceeds one shard (deep dilated stacks on many ranks), whole
    blocks are fetched from successive neighbours (multi-hop) and the
    surplus trimmed.
    """
    if halo == 0:
        return x_loc
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    z_loc = x_loc.shape[2]
    if halo <= z_loc:
        # single hop: send only the needed head slab
        head = x_loc[:, :, :halo]
        perm = [(i, (i - 1) % n) for i in range(n)]
        recv = jax.lax.ppermute(head, axis_name, perm)
        recv = jnp.where(idx == n - 1, jnp.zeros_like(recv), recv)
        return jnp.concatenate([x_loc, recv], axis=2)
    # multi-hop: fetch whole blocks from ranks r+1 .. r+hops
    hops = -(-halo // z_loc)
    parts = [x_loc]
    for h in range(1, hops + 1):
        perm = [(i, (i - h) % n) for i in range(n)]
        recv = jax.lax.ppermute(x_loc, axis_name, perm)
        # ranks whose h-th neighbour wraps past the end get zeros (the
        # global tail is invalid and trimmed by the caller anyway)
        recv = jnp.where(idx >= n - h, jnp.zeros_like(recv), recv)
        parts.append(recv)
    big = jnp.concatenate(parts, axis=2)
    return big[:, :, :z_loc + halo]


def cp_conv_z(x_loc, w, b=None, axis_name="space", activation=None):
    """One halo-exchanged valid conv layer on a z-sharded volume.

    Keeps z_local outputs per rank (the global tail is invalid; trim after
    the stack). Filter may extend in x/y too — those axes are unsharded.
    """
    halo = w.shape[2] - 1
    xg = halo_gather(x_loc, halo, axis_name)
    y = ops_conv(xg, w)
    if b is not None:
        y = y + b.reshape((1, -1) + (1,) * (y.ndim - 2))
    if activation is not None:
        y = get_activation(activation)(y)
    return y


def _stack_forward(x_loc, layers, axis_name):
    shrink = 0
    for layer in layers:
        w = layer["w"]
        pool = layer.get("pool")
        if pool is not None and any(p > 1 for p in pool) and pool[0] != 1:
            raise ValueError("z-pooling under z-sharding is unsupported; "
                             "pool in x/y or restructure the mesh")
        xg = halo_gather(x_loc, w.shape[2] - 1, axis_name)
        # canonical layer order (conv+bias -> pool -> activation), shared
        # with the node graph via ops.conv.apply_layer
        x_loc = apply_layer(xg, w, layer.get("b"), layer.get("activation"),
                            pool)
        shrink += w.shape[2] - 1
        # x/y valid shrink happens locally; no halo needed off the z axis
    return x_loc, shrink


def spatial_cp_stack(layers, mesh, axis_name="space"):
    """Compile a z-sharded forward pass for a conv stack.

    ``layers``: list of dicts {w, b, activation, pool} (z-pooling
    unsupported under sharding). Returns ``fn(x)``: x is the full
    (b, f, Z, X, Y) volume (Z divisible by the mesh axis); output is the
    gathered full valid result, identical to the unsharded stack.
    """
    n = mesh.shape[axis_name]
    total_shrink = sum(l["w"].shape[2] - 1 for l in layers)

    def sharded(x_loc):
        y_loc, _ = _stack_forward(x_loc, layers, axis_name)
        return y_loc

    shard_fn = jax.shard_map(
        sharded, mesh=mesh,
        in_specs=P(None, None, axis_name, None, None),
        out_specs=P(None, None, axis_name, None, None),
        check_vma=False)

    @jax.jit
    def fn(x):
        if x.shape[2] % n:
            raise ValueError(f"z extent {x.shape[2]} not divisible by "
                             f"mesh axis {axis_name}={n}")
        y = shard_fn(x)
        # trim the invalid tail: valid global z extent is Z - total_shrink
        return y[:, :, :x.shape[2] - total_shrink]

    return fn
