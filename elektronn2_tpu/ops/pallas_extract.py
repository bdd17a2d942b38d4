"""Pallas/Mosaic batched trilinear patch extraction for the fused tracer.

Motivation (r3, `scripts/exp_tracer_body.py`): the DeviceTracer rollout at
its B=256 saturation point spends **97%** of each scan step in patch
extraction — XLA lowers the vmapped batch-varying ``dynamic_slice`` as a
whole-volume gather running at ~12 GB/s effective (~60x off HBM). The
model step itself costs 29 µs. This kernel replaces the gather with one
per-agent DMA window plus an in-register trilinear blend:

  * grid (B,): one agent per grid step, DMA double-buffered across steps
    (agent b+1's window is in flight while agent b blends);
  * the window is the aligned bounding box Mosaic DMAs allow — exact
    z rows (no constraint on the untiled dim), X rounded to the 8-row
    sublane tiling (``WX = ceil8(p_x+8)``), Y to the 128-lane tiling
    (``W = 256`` covers any 128-crossing span with one copy);
  * the in-window sub-voxel offsets are applied WITHOUT dynamic VMEM
    slicing (unsupported on tiled dims): each agent's integer x/y
    offsets are brought to index 0 with dynamic ``pltpu.roll``s
    (lane/sublane rotates are native VPU ops; positive shifts only —
    negative measured broken), the lane extent is sliced to ``py+1``
    right after the y-roll so later ops work one 128-lane tile, and
    the per-axis 2-tap lerps are then plain STATIC shifted reads
    (``v[:p]*(1-f) + v[1:]*f`` per axis, z then x then y) on the VPU —
    no MXU involvement; the rolled-in tail of the window is sliced
    away before it is ever observed.

Numerics: same f32 data, lerp factored per axis (vs the reference
8-corner weighted sum) — agreement to ~1e-6; the jitted XLA path stays
the exactness oracle (tests) and the CPU/golden path.

Reference semantics mirrored: ``tracing_utils.DeviceTracer._extract``
(corner = pos - (p-1)/2, base = floor, frac BEFORE the bounds clip,
base clipped to [0, dim-(p+1)]).
"""

from __future__ import annotations

import functools

import numpy as np


def extract_eligible(vol_shape, dtype, patch):
    """Static eligibility of (f, Z, X, Y) volume + patch for the kernel."""
    import jax.numpy as jnp
    f, Z, X, Y = vol_shape
    pz, px, py = patch
    # VMEM budget: the slab ring is R(2) x G(<=8) x f x (pz+1) x WX x 256
    # f32 — unbounded f or patch would request scratch past VMEM and die
    # in a Mosaic compile error where the XLA path works (r3 review)
    slab_bytes = 2 * 8 * f * (pz + 1) * _wx(px) * 256 * 4
    return (jnp.dtype(dtype) == jnp.float32
            and Y % 128 == 0 and Y >= 256
            and X % 8 == 0 and X >= _wx(px)
            and Z >= pz + 1
            and py + 1 <= 128 and px + 1 <= 128
            and slab_bytes <= 32 * 1024 * 1024)


def _wx(px):
    """Sublane window: covers [bx - bx%8, bx + px + 1) for any bx%8<=7."""
    return -(-(px + 1 + 7) // 8) * 8


# one kernel call handles at most this many agents: past ~512 the
# per-agent cost cliffs +40% (r4 attribution: B=1024 one-call 993K sps vs
# two 512-agent calls 1485K in the same scan body — a per-call grid-size
# property, grid=(B/G,) DMA pipelining degrades at 128 grid steps; the
# split recovers it and even edges past the B=768 single-call rate)
_MAX_CALL_B = 512


@functools.partial(
    __import__("jax").jit, static_argnames=("patch", "interpret"))
def trilinear_patches_pallas(vol, pos, patch, interpret=False):
    """Batched trilinear patches: vol (f, Z, X, Y) f32, pos (B, 3) float
    -> (B, f, pz, px, py). Matches ``DeviceTracer._extract`` semantics.

    Batches past ``_MAX_CALL_B`` are served by multiple kernel calls and
    re-concatenated (exact: agents are independent).

    ``interpret=True`` runs the Pallas interpreter (CPU tests).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if pos.shape[0] > _MAX_CALL_B:
        # any oversized batch splits into ceil(B/512) calls — agents are
        # independent, so an uneven tail chunk is exact
        n = -(-pos.shape[0] // _MAX_CALL_B)
        return jnp.concatenate(
            [trilinear_patches_pallas(
                vol, pos[i * _MAX_CALL_B:(i + 1) * _MAX_CALL_B], patch,
                interpret=interpret)
             for i in range(n)], axis=0)

    f, Z, X, Y = vol.shape
    pz, px, py = patch
    S = pz + 1
    WX = _wx(px)
    W = 256
    B = pos.shape[0]
    if B == 0:       # empty agent batch: nothing to extract (XLA parity)
        return jnp.zeros((0, f, pz, px, py), jnp.float32)

    # ---- host-side (XLA) meta: bases, window corners, fracs -----------
    p_arr = jnp.asarray(patch, jnp.float32)
    corner = pos.astype(jnp.float32) - (p_arr - 1.0) / 2.0
    base = jnp.floor(corner)
    frac = (corner - base).astype(jnp.float32)       # BEFORE clip (parity)
    maxc = jnp.asarray([Z - (pz + 1), X - (px + 1), Y - (py + 1)],
                       jnp.int32)
    base = jnp.clip(base.astype(jnp.int32), 0, maxc)
    bz = base[:, 0]
    xal = jnp.minimum((base[:, 1] // 8) * 8, X - WX)
    ox = base[:, 1] - xal
    yal = jnp.minimum((base[:, 2] // 128) * 128, Y - W)
    oy = base[:, 2] - yal
    # does the y span cross into the window's second 128-lane tile? if
    # not, the second half-tile DMA is skipped (stale lanes are provably
    # never read post-roll) — ~45% average traffic cut
    cross = (oy + py + 1 > 128).astype(jnp.float32)
    # laid out (9, B): SMEM pads the LAST dim to 128 lanes, so a (B, 9)
    # layout would burn 512 B/agent and overflow the ~1 MB SMEM budget
    # past B~2k (hit at B=4096); (9, B) stays 36 B/agent
    meta = jnp.stack([bz.astype(jnp.float32), xal.astype(jnp.float32),
                      yal.astype(jnp.float32), ox.astype(jnp.float32),
                      oy.astype(jnp.float32), frac[:, 0], frac[:, 1],
                      frac[:, 2], cross], axis=0)    # (9, B)

    # G agents per grid step: per-step fixed costs (grid bookkeeping, out
    # DMA issue, wait chains) measured to dominate at G=1 (~1.2 us/agent
    # with the DMA+VPU legs far from their floors); batching agents per
    # step amortises them and keeps G windows' DMAs in flight at once.
    G = min(8, B) if B % min(8, B) == 0 else 1
    nsteps = B // G
    R = 2            # step-slot ring: one in use + one in flight

    def kernel(meta_ref, vol_hbm, out_ref, slab, sem):
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        def dma_half(i, slot, j, half):
            zz = meta_ref[0, i].astype(jnp.int32)
            xx = pl.multiple_of(meta_ref[1, i].astype(jnp.int32), 8)
            yy = pl.multiple_of(meta_ref[2, i].astype(jnp.int32), 128)
            return pltpu.make_async_copy(
                vol_hbm.at[pl.ds(0, f), pl.ds(zz, S), pl.ds(xx, WX),
                           pl.ds(yy + 128 * half, 128)],
                slab.at[slot, j, :, :, :, pl.ds(128 * half, 128)],
                sem.at[slot, j, half])

        def start(step):
            for j in range(G):
                i = step * G + j
                dma_half(i, step % R, j, 0).start()

                @pl.when(meta_ref[8, i] > 0.5)
                def _():
                    dma_half(i, step % R, j, 1).start()

        def wait(step):
            for j in range(G):
                i = step * G + j
                dma_half(i, step % R, j, 0).wait()

                @pl.when(meta_ref[8, i] > 0.5)
                def _():
                    dma_half(i, step % R, j, 1).wait()

        @pl.when(b == 0)
        def _prime():
            start(0)
        wait(b)

        @pl.when(b + 1 < nb)
        def _next():
            start(b + 1)

        # bring the in-window sub-offset to index 0 with dynamic ROLLS
        # (lane/sublane rotates are native VPU ops; dynamic VMEM slicing
        # on tiled dims is not supported) — then every lerp is a static
        # shifted read. Positive shifts only (negative measured broken).
        for j in range(G):
            i = b * G + j
            ox_s = meta_ref[3, i].astype(jnp.int32)
            oy_s = meta_ref[4, i].astype(jnp.int32)
            fz = meta_ref[5, i]
            fx = meta_ref[6, i]
            fy = meta_ref[7, i]
            sl = slab[b % R, j]            # (f, S, WX, W)
            for c in range(f):             # static unroll over channels
                # slice the lane extent right after the y-roll: every
                # later op works one 128-lane tile instead of two
                v = pltpu.roll(sl[c], (W - oy_s) % W, 2)[:, :, :py + 1]
                v = pltpu.roll(v, (WX - ox_s) % WX, 1)
                t = v[:pz] * (1.0 - fz) + v[1:] * fz   # (pz, WX, py+1)
                t = t[:, :px] * (1.0 - fx) + t[:, 1:px + 1] * fx
                t = (t[:, :, :py] * (1.0 - fy)
                     + t[:, :, 1:py + 1] * fy)         # (pz, px, py)
                out_ref[j, c] = t

    fn = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((G, f, pz, px, py),
                               lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, f, pz, px, py), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, G, f, S, WX, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((R, G, 2))],
        interpret=interpret,
    )
    return fn(meta, vol)
