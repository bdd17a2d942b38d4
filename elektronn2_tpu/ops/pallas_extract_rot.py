"""Pallas/Mosaic ROTATED trilinear patch extraction (frame-aligned views).

Closes the r4 gap: ``DeviceTracer(rotate_to_heading=True)`` paid a
whole-volume 8-corner XLA gather per scan step (~2.4 K agent-steps/s on
v5e — ROUND4_NOTES), ~800x below the translation-only Pallas path. A
windowed ``dynamic_slice`` variant was measured SLOWER (1.9 K): vmapped
batch-varying dynamic_slice itself lowers as a gather. This kernel keeps
the r3 extraction kernel's shape — per-agent ring-DMA windows — and
replaces the gather entirely with MXU matmuls:

  * the DMA window is the rotation-invariant bound: any orientation of
    the patch box fits in a cube of side ``2*H+2`` where
    ``H = ceil(||patch-1||/2) + 1`` (the half-diagonal), aligned to the
    (8, 128) VMEM tiling exactly like ``pallas_extract``;
  * per-agent lane/sublane ``pltpu.roll``s compact the window to
    ``(Wz, 32, 32)`` (native VPU rotates — no dynamic VMEM slicing);
  * trilinear sampling at the B*P rotated coordinates is evaluated
    WITHOUT any gather, as a dense contraction against separable hat
    (tent) weights:  ``out[p] = sum_{vz,vx,vy} hat(rz[p]-vz) *
    hat(rx[p]-vx) * hat(ry[p]-vy) * win[vz,vx,vy]`` — exactly the
    8-corner trilinear sum (the hat factors are zero everywhere except
    the two neighbouring cells per axis), but expressed as
      hzx (P, Wz*32) @ win2 (Wz*32, 32)      [MXU, K fully packed]
    followed by a (P, 32) hat-weighted lane reduction for the y axis
    [VPU]. The sample coordinates never index memory — they only shape
    the weight matrices, which the VPU builds from broadcasted iota.

Numerics: identical trilinear weights, summed in a different order.
With ``compute_dtype=float32`` the dot runs in Mosaic's multi-pass f32
(agreement with the XLA oracle ~1e-6); ``bfloat16`` runs single-pass
MXU (~4e-3 relative on EM-scale data) as an opt-in speed mode.

Reference semantics mirrored: ``tracing_utils.DeviceTracer.
_extract_rot_batch`` (world coord of output voxel i = pos + F.T @
(i - (p-1)/2), flight-frame rows, OOB criterion coords in
[0, dims-2] == host ``source_bbox`` margin; SURVEY §3.2
``transformations.py::get_tracing_slice``).
"""

from __future__ import annotations

import functools

import numpy as np

_MAX_CALL_B = 512           # same per-call grid-size cliff as pallas_extract


def _ceil8(v):
    return -(-v // 8) * 8


def _geom(patch):
    """Static window geometry for a patch: (H, Wz, WXr, P, PT)."""
    pz, px, py = patch
    H = int(np.ceil(np.linalg.norm(np.asarray(patch, np.float64) - 1.0)
                    / 2.0)) + 1
    Wz = 2 * H + 2
    # >= 32 so the post-roll sublane slice is always exactly 32 wide
    # (the kernel's hx weights and win2 sublane blocks are 32-sized)
    WXr = max(_ceil8(2 * H + 9), 32)
    P = pz * px * py
    PT = min(P, 512)
    return H, Wz, WXr, P, PT


def rotated_extract_eligible(vol_shape, dtype, patch):
    """Static eligibility of (f, Z, X, Y) volume + patch for the kernel."""
    import jax.numpy as jnp
    f, Z, X, Y = vol_shape
    H, Wz, WXr, P, PT = _geom(patch)
    slab_bytes = 2 * f * Wz * WXr * 256 * 4          # R=2 ring
    hzx_bytes = PT * Wz * 32 * 4 * 2                 # f32 build + cast
    return (jnp.dtype(dtype) == jnp.float32
            and Wz <= 32                             # post-roll 32-slice
            and Y % 128 == 0 and Y >= 256
            and X % 8 == 0 and X >= WXr
            and Z >= Wz
            and P % PT == 0 and P % 8 == 0
            and slab_bytes + hzx_bytes <= 12 * 1024 * 1024)


def rotated_ok(vol_shape, pos, frames, patch):
    """OOB acceptance (B,) — every rotated sample's interpolation cell in
    the volume: ``all(c >= 0 & c <= dims-2)``. The extreme per-axis
    sample coordinates of the rotated lattice are attained at the 8 box
    corners (linear map of a box), so checking corners is exact."""
    import jax.numpy as jnp
    pz, px, py = patch
    half = jnp.asarray([(pz - 1) / 2.0, (px - 1) / 2.0, (py - 1) / 2.0],
                       jnp.float32)
    signs = jnp.asarray([[sz, sx, sy] for sz in (-1, 1) for sx in (-1, 1)
                         for sy in (-1, 1)], jnp.float32)     # (8, 3)
    corners = signs * half                                    # (8, 3)
    # world corner = pos + F.T @ o  -> (B, 8, 3)
    c = (pos[:, None, :].astype(jnp.float32)
         + jnp.einsum("bji,kj->bki", frames.astype(jnp.float32), corners))
    dims = jnp.asarray(vol_shape[1:], jnp.float32)
    return jnp.all((c >= 0.0) & (c <= dims - 2.0), axis=(1, 2))


@functools.partial(
    __import__("jax").jit,
    static_argnames=("patch", "compute_dtype", "interpret", "variant",
                     "precision"))
def rotated_patches_pallas(vol, pos, frames, patch,
                           compute_dtype="float32", interpret=False,
                           variant="bigk", precision=None):
    """Frame-aligned trilinear patches: vol (f, Z, X, Y) f32, pos (B, 3)
    float, frames (B, 3, 3) flight-frame rows -> (patches (B, f, pz, px,
    py), ok (B,)). Matches ``DeviceTracer._extract_rot_batch`` semantics
    (ok-masked agents' patch values are unspecified in both paths).

    Batches past ``_MAX_CALL_B`` split into ceil(B/512) kernel calls.
    ``interpret=True`` runs the Pallas interpreter (CPU tests).

    ``precision``: MXU pass count for the f32 contraction — None keeps
    the parity-grade default (HIGHEST, 6-pass true-f32), ``"high"``
    selects the 3-pass bf16x3 dot (~2e-5 vs the f64 truth on EM-scale
    data — between the 6-pass 2.4e-6 and single-pass bf16 3.8e-3; r5
    measured speed/accuracy ladder in docs/tpu_performance.md).
    Ignored under ``compute_dtype='bfloat16'`` (single-pass already).

    ``variant``: contraction strategy, all numerically equivalent modulo
    float reassociation (``probe`` excepted — timing-only):
      * ``bigk``  — hat-product weights built on the VPU, one
        (PT, Wz*32) @ (Wz*32, 32) MXU dot (r5 default);
      * ``mxb``   — same dot, but the separable hat factors are built
        small ((PT, Wz) and (PT, 32)) and expanded to the (PT, Wz*32)
        layout by constant 0/1 selection-matrix dots on the MXU,
        replacing the ~10-op full-width VPU build;
      * ``sepa``  — z folded first by a K=Wz dot with N=1024 FULL lanes
        ((PT, Wz) @ (Wz, 32*32)), x/y hats expanded by selection dots,
        then one VPU multiply + cross-lane sum — no N=32-underfilled
        dot anywhere;
      * ``fact2`` — factored contraction (measured rejection: its
        block-reduction dot equals bigk's underfilled dot);
      * ``probe`` — wrong-numerics attribution variant (weight build
        replaced by 2 ops) for measuring the build share on-chip.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if variant not in ("bigk", "mxb", "sepa", "fact2", "probe"):
        # an unknown name must not fall into the wrong-numerics probe
        # branch silently
        raise ValueError(f"variant={variant!r}: expected one of "
                         "bigk/mxb/sepa/fact2/probe")
    if precision not in (None, "high"):
        raise ValueError(f"precision={precision!r}: expected None or "
                         "'high'")
    if pos.shape[0] > _MAX_CALL_B:
        outs = [rotated_patches_pallas(
            vol, pos[i * _MAX_CALL_B:(i + 1) * _MAX_CALL_B],
            frames[i * _MAX_CALL_B:(i + 1) * _MAX_CALL_B], patch,
            compute_dtype=compute_dtype, interpret=interpret,
            variant=variant, precision=precision)
            for i in range(-(-pos.shape[0] // _MAX_CALL_B))]
        return (jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs], axis=0))

    f, Z, X, Y = vol.shape
    pz, px, py = patch
    H, Wz, WXr, P, PT = _geom(patch)
    NT = P // PT
    W = 256
    SXY = 32
    cdt = jnp.dtype(compute_dtype)
    B = pos.shape[0]
    ok = rotated_ok(vol.shape, pos, frames, patch)
    if B == 0:
        return jnp.zeros((0, f, pz, px, py), jnp.float32), ok

    # ---- host-side (XLA) meta -----------------------------------------
    posf = pos.astype(jnp.float32)
    base = jnp.floor(posf).astype(jnp.int32) - H                 # (B, 3)
    bz = jnp.clip(base[:, 0], 0, Z - Wz)
    bx = jnp.clip(base[:, 1], 0, X - Wz)
    by = jnp.clip(base[:, 2], 0, Y - Wz)
    xal = jnp.minimum((bx // 8) * 8, X - WXr)
    ox = bx - xal
    yal = jnp.minimum((by // 128) * 128, Y - W)
    oy = by - yal
    cross = (oy + Wz > 128).astype(jnp.float32)
    start = posf - jnp.stack([bz, bx, by], axis=1).astype(jnp.float32)
    Ff = frames.astype(jnp.float32).reshape(B, 9)
    meta = jnp.concatenate([
        jnp.stack([bz.astype(jnp.float32), xal.astype(jnp.float32),
                   yal.astype(jnp.float32), ox.astype(jnp.float32),
                   oy.astype(jnp.float32), cross], axis=0),   # (6, B)
        start.T,                                              # (3, B)
        Ff.T,                                                 # (9, B)
    ], axis=0)                                                # (18, B)

    R = 2
    cz = (pz - 1) / 2.0
    cx = (px - 1) / 2.0
    cy = (py - 1) / 2.0

    def kernel(meta_ref, vol_hbm, out_ref, slab, winf_buf, sem):
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        def dma_half(i, slot, half):
            zz = meta_ref[0, i].astype(jnp.int32)
            xx = pl.multiple_of(meta_ref[1, i].astype(jnp.int32), 8)
            yy = pl.multiple_of(meta_ref[2, i].astype(jnp.int32), 128)
            return pltpu.make_async_copy(
                vol_hbm.at[pl.ds(0, f), pl.ds(zz, Wz), pl.ds(xx, WXr),
                           pl.ds(yy + 128 * half, 128)],
                slab.at[slot, :, :, :, pl.ds(128 * half, 128)],
                sem.at[slot, half])

        def start_dma(i):
            dma_half(i, i % R, 0).start()

            @pl.when(meta_ref[5, i] > 0.5)
            def _():
                dma_half(i, i % R, 1).start()

        def wait_dma(i):
            dma_half(i, i % R, 0).wait()

            @pl.when(meta_ref[5, i] > 0.5)
            def _():
                dma_half(i, i % R, 1).wait()

        @pl.when(b == 0)
        def _prime():
            start_dma(0)
        wait_dma(b)

        @pl.when(b + 1 < nb)
        def _next():
            start_dma(b + 1)

        # cross-skip leaves the second 128-lane half UNWRITTEN; unlike
        # the translation kernel (whose rolled-in tail is never read),
        # the hat-weight DOT reads every lane — and IEEE 0*NaN = NaN
        # would poison the contraction on garbage VMEM. Zero the half
        # instead (VPU store, no HBM traffic — still ~45% DMA cut).
        @pl.when(meta_ref[5, b] <= 0.5)
        def _zero_tail():
            slab[b % R, :, :, :, 128:] = jnp.zeros(
                (f, Wz, WXr, 128), jnp.float32)

        ox_s = meta_ref[3, b].astype(jnp.int32)
        oy_s = meta_ref[4, b].astype(jnp.int32)
        sz = meta_ref[6, b]
        sx = meta_ref[7, b]
        sy = meta_ref[8, b]
        F00 = meta_ref[9, b]
        F01 = meta_ref[10, b]
        F02 = meta_ref[11, b]
        F10 = meta_ref[12, b]
        F11 = meta_ref[13, b]
        F12 = meta_ref[14, b]
        F20 = meta_ref[15, b]
        F21 = meta_ref[16, b]
        F22 = meta_ref[17, b]

        # Mosaic's tpu.iota is integer-only; build i32, cast to f32
        iota_l = jax.lax.broadcasted_iota(
            jnp.int32, (1, SXY), 1).astype(jnp.float32)
        iota_z = jax.lax.broadcasted_iota(
            jnp.int32, (1, Wz), 1).astype(jnp.float32)
        # static lane maps over the flattened (vz, vx) contraction dim:
        # vz = k // 32, vx = k % 32
        k_io = jax.lax.broadcasted_iota(jnp.int32, (1, Wz * SXY), 1)
        vz_map = (k_io // SXY).astype(jnp.float32)
        vx_map = (k_io % SXY).astype(jnp.float32)

        # parity-grade f32 asks for the multi-pass MXU dot (default
        # Mosaic dot is single-pass bf16: measured 3e-2 vs the oracle);
        # bf16 mode keeps the fast single pass; precision='high' is the
        # 3-pass bf16x3 middle rung — decomposed MANUALLY (split both
        # f32 operands into bf16 hi+lo, drop the lo*lo term) because
        # Mosaic's dot lowering accepts only DEFAULT and HIGHEST
        prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
                else jax.lax.Precision.DEFAULT)

        def mxu_dot(a, b):
            """The kernel's one contraction primitive, mode-dispatched:
            bf16 single-pass / f32 6-pass HIGHEST / 'high' 3x bf16x3."""
            if cdt != jnp.float32:
                return jnp.dot(a.astype(cdt), b.astype(cdt),
                               precision=jax.lax.Precision.DEFAULT,
                               preferred_element_type=jnp.float32)
            if precision == "high":
                bf = jnp.bfloat16
                ah = a.astype(bf)
                al = (a - ah.astype(jnp.float32)).astype(bf)
                bh = b.astype(bf)
                bl = (b - bh.astype(jnp.float32)).astype(bf)
                d = functools.partial(
                    jnp.dot, precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
                return d(ah, bh) + d(ah, bl) + d(al, bh)
            return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)

        if variant == "fact2":
            # constant selection matrices for the factored contraction:
            # Rrep[x, k] = [k//32 == x] (lane-repeat via MXU),
            # Ssum[k, y] = [k%32 == y] (32-lane block reduction via MXU)
            kk = jax.lax.broadcasted_iota(jnp.int32, (SXY, SXY * SXY), 1)
            xx_i = jax.lax.broadcasted_iota(jnp.int32,
                                            (SXY, SXY * SXY), 0)
            Rrep = (kk // SXY == xx_i).astype(jnp.float32)
            kk2 = jax.lax.broadcasted_iota(jnp.int32, (SXY * SXY, SXY), 0)
            yy_i = jax.lax.broadcasted_iota(jnp.int32,
                                            (SXY * SXY, SXY), 1)
            Ssum = (kk2 % SXY == yy_i).astype(jnp.float32)
        if variant == "mxb":
            # constant 0/1 expanders onto the bigk (vz*32 + vx) K layout:
            # Zrep[z, k] = [k//32 == z], Xtil[x, k] = [k%32 == x] — the
            # hat factors are built SMALL ((PT, Wz) / (PT, 32)) and
            # lane-expanded by MXU dots instead of the ~10-op full-width
            # (PT, Wz*32) VPU build
            kk = jax.lax.broadcasted_iota(jnp.int32, (Wz, Wz * SXY), 1)
            zz_i = jax.lax.broadcasted_iota(jnp.int32, (Wz, Wz * SXY), 0)
            Zrep = (kk // SXY == zz_i).astype(jnp.float32)
            kk = jax.lax.broadcasted_iota(jnp.int32, (SXY, Wz * SXY), 1)
            xx_i = jax.lax.broadcasted_iota(jnp.int32, (SXY, Wz * SXY), 0)
            Xtil = (kk % SXY == xx_i).astype(jnp.float32)
        if variant == "sepa":
            # expanders onto the winf (vx*32 + vy) lane layout:
            # Xrep[x, k] = [k//32 == x], Ytil[y, k] = [k%32 == y]
            kk = jax.lax.broadcasted_iota(jnp.int32, (SXY, SXY * SXY), 1)
            xx_i = jax.lax.broadcasted_iota(jnp.int32,
                                            (SXY, SXY * SXY), 0)
            Xrep = (kk // SXY == xx_i).astype(jnp.float32)
            Ytil = (kk % SXY == xx_i).astype(jnp.float32)

        for c in range(f):
            w3 = slab[b % R, c]                       # (Wz, WXr, 256)
            w3 = pltpu.roll(w3, (W - oy_s) % W, 2)[:, :, :SXY]
            w3 = pltpu.roll(w3, (WXr - ox_s) % WXr, 1)[:, :SXY, :]
            if variant in ("fact2", "sepa"):
                # winf[vz, x*32 + y]: the 32 x-rows laid side by side on
                # lanes — via explicit VMEM stores (a lane-concat of
                # sublane-sliced views is a Mosaic "offset mismatch on
                # non-concat dimension" compile error; stores relayout)
                for x in range(SXY):
                    winf_buf[:, x * SXY:(x + 1) * SXY] = w3[:, x, :]
                winf = winf_buf[:, :]                 # (Wz, 1024)
            else:
                win2 = jnp.concatenate(
                    [w3[z] for z in range(Wz)], axis=0)   # (Wz*32, 32)
            for t in range(NT):
                pp = (jax.lax.broadcasted_iota(
                    jnp.int32, (PT, 1), 0).astype(jnp.float32)
                    + jnp.float32(t * PT))
                # float index math is exact here: PT*NT < 2^20 and the
                # divisors are < 2^11 (see pallas_extract_rot tests)
                iz = jnp.floor(pp / (px * py))
                rem = pp - iz * (px * py)
                ix = jnp.floor(rem / py)
                iy = rem - ix * py
                o_z = iz - cz
                o_x = ix - cx
                o_y = iy - cy
                rz = sz + F00 * o_z + F10 * o_x + F20 * o_y   # (PT, 1)
                rx = sx + F01 * o_z + F11 * o_x + F21 * o_y
                ry = sy + F02 * o_z + F12 * o_x + F22 * o_y
                hy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - iota_l))
                if variant == "bigk":
                    # hzx built DIRECTLY on the (PT, Wz*32) lane layout
                    # from static vz/vx lane maps — a per-z-slice concat
                    # of (PT, 32) pieces lane-pads each piece to 128 and
                    # blows the 16 MB scoped-VMEM budget (measured:
                    # 23.9M at 16^3)
                    hzx = (jnp.maximum(0.0, 1.0 - jnp.abs(rz - vz_map))
                           * jnp.maximum(0.0, 1.0 - jnp.abs(rx - vx_map))
                           )                          # (PT, Wz*32)
                    t1 = mxu_dot(hzx, win2)
                elif variant == "mxb":
                    # bigk's dot, MXU-assisted weight build: small hat
                    # factors, 0/1 selection-dot lane expansion, one mul
                    hz = jnp.maximum(0.0, 1.0 - jnp.abs(rz - iota_z))
                    hx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - iota_l))
                    hz_rep = mxu_dot(hz, Zrep)
                    hx_til = mxu_dot(hx, Xtil)
                    hzx = hz_rep * hx_til
                    t1 = mxu_dot(hzx, win2)
                elif variant == "sepa":
                    # separable: fold z FIRST by a K=Wz dot with N=1024
                    # FULL lanes, expand the x/y hats by selection dots,
                    # finish on the VPU — no N=32-underfilled dot. The
                    # hy fold moves into the lane product, so the final
                    # reduction is a plain 1024-lane sum.
                    hz = jnp.maximum(0.0, 1.0 - jnp.abs(rz - iota_z))
                    hx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - iota_l))
                    wzm = mxu_dot(hz, winf)
                    hx_rep = mxu_dot(hx, Xrep)
                    hy_til = mxu_dot(hy, Ytil)
                    out_ref[0, c, pl.ds(t * PT, PT), :] = jnp.sum(
                        wzm * hx_rep * hy_til, axis=1, keepdims=True)
                    continue
                elif variant == "fact2":
                    # factored contraction (r5 attribution: the bigk
                    # dot's N=32 lane underfill is the binder). dot1
                    # contracts z with N=1024 FULL lanes; dot2 is a
                    # K-full 32-lane block reduction folding the x hat;
                    # each is ~half the bigk dot's MAC at better fill.
                    hz = jnp.maximum(0.0,
                                     1.0 - jnp.abs(rz - iota_z))
                    hx = jnp.maximum(0.0,
                                     1.0 - jnp.abs(rx - iota_l))
                    wz_mix = jnp.dot(hz, winf, precision=prec,
                                     preferred_element_type=jnp.float32)
                    hx_rep = jnp.dot(hx, Rrep, precision=prec,
                                     preferred_element_type=jnp.float32)
                    t1 = jnp.dot(wz_mix * hx_rep, Ssum, precision=prec,
                                 preferred_element_type=jnp.float32)
                else:
                    # 'probe': TIMING-ONLY attribution variant (wrong
                    # numerics) — replaces the ~10-op/element hat-product
                    # build with 2 ops so the weight-build share of the
                    # step is directly measurable on-chip
                    hzx = (rz + vx_map).astype(cdt)   # (PT, Wz*32)
                    t1 = jnp.dot(hzx, win2, precision=prec,
                                 preferred_element_type=jnp.float32)
                outv = jnp.sum(hy * t1, axis=1, keepdims=True)
                out_ref[0, c, pl.ds(t * PT, PT), :] = outv

    fn = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, f, P, 1), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, f, P, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, f, Wz, WXr, W), jnp.float32),
                        pltpu.VMEM((Wz, SXY * SXY), jnp.float32),
                        pltpu.SemaphoreType.DMA((R, 2))],
        interpret=interpret,
    )
    out = fn(meta, vol)
    return out.reshape(B, f, pz, px, py), ok
