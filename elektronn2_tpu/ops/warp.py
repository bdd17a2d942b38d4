"""On-device warp augmentation — batched 3D affine+elastic resampling.

Reference: ``elektronn2/data/transformations.py::warp_slice`` ran per-patch
on host CPU workers (numba loops). Here the whole augmentation moves ON
DEVICE (the BASELINE.json north star: "augmentation fully off the host
critical path"): training cubes live in HBM, the host only samples random
positions, and a single jitted function cuts+warps+grey-augments a whole
batch. Transform parameters are generated with ``jax.random`` from
per-batch keys.

Implementation notes (TPU): two resampling cores.

1. ``warp_patch`` — trilinear gather. XLA lowers ``jnp.take`` on flattened
   indices to a native gather. General (any M, exact trilinear elastic) but
   gather-bound: TPUs hate scattered HBM reads. A hand-written Pallas
   gather was evaluated and rejected: Mosaic (this jaxlib) does not lower
   dynamic vector gathers from VMEM. Kept as the host-parity oracle.
2. ``warp_patch_separable`` — the MXU path. The warp family produced by
   ``random_warp_matrices`` (z-scale · in-plane shear · in-plane rotation ·
   scales/flips) factors EXACTLY into four axis-separable resampling
   passes: z-scale ∘ x-pass ∘ y-pass ∘ x-shear, each a small batched
   matmul against a 2-banded interpolation matrix — no gathers at all.
   Closed form (no trig): with A = [[a,b],[c,d]] the in-plane block,
   fold A ← −A when d<0 (a 180° turn, applied as an exact output flip),
   then q2 = −c/(r+d) with r = hypot(c,d); the y-pass scale is exactly r
   and the x-pass scale exactly dx, so every pass is well-conditioned for
   the whole random family. Same interpolation-order count as trilinear
   (one linear blend per axis), so quality is equivalent, though values
   differ from the gather path at the interpolation-error level. Elastic
   fields run as three additional scanline passes over a margin-enlarged
   patch (coordinate-exact for constant fields, O(|e|·∇e) deviation for
   strong smooth ones — a different-but-equally-valid random deformation,
   immaterial for augmentation), keeping the whole pipeline gather-free.

Parity contract: for identical (M, position) these functions match the host
reference ``transformations.py`` within float tolerance (tests/test_warp_dev.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def make_grid(patch_size):
    """Static centre-relative output grid, (3, N) float32."""
    grids = np.meshgrid(*[np.arange(p, dtype=np.float32) - (p - 1) / 2.0
                          for p in patch_size], indexing="ij")
    return jnp.asarray(np.stack([g.ravel() for g in grids]))


def trilinear_gather(src, coords):
    """src: (f, Z, X, Y); coords: (3, N) → (f, N). Border-clamped."""
    sp = src.shape[1:]
    c0 = jnp.floor(coords).astype(jnp.int32)
    frac = coords - c0
    sp_arr = jnp.asarray(sp, jnp.int32).reshape(3, 1)
    c0 = jnp.clip(c0, 0, jnp.maximum(sp_arr - 2, 0))
    c1 = jnp.minimum(c0 + 1, sp_arr - 1)
    frac = jnp.clip(frac, 0.0, 1.0)
    z0, x0, y0 = c0[0], c0[1], c0[2]
    z1, x1, y1 = c1[0], c1[1], c1[2]
    fz, fx, fy = frac[0], frac[1], frac[2]
    flat = src.reshape(src.shape[0], -1)
    sx, sy = sp[1] * sp[2], sp[2]

    def g(dz, dx, dy):
        idx = ((z1 if dz else z0) * sx + (x1 if dx else x0) * sy
               + (y1 if dy else y0))
        return jnp.take(flat, idx, axis=1)

    w000 = (1 - fz) * (1 - fx) * (1 - fy)
    w001 = (1 - fz) * (1 - fx) * fy
    w010 = (1 - fz) * fx * (1 - fy)
    w011 = (1 - fz) * fx * fy
    w100 = fz * (1 - fx) * (1 - fy)
    w101 = fz * (1 - fx) * fy
    w110 = fz * fx * (1 - fy)
    w111 = fz * fx * fy
    return (g(0, 0, 0) * w000 + g(0, 0, 1) * w001
            + g(0, 1, 0) * w010 + g(0, 1, 1) * w011
            + g(1, 0, 0) * w100 + g(1, 0, 1) * w101
            + g(1, 1, 0) * w110 + g(1, 1, 1) * w111)


def nearest_gather(src, coords):
    """src: (Z, X, Y) or (f, Z, X, Y); coords: (3, N). Border-clamped."""
    squeeze = src.ndim == 3
    if squeeze:
        src = src[None]
    sp = src.shape[1:]
    c = jnp.clip(jnp.rint(coords).astype(jnp.int32), 0,
                 jnp.asarray(sp, jnp.int32).reshape(3, 1) - 1)
    flat = src.reshape(src.shape[0], -1)
    idx = c[0] * (sp[1] * sp[2]) + c[1] * sp[2] + c[2]
    out = jnp.take(flat, idx, axis=1)
    return out[0] if squeeze else out


def transform_grid(grid, M, position):
    """Apply homogeneous M (4,4) + translation to a (3, N) grid."""
    lin = M[:3, :3] @ grid + M[:3, 3:4]
    w = M[3, :3] @ grid + M[3, 3]
    return lin / w + position.reshape(3, 1)


def warp_patch(src, M, position, patch_size, target=None,
               target_patch_size=None, target_strides=None,
               target_offset=None, elastic=None):
    """Cut one warped patch (+ aligned nearest-interp target) on device.

    Device analog of ``data.transformations.warp_slice`` (border-clamp
    instead of OOB error — position validity is the host sampler's job).
    ``elastic``: optional (3, *patch) displacement field added in source
    space (see ``random_elastic_fields``).
    """
    grid = make_grid(patch_size)
    coords = transform_grid(grid, M, position)
    if elastic is not None:
        coords = coords + elastic.reshape(3, -1)
    out = trilinear_gather(src, coords).reshape((src.shape[0],)
                                                + tuple(patch_size))
    if target is None:
        return out
    tps = tuple(target_patch_size or patch_size)
    tgrid = make_grid(tps)
    if target_strides is not None:
        tgrid = tgrid * jnp.asarray(target_strides,
                                    jnp.float32).reshape(3, 1)
    if target_offset is not None:
        tgrid = tgrid + jnp.asarray(target_offset,
                                    jnp.float32).reshape(3, 1)
    t_coords = transform_grid(tgrid, M, position)
    if elastic is not None:
        # labels must follow the image's deformation: sample the per-patch
        # field at the target grid's (static) positions within the patch
        from elektronn2_tpu.data.transformations import target_grid_indices
        iz, ix, iy = target_grid_indices(patch_size, tps, target_strides,
                                         target_offset)
        f = elastic.reshape((3,) + tuple(patch_size))
        t_field = f[:, iz][:, :, ix][:, :, :, iy]
        t_coords = t_coords + t_field.reshape(3, -1)
    t_out = nearest_gather(target, t_coords)
    t_out = t_out.reshape(tps if target.ndim == 3
                          else (target.shape[0],) + tps)
    return out, t_out


# ------------------------------------------- separable (MXU) resampling core

def _sep_geometry(patch_size, amount):
    """Static array extents for the separable pipeline, sized for the worst
    case of the ``random_warp_matrices(amount=...)`` family (post-fold
    rotation ≤ 90°, scales within 1±0.2·amount, shear ≤ 0.2·amount)."""
    amount = max(float(amount), 0.0)
    th = min(np.pi * amount, np.pi / 2)
    q2m = np.tan(th / 2)
    scM = 1.0 + 0.2 * amount
    shm = 0.2 * amount
    hz, hx, hy = [(int(p) - 1) / 2.0 for p in patch_size]
    nx3 = 2 * int(np.ceil(hx + q2m * hy)) + 3       # intermediate x extent
    bbz = int(np.ceil(scM * hz)) + 3
    bbx = int(np.ceil(scM * (1 + shm) * (hx + hy))) + 3
    bby = int(np.ceil(scM * (hx + hy))) + 3
    return nx3, (2 * bbz + 1, 2 * bbx + 1, 2 * bby + 1)


def _lin_weights(pos, n_src):
    """Row-stochastic 2-banded linear-interp matrix: (..., n_out) fractional
    source indices → (..., n_out, n_src). Border-clamped."""
    i = jnp.arange(n_src, dtype=jnp.float32)
    p = jnp.clip(pos, 0.0, n_src - 1.0)
    return jnp.maximum(0.0, 1.0 - jnp.abs(p[..., None] - i))


def _nn_weights(pos, n_src):
    """One-hot nearest-neighbour matrix (labels)."""
    i = jnp.arange(n_src, dtype=jnp.float32)
    p = jnp.clip(jnp.round(pos), 0.0, n_src - 1.0)
    return (p[..., None] == i).astype(jnp.float32)


def _elastic_passes(vol, disp, weights, grids, margin=0):
    """Resample ``vol`` (f, *sp_enlarged) by a per-voxel displacement
    ``disp`` (3, *out_sp, in the enlarged volume's index units), one axis
    at a time (three banded-matmul passes — the classic scanline
    decomposition; coordinate-exact for constant fields, O(|e|·∇e) error
    for smooth ones). Each pass shrinks its axis from the margin-enlarged
    extent to the final one; the displacement is edge-extended over axes
    not yet reduced."""
    m = int(margin)
    gz, gx, gy = grids            # output index grids per axis (1-D)

    def epad(arr, mx, my):        # edge-extend over still-enlarged axes
        return jnp.pad(arr, ((0, 0), (mx, mx), (my, my)), mode="edge") \
            if (mx or my) else arr

    # z-pass: out[z,x,y] = vol[z + dz(z,x,y), x, y]
    Wz = weights(jnp.moveaxis(gz[:, None, None] + epad(disp[0], m, m),
                              0, -1), vol.shape[1])   # (x, y, z_out, Z)
    v = jnp.einsum("xyzZ,fZxy->fzxy", Wz, vol)
    Wx = weights(jnp.moveaxis(gx[None, :, None] + epad(disp[1], 0, m),
                              1, -1), v.shape[2])     # (z, y, x_out, X)
    v = jnp.einsum("zyxX,fzXy->fzxy", Wx, v)
    Wy = weights(gy[None, None, :] + disp[2], v.shape[3])
    return jnp.einsum("zxyY,fzxY->fzxy", Wy, v)       # (z, x, y_out, Y)


def warp_patch_separable(src, M, position, patch_size, target=None,
                         target_patch_size=None, target_strides=None,
                         target_offset=None, amount_bound=1.0,
                         elastic=None, elastic_margin=3):
    """Cut one warped patch via four MXU matmul passes (no gathers).

    Requires M from the ``random_warp_matrices`` family (z decoupled:
    M[0,1:3] = M[1:3,0] = 0, affine: M[3,:3] = 0) — the structure is
    assumed, not checked (entries are traced). For general M use
    ``warp_patch``. Interface and return values mirror ``warp_patch``;
    values differ at the interpolation-error level (axis-factored vs
    direct trilinear blending).

    ``elastic``: optional (3, *patch) source-space displacement field —
    applied as a post-warp of the affine patch by the field mapped
    through A⁻¹ (exact identity), itself resampled in three per-voxel
    banded-matmul passes (scanline decomposition: exact for constant
    fields; O(|e|·∇e) deviation from trilinear for smooth ones —
    immaterial for augmentation, still gather-free).
    """
    pz, px, py = [int(p) for p in patch_size]
    # with elastic on, the affine patch is computed with a static margin so
    # the displacement passes sample interior data instead of border clamps
    m = int(elastic_margin) if elastic is not None else 0
    pe = (pz + 2 * m, px + 2 * m, py + 2 * m)
    nx3, (nbz, nbx, nby) = _sep_geometry(pe, amount_bound)

    # ---- per-item pass parameters (closed form, no trig)
    a, b = M[1, 1], M[1, 2]
    c, d = M[2, 1], M[2, 2]
    dz = M[0, 0]
    if elastic is not None:
        # patch-space displacement: d_p = A⁻¹ · e  (original, unfolded A)
        det = a * d - b * c
        e = elastic.reshape(3, pz, px, py)
        disp = jnp.stack([e[0] / dz,
                          (d * e[1] - b * e[2]) / det,
                          (-c * e[1] + a * e[2]) / det])
    T = M[:3, 3] + position          # absolute source coords of patch centre
    fold = d < 0                      # in-plane rotation beyond ±90°:
    sgn = jnp.where(fold, -1.0, 1.0)  # fold a 180° turn into an output flip
    a, b, c, d = a * sgn, b * sgn, c * sgn, d * sgn
    r = jnp.hypot(c, d)
    q2 = -c / (r + d)                 # last-pass shear  (|q2| ≤ 1 post-fold)
    s = r                             # y-pass scale  (== d - c*q2, exactly)
    q1 = (b - a * q2) / s             # first-pass shear
    p1 = a - q1 * c                   # first-pass scale (== dx, exactly)

    def ensure_bbox_fits(vol4):
        """Zero-pad trailing spatial dims so the static bbox cut fits."""
        if any(n > sdim for n, sdim in zip((nbz, nbx, nby), vol4.shape[1:])):
            vol4 = jnp.pad(vol4, [(0, 0)] + [
                (0, max(0, n - sdim))
                for n, sdim in zip((nbz, nbx, nby), vol4.shape[1:])])
        return vol4

    # ---- bounding-box cut (the only non-matmul data movement)
    src = ensure_bbox_fits(src)
    hb = jnp.asarray([(nbz - 1) / 2, (nbx - 1) / 2, (nby - 1) / 2])
    lim = jnp.asarray(src.shape[1:]) - jnp.asarray([nbz, nbx, nby])
    corner = jnp.clip(jnp.round(T) - hb, 0, lim).astype(jnp.int32)
    bbox = jax.lax.dynamic_slice(
        src, (0, corner[0], corner[1], corner[2]),
        (src.shape[0], nbz, nbx, nby))

    # ---- output/intermediate grids (centre-relative, margin-enlarged)
    zi = jnp.arange(pe[0], dtype=jnp.float32) - (pe[0] - 1) / 2
    xi = jnp.arange(pe[1], dtype=jnp.float32) - (pe[1] - 1) / 2
    yi = jnp.arange(pe[2], dtype=jnp.float32) - (pe[2] - 1) / 2
    x3 = jnp.arange(nx3, dtype=jnp.float32) - (nx3 - 1) / 2
    yb = jnp.arange(nby, dtype=jnp.float32)          # bbox y indices

    corner_f = corner.astype(jnp.float32)

    def passes(vol, tz, tx, ty, weights):
        # the fold (A ← −A) is compensated exactly by negating the in-plane
        # output grid: F(p) = src(Ap + T) = G(−p) with G built from −A
        tx = tx * sgn
        ty = ty * sgn
        # z-pass: src_z = dz·z + T_z
        Wz = weights(dz * tz + T[0] - corner_f[0], nbz)
        v = jnp.einsum("pz,fzxy->fpxy", Wz, vol)
        # x-pass onto the intermediate grid: src_x = p1·x3 + q1·y_abs + τ1
        pos1 = (p1 * x3[:, None] + q1 * (yb[None, :] + corner_f[2])
                + (T[1] - q1 * T[2]) - corner_f[1])          # (nx3, nby)
        W1 = weights(pos1.T, nbx)                            # (nby, nx3, nbx)
        v = jnp.einsum("yXx,fzxy->fzXy", W1, v)
        # y-pass onto the output y grid: src_y = c·x3 + s·y + T_y
        pos2 = c * x3[:, None] + s * ty[None, :] + T[2] - corner_f[2]
        W2 = weights(pos2, nby)                              # (nx3, py, nby)
        v = jnp.einsum("xYy,fzxy->fzxY", W2, v)
        # x-shear onto the output x grid: x3 = x + q2·y
        pos3 = tx[:, None] + q2 * ty[None, :] + (nx3 - 1) / 2
        W3 = weights(pos3.T, nx3)                            # (py, px, nx3)
        return jnp.einsum("yXx,fzxy->fzXy", W3, v)

    out = passes(bbox, zi, xi, yi, _lin_weights)
    if elastic is not None:
        idx_grids = (jnp.arange(pz, dtype=jnp.float32) + m,
                     jnp.arange(px, dtype=jnp.float32) + m,
                     jnp.arange(py, dtype=jnp.float32) + m)
        out = _elastic_passes(out, disp, _lin_weights, idx_grids, margin=m)

    if target is None:
        return out
    tps = tuple(int(t) for t in (target_patch_size or patch_size))
    st = tuple(float(v) for v in (target_strides or (1.0, 1.0, 1.0)))
    toff = tuple(float(v) for v in (target_offset or (0.0, 0.0, 0.0)))
    tz = (jnp.arange(tps[0] + 2 * m, dtype=jnp.float32) - m
          - (tps[0] - 1) / 2) * st[0] + toff[0]
    tx = (jnp.arange(tps[1] + 2 * m, dtype=jnp.float32) - m
          - (tps[1] - 1) / 2) * st[1] + toff[1]
    ty = (jnp.arange(tps[2] + 2 * m, dtype=jnp.float32) - m
          - (tps[2] - 1) / 2) * st[2] + toff[2]
    squeeze = target.ndim == 3
    tgt4 = ensure_bbox_fits(target[None] if squeeze else target)
    tbox = jax.lax.dynamic_slice(
        tgt4.astype(jnp.float32), (0, corner[0], corner[1], corner[2]),
        (tgt4.shape[0], nbz, nbx, nby))
    t_out = passes(tbox, tz, tx, ty, _nn_weights)
    if elastic is not None:
        # labels follow the image's deformation: sample the patch-space
        # field at the target grid's (static) positions, convert to
        # target-index units (divide by the grid strides)
        from elektronn2_tpu.data.transformations import target_grid_indices
        iz, ix, iy = target_grid_indices(patch_size, tps,
                                         target_strides, target_offset)
        d_t = disp[:, iz][:, :, ix][:, :, :, iy] \
            / jnp.asarray(st, jnp.float32).reshape(3, 1, 1, 1)
        t_grids = (jnp.arange(tps[0], dtype=jnp.float32) + m,
                   jnp.arange(tps[1], dtype=jnp.float32) + m,
                   jnp.arange(tps[2], dtype=jnp.float32) + m)
        t_out = _elastic_passes(t_out, d_t, _nn_weights, t_grids, margin=m)
    t_out = jnp.rint(t_out).astype(target.dtype) \
        if jnp.issubdtype(target.dtype, jnp.integer) \
        else t_out.astype(target.dtype)
    return out, (t_out[0] if squeeze else t_out)


# ------------------------------------------------- random params, on device

def random_warp_matrices(key, batch_size, amount=1.0, lock_z=True,
                         no_x_flip=False, sample_aniso=True):
    """Batched random warp matrices, (B, 4, 4) — device analog of
    ``transformations.get_random_warp_params`` + ``make_warp_matrix``."""
    keys = jax.random.split(key, 6)
    B = batch_size
    rot = jax.random.uniform(keys[0], (B,), minval=-np.pi * amount,
                             maxval=np.pi * amount)
    shear_a = jax.random.uniform(keys[1], (B,), minval=-0.2,
                                 maxval=0.2) * amount
    sc = 1.0 + jax.random.uniform(keys[2], (B, 3), minval=-0.2,
                                  maxval=0.2) * amount
    if sample_aniso:
        sc = sc.at[:, 0].set(1.0 + (sc[:, 0] - 1.0) * 0.5)
    fx = (jnp.zeros(B, bool) if no_x_flip
          else jax.random.bernoulli(keys[3], 0.5, (B,)))
    fy = jax.random.bernoulli(keys[4], 0.5, (B,))
    fz = (jnp.zeros(B, bool) if lock_z
          else jax.random.bernoulli(keys[5], 0.5, (B,)))

    c, s = jnp.cos(rot), jnp.sin(rot)
    one = jnp.ones(B)
    zero = jnp.zeros(B)
    # R_z (rotation in x/y plane)
    R = jnp.stack([
        jnp.stack([one, zero, zero], 1),
        jnp.stack([zero, c, -s], 1),
        jnp.stack([zero, s, c], 1)], axis=1)
    # shear in the plane orthogonal to z: M[1,2] += shear
    Sh = jnp.eye(3)[None].repeat(B, 0).at[:, 1, 2].add(shear_a)
    # scale * flip signs
    sign = jnp.stack([jnp.where(fz, -1.0, 1.0), jnp.where(fx, -1.0, 1.0),
                      jnp.where(fy, -1.0, 1.0)], axis=1)
    D = jax.vmap(jnp.diag)(sc * sign)
    lin = jnp.einsum("bij,bjk,bkl->bil", D, Sh, R)
    M = jnp.zeros((B, 4, 4)).at[:, :3, :3].set(lin).at[:, 3, 3].set(1.0)
    return M


def random_elastic_fields(key, batch_size, patch_size, grid=4, sigma=3.0):
    """Batched low-frequency elastic displacement fields, (B, 3, *patch).

    Device analog of ``data.transformations.make_elastic_field``: coarse
    Gaussian displacements upsampled trilinearly to the patch grid
    (``jax.image.resize``).
    """
    coarse = jax.random.normal(key, (batch_size, 3, grid, grid, grid)) * sigma
    fields = jax.image.resize(coarse,
                              (batch_size, 3) + tuple(int(p)
                                                      for p in patch_size),
                              method="trilinear")
    # singleton axes (2D data promoted to z=1) get NO displacement: a
    # nonzero z-component would sample the zero padding around the single
    # real plane and black out patch regions
    for d, p in enumerate(patch_size):
        if int(p) == 1:
            fields = fields.at[:, d].set(0.0)
    return fields


def grey_augment(key, x, channels=None):
    """Batched on-device brightness/contrast/gamma distortion.

    Device analog of ``data.image.greyAugment``; x: (B, f, *sp) in [0,1].
    """
    B, F = x.shape[:2]
    kc, kb, kg = jax.random.split(key, 3)
    alpha = 1.0 + jax.random.uniform(kc, (B, F), minval=-0.3, maxval=0.3)
    beta = jax.random.uniform(kb, (B, F), minval=-0.15, maxval=0.15)
    gamma = 2.0 ** jax.random.uniform(kg, (B, F), minval=-1.0, maxval=1.0)
    shape = (B, F) + (1,) * (x.ndim - 2)
    y = x * alpha.reshape(shape) + beta.reshape(shape)
    y = jnp.clip(y, 0.0, 1.0) ** gamma.reshape(shape)
    if channels is not None:
        # excluded channels pass through UNTOUCHED (the host greyAugment
        # never reads them) — even the [0,1] clip would corrupt channels
        # holding e.g. signed distance features
        mask = jnp.zeros(F, bool).at[jnp.asarray(channels)].set(True)
        y = jnp.where(mask.reshape((1, F) + (1,) * (x.ndim - 2)), y, x)
    return y


# ------------------------------------------------------- batched pipeline

class DeviceBatchAugmenter:
    """HBM-resident augmentation pipeline.

    Training cubes are stacked (padded) into one device array; per batch the
    host only draws cube indices + positions; ONE jitted call produces the
    full augmented (data, target) batch on device. This is the TPU-native
    replacement for the reference's forked CPU augmentation workers
    (SURVEY.md §3.7 host-parallelism row).
    """

    def __init__(self, raws, labels, patch_size, target_size=None,
                 target_strides=None, warp_amount=1.0, grey_channels=None,
                 elastic_sigma=0.0, elastic_grid=4, valid_cubes=None,
                 seed=0, resample="auto"):
        # 2D data: promote to singleton-z 3D (squeezed back in getbatch)
        self._is_2d = len(patch_size) == 2
        if self._is_2d:
            raws = [r[:, None] if r.ndim == 3 else r for r in raws]
            labels = [l[None] if l.ndim == 2 else l for l in labels]
            patch_size = (1,) + tuple(patch_size)
            if target_size is not None:
                target_size = (1,) + tuple(target_size)
            if target_strides is not None:
                target_strides = (1,) + tuple(target_strides)
        f = raws[0].shape[0]
        sp = np.max([r.shape[1:] for r in raws], axis=0)
        self.n_cubes = len(raws)
        self.valid_cubes = sorted(set(valid_cubes or []))
        self.train_cubes = [i for i in range(self.n_cubes)
                            if i not in self.valid_cubes]
        if not self.train_cubes:
            raise ValueError("no training cubes left after valid split")
        # labels keep their dtype family (float regression targets allowed)
        l_dtype = (np.float32 if np.asarray(labels[0]).dtype.kind == "f"
                   else np.int32)
        stack_r = np.zeros((self.n_cubes, f, *sp), np.float32)
        stack_l = np.zeros((self.n_cubes, *sp), l_dtype)
        for i, (r, l) in enumerate(zip(raws, labels)):
            sl = tuple(slice(0, s) for s in r.shape[1:])
            stack_r[(i, slice(None)) + sl] = r
            stack_l[(i,) + sl] = l
        self.raws = jnp.asarray(stack_r)
        self.labels = jnp.asarray(stack_l)
        self.cube_shapes = np.array([r.shape[1:] for r in raws])
        self.patch_size = tuple(int(p) for p in patch_size)
        self.target_size = tuple(int(t) for t in (target_size or patch_size))
        self.target_strides = (tuple(target_strides)
                               if target_strides is not None else None)
        self.warp_amount = float(warp_amount)
        self.grey_channels = grey_channels
        self.elastic_sigma = float(elastic_sigma)
        self.elastic_grid = int(elastic_grid)
        # resampling core: 'separable' = MXU matmul passes (no gathers;
        # elastic applied as scanline post-passes), 'gather' = trilinear
        # gather (the host-parity oracle path), 'auto' = separable
        if resample not in ("auto", "separable", "gather"):
            raise ValueError(f"resample={resample!r}: expected 'auto', "
                             "'separable' or 'gather'")
        self._separable = resample in ("separable", "auto")
        # elastic scanline margin: cover ~3 sigma displacements
        self._elastic_margin = (max(3, int(np.ceil(3 * self.elastic_sigma)))
                                if self.elastic_sigma > 0 else 0)
        if self._separable:
            # pad the stacks once so per-item bbox cuts never re-pad
            # (geometry sized for the elastic-margin-enlarged patch)
            m2 = 2 * self._elastic_margin
            _, bb = _sep_geometry([p + m2 for p in self.patch_size],
                                  self.warp_amount)
            pads = [max(0, n - s) for n, s in zip(bb, self.raws.shape[2:])]
            if any(pads):
                self.raws = jnp.pad(self.raws,
                                    [(0, 0), (0, 0)] + [(0, p)
                                                        for p in pads])
                self.labels = jnp.pad(
                    self.labels,
                    [(0, 0)] * (self.labels.ndim - 3) + [(0, p)
                                                         for p in pads])
        self._seed0 = int(seed)
        self.key = jax.random.PRNGKey(seed)
        self._fn = jax.jit(self._batch_fn)
        self._host_rng = np.random.RandomState(seed)

    def _batch_fn(self, raws, labels, key, cube_idx, positions, warp_on,
                  grey_on, flip_on):
        # raws/labels are ARGUMENTS (not closed-over) so the cube stacks
        # enter the jitted program as runtime buffers, never as HLO
        # constants — closing over them embeds the full training volume in
        # every compiled program (bloats executables and compile payloads)
        kw, kg, ke, kf = jax.random.split(key, 4)
        B = cube_idx.shape[0]
        Ms = random_warp_matrices(kw, B, amount=self.warp_amount)
        # the unwarped half of a TRAINING batch still gets random FLIPS
        # (amount=0 → identity rot/shear/scale, flips only) — gating the
        # whole matrix on warp_on made flips silently vanish for those
        # samples, the same bug the host path fixed in
        # cnndata._try_sample (review r2 s5). flip_on=False (validation)
        # falls back to the identity.
        Mf = jnp.where(flip_on,
                       random_warp_matrices(kf, B, amount=0.0),
                       jnp.eye(4)[None])
        Ms = jnp.where(warp_on.reshape(B, 1, 1), Ms, Mf)
        use_elastic = self.elastic_sigma > 0
        if use_elastic:
            fields = random_elastic_fields(ke, B, self.patch_size,
                                           self.elastic_grid,
                                           self.elastic_sigma)
            fields = fields * warp_on.reshape(B, 1, 1, 1, 1)
        else:  # skip the whole field path on the hot loop
            fields = jnp.zeros((B, 1))

        def one(i, M, pos, field):
            src = raws[i]
            lab = labels[i]
            if self._separable:
                return warp_patch_separable(
                    src, M, pos, self.patch_size, target=lab,
                    target_patch_size=self.target_size,
                    target_strides=self.target_strides,
                    amount_bound=self.warp_amount,
                    elastic=field if use_elastic else None,
                    elastic_margin=self._elastic_margin)
            return warp_patch(src, M, pos, self.patch_size, target=lab,
                              target_patch_size=self.target_size,
                              target_strides=self.target_strides,
                              elastic=field if use_elastic else None)

        data, tgt = jax.vmap(one)(cube_idx, Ms, positions, fields)
        if self.grey_channels:
            aug = grey_augment(kg, data, self.grey_channels)
            data = jnp.where(grey_on, aug, data)
        return data, tgt

    def reseed(self, n):
        """Re-derive the sampling RNG streams from ``n`` (the Trainer calls
        this with the resume step so a restarted run draws FRESH batches
        instead of replaying the sequence from step 1)."""
        mix = (self._seed0 * 40503 + int(n) * 2654435761 + 12345) % (2 ** 31)
        self.key = jax.random.fold_in(jax.random.PRNGKey(mix), int(n))
        self._host_rng = np.random.RandomState(mix)
        return self

    def _safe_margin(self):
        """Position margin covering the WORST-CASE warp: rotation (patch
        diagonal) × scale (≤ 1+0.2·amount) × shear (≤ 1+0.2·amount) +
        elastic displacement. The old ``diag/2 + 2`` was the unwarped
        bound, so strong warps near cube borders silently read the zero
        padding / clamped border (review r2 s5 — the host path's OOB
        retry rejects exactly those positions). Cubes smaller than twice
        this margin still clamp (fixed-shape device sampling cannot
        retry) — that residual border artifact is documented
        distribution-grade behaviour."""
        a = float(self.warp_amount)
        m = (np.linalg.norm(self.patch_size) / 2
             * (1.0 + 0.2 * a) * (1.0 + 0.2 * a))
        return float(m + getattr(self, "_elastic_margin", 0) + 2)

    def _align_unwarped(self, pos, warp_on):
        """Integer-align the positions of non-warped samples so identity/
        flip-only patches are EXACT voxel crops (fractional positions put
        every nominally-unaugmented sample through interpolation blur —
        review r2 s5; mirrors cnndata._try_sample's alignment)."""
        p = jnp.asarray(self.patch_size, jnp.float32)
        aligned = jnp.floor(pos - (p - 1) / 2) + (p - 1) / 2
        return jnp.where(jnp.asarray(warp_on).reshape(-1, 1), pos, aligned)

    # ---- device-side sampling (for fused multi-step training loops) ----
    def _sample_device(self, key, batch_size, warp_prob):
        """Traced analog of ``getbatch``'s host sampling: cube indices,
        margin-respecting uniform positions, warp gates — all on device."""
        ki, kp, kw = jax.random.split(key, 3)
        pool = jnp.asarray(self.train_cubes, jnp.int32)
        idx = pool[jax.random.randint(ki, (batch_size,), 0, len(pool))]
        margin = self._safe_margin()
        sh = jnp.asarray(self.cube_shapes, jnp.float32)       # (n_cubes, 3)
        lo_all = jnp.minimum(margin, sh / 2 - 1)
        lo = lo_all[idx]
        hi = sh[idx] - lo_all[idx]
        u = jax.random.uniform(kp, (batch_size, 3))
        pos = lo + u * (hi - lo)
        warp_on = jax.random.bernoulli(kw, warp_prob, (batch_size,))
        pos = self._align_unwarped(pos, warp_on)
        if self._is_2d:
            pos = pos.at[:, 0].set(0.0)
        return idx, pos, warp_on

    def device_batch(self, key, batch_size, warp=0.5, grey=True,
                     flip=True, raws=None, labels=None):
        """Fully-traced batch production: sampling + augmentation in one
        pure function of ``key`` — the building block of
        ``training.fused_loop`` (one device dispatch for many training
        steps). Returns (data, target) with the same shapes/squeezing as
        ``getbatch(source='train')``.

        When called inside an outer jit, pass the cube stacks through that
        jit's arguments as ``raws``/``labels`` (otherwise they trace as
        giant HLO constants — see ``_batch_fn``)."""
        ks, kb = jax.random.split(key)
        wp = 1.0 if warp is True else float(warp or 0.0)
        idx, pos, warp_on = self._sample_device(ks, batch_size, wp)
        data, tgt = self._batch_fn(raws if raws is not None else self.raws,
                                   labels if labels is not None
                                   else self.labels,
                                   kb, idx, pos, warp_on,
                                   jnp.asarray(bool(grey)),
                                   jnp.asarray(bool(flip)))
        return self._squeeze_2d(data, tgt)

    def _squeeze_2d(self, data, tgt):
        if self._is_2d:
            data = data[:, :, 0]
            tgt = tgt[:, 0] if tgt.ndim == 4 else tgt[..., 0, :, :]
        return data, tgt

    def getbatch(self, batch_size=1, warp=0.5, source="train", flip=True,
                 **_ignored):
        """Host-side driver: sample cubes/positions, run the jitted batch fn.

        ``source='valid'`` samples the held-out cubes (``valid_cubes``) with
        augmentation disabled.
        """
        rng = self._host_rng
        if source == "valid":
            if not self.valid_cubes:
                raise ValueError("no validation cubes configured")
            pool = self.valid_cubes
            warp = 0.0
        else:
            pool = self.train_cubes
        idx = np.asarray(pool)[rng.randint(0, len(pool), size=batch_size)]
        margin = self._safe_margin()
        pos = np.empty((batch_size, 3), np.float32)
        for b, i in enumerate(idx):
            sh = self.cube_shapes[i]
            lo = np.minimum(margin, sh / 2 - 1)
            pos[b] = rng.uniform(lo, sh - lo)
        warp_on = rng.rand(batch_size) < (1.0 if warp is True else
                                          float(warp or 0.0))
        p = np.asarray(self.patch_size, np.float64)
        aligned = np.floor(pos - (p - 1) / 2) + (p - 1) / 2
        pos = np.where(warp_on[:, None], pos, aligned).astype(np.float32)
        if self._is_2d:
            pos[:, 0] = 0.0
        self.key, sub = jax.random.split(self.key)
        data, tgt = self._fn(self.raws, self.labels, sub, jnp.asarray(idx),
                             jnp.asarray(pos), jnp.asarray(warp_on),
                             jnp.asarray(source == "train"),
                             jnp.asarray(bool(flip)
                                         and source == "train"))
        return self._squeeze_2d(data, tgt)
