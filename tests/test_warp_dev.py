"""Device-warp parity tests: ops/warp.py (on-device, batched) must match
data/transformations.py (host reference) for identical transforms —
SURVEY.md §8 stage-2 parity contract."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from elektronn2_tpu.data.transformations import (
    warp_slice, make_warp_matrix, get_random_warp_params,
)
from elektronn2_tpu.ops.warp import (
    warp_patch, trilinear_gather, nearest_gather, make_grid,
    random_warp_matrices, grey_augment, DeviceBatchAugmenter,
)


def test_device_identity_warp_parity(rng):
    vol = rng.rand(1, 20, 21, 22).astype(np.float32)
    patch = (8, 9, 10)
    host = warp_slice(vol, patch)
    dev = np.asarray(warp_patch(jnp.asarray(vol), jnp.eye(4),
                                jnp.asarray(np.array(vol.shape[1:]) - 1,
                                            np.float32) / 2,
                                patch))
    np.testing.assert_allclose(dev, host, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_random_warp_parity(rng, seed):
    """Same M + position → device output == host output (float tol)."""
    r = np.random.RandomState(seed)
    vol = r.rand(2, 24, 24, 24).astype(np.float32)
    params = get_random_warp_params(r, amount=0.5)
    M = make_warp_matrix(**params)
    pos = np.array([12.0, 12.0, 12.0])
    patch = (6, 6, 6)
    host = warp_slice(vol, patch, M=M, position=pos)
    dev = np.asarray(warp_patch(jnp.asarray(vol), jnp.asarray(M, jnp.float32),
                                jnp.asarray(pos, jnp.float32), patch))
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_device_target_parity(rng):
    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    lab = rng.randint(0, 7, (24, 24, 24)).astype(np.int32)
    params = get_random_warp_params(np.random.RandomState(5), amount=0.3)
    M = make_warp_matrix(**params)
    pos = np.array([12.0, 12.0, 12.0])
    host_d, host_t = warp_slice(vol, (8, 8, 8), M=M, position=pos,
                                target=lab, target_patch_size=(4, 4, 4),
                                target_strides=(2, 2, 2))
    dev_d, dev_t = warp_patch(jnp.asarray(vol), jnp.asarray(M, jnp.float32),
                              jnp.asarray(pos, jnp.float32), (8, 8, 8),
                              target=jnp.asarray(lab),
                              target_patch_size=(4, 4, 4),
                              target_strides=(2, 2, 2))
    np.testing.assert_allclose(np.asarray(dev_d), host_d, atol=1e-4)
    # nearest-neighbour ties at .5 can differ; demand near-total agreement
    assert (np.asarray(dev_t) == host_t).mean() > 0.97


def test_gather_matches_numpy(rng):
    vol = rng.rand(2, 10, 10, 10).astype(np.float32)
    coords = rng.uniform(1, 8, (3, 50)).astype(np.float32)
    from elektronn2_tpu.data.transformations import (
        map_coordinates_linear, map_coordinates_nearest)
    np.testing.assert_allclose(
        np.asarray(trilinear_gather(jnp.asarray(vol), jnp.asarray(coords))),
        map_coordinates_linear(vol, coords), atol=1e-5)
    got_n = np.asarray(nearest_gather(jnp.asarray(vol), jnp.asarray(coords)))
    want_n = map_coordinates_nearest(vol, coords)
    assert (got_n == want_n).mean() > 0.97


def test_random_warp_matrices_shape_and_variety():
    Ms = np.asarray(random_warp_matrices(jax.random.PRNGKey(0), 4))
    assert Ms.shape == (4, 4, 4)
    np.testing.assert_allclose(Ms[:, 3, 3], 1.0)
    np.testing.assert_allclose(Ms[:, 3, :3], 0.0, atol=1e-7)
    assert not np.allclose(Ms[0], Ms[1])


def test_grey_augment_device(rng):
    x = jnp.asarray(rng.rand(2, 2, 4, 4, 4).astype(np.float32))
    y = np.asarray(grey_augment(jax.random.PRNGKey(1), x, channels=[0]))
    assert y.shape == x.shape
    assert y.min() >= 0 and y.max() <= 1
    # channel 1 untouched
    np.testing.assert_allclose(y[:, 1], np.asarray(x)[:, 1], atol=1e-6)
    assert not np.allclose(y[:, 0], np.asarray(x)[:, 0])


def test_device_batch_augmenter_end_to_end(rng):
    raws = [rng.rand(1, 24, 24, 24).astype(np.float32) for _ in range(2)]
    labs = [(r[0] > 0.5).astype(np.int32) for r in raws]
    aug = DeviceBatchAugmenter(raws, labs, patch_size=(8, 8, 8),
                               target_size=(4, 4, 4), grey_channels=[0])
    d, t = aug.getbatch(batch_size=3, warp=0.5)
    assert d.shape == (3, 1, 8, 8, 8)
    assert t.shape == (3, 4, 4, 4)
    assert np.isfinite(np.asarray(d)).all()
    # two draws differ (random positions)
    d2, _ = aug.getbatch(batch_size=3, warp=0.5)
    assert not np.allclose(np.asarray(d), np.asarray(d2))


def test_device_augmenter_trains_model(rng):
    """Full device-augmentation training loop: the stage-2 milestone."""
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset(seed=1)
    inp = nm.Input([4, 1, 10, 10, 10], "b,f,z,x,y", name="raw")
    c = nm.Conv(inp, 4, 3, 1, name="c1")
    probs = nm.Softmax(nm.Conv(c, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([4, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)
    m.set_opt("Adam", lr=3e-3)
    raws = [rng.rand(1, 32, 32, 32).astype(np.float32)]
    labs = [(raws[0][0] > 0.5).astype(np.int32)]
    aug = DeviceBatchAugmenter(raws, labs, patch_size=(10, 10, 10),
                               target_size=probs.shape.spatial_shape)
    losses = []
    for _ in range(25):
        d, t = aug.getbatch(batch_size=4, warp=0.3)
        l, _ = m.trainingstep(d, t)
        losses.append(float(l))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_device_elastic_parity(rng):
    """Same elastic field → device == host."""
    from elektronn2_tpu.data.transformations import make_elastic_field
    vol = rng.rand(1, 24, 24, 24).astype(np.float32)
    field = make_elastic_field(rng, (6, 6, 6), grid=3, sigma=1.5)
    host = warp_slice(vol, (6, 6, 6), elastic=field,
                      position=np.array([12.0, 12.0, 12.0]))
    dev = np.asarray(warp_patch(jnp.asarray(vol), jnp.eye(4),
                                jnp.asarray([12.0, 12.0, 12.0], jnp.float32),
                                (6, 6, 6),
                                elastic=jnp.asarray(field, jnp.float32)))
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_device_random_elastic_fields():
    from elektronn2_tpu.ops.warp import random_elastic_fields
    f = np.asarray(random_elastic_fields(jax.random.PRNGKey(0), 2,
                                         (6, 7, 8), grid=3, sigma=2.0))
    assert f.shape == (2, 3, 6, 7, 8)
    assert f.std() > 0.1


def test_device_augmenter_with_elastic(rng):
    raws = [rng.rand(1, 24, 24, 24).astype(np.float32)]
    labs = [(raws[0][0] > 0.5).astype(np.int32)]
    aug = DeviceBatchAugmenter(raws, labs, patch_size=(8, 8, 8),
                               target_size=(4, 4, 4), elastic_sigma=1.0)
    d, t = aug.getbatch(batch_size=2, warp=1.0)
    assert d.shape == (2, 1, 8, 8, 8) and np.isfinite(np.asarray(d)).all()


def test_device_augmenter_2d(rng):
    imgs = [rng.rand(1, 40, 40).astype(np.float32)]
    labs = [(imgs[0][0] > 0.5).astype(np.int32)]
    aug = DeviceBatchAugmenter(imgs, labs, patch_size=(12, 12),
                               target_size=(8, 8), grey_channels=[0])
    d, t = aug.getbatch(batch_size=3, warp=0.5)
    assert d.shape == (3, 1, 12, 12)
    assert t.shape == (3, 8, 8)
    assert np.isfinite(np.asarray(d)).all()


# --------------------------------------------- separable (MXU matmul) core

def _smooth(rng, shape, s=2.5):
    from scipy import ndimage
    return ndimage.gaussian_filter(rng.randn(*shape), s).astype(np.float32)


def test_separable_identity_exact(rng):
    from elektronn2_tpu.ops.warp import warp_patch_separable
    src = jnp.asarray(rng.rand(1, 32, 40, 40).astype(np.float32))
    # odd patch + integer position → the centre-relative grid lands on
    # integer voxels and the warp must be an exact crop
    out = np.asarray(warp_patch_separable(src, jnp.eye(4),
                                          jnp.asarray([16.0, 20.0, 20.0]),
                                          (9, 13, 13)))
    want = np.asarray(src[0, 12:21, 14:27, 14:27])
    np.testing.assert_allclose(out[0], want, atol=1e-6)


def test_separable_exact_on_linear_fields(rng):
    """Both trilinear and axis-factored linear interpolation reproduce
    affine-linear volumes exactly — so on such volumes the two cores must
    agree to float precision for ANY family matrix (incl. >90° folds)."""
    from elektronn2_tpu.ops.warp import (warp_patch, warp_patch_separable,
                                         random_warp_matrices)
    zz, xx, yy = np.meshgrid(np.arange(48.), np.arange(64.),
                             np.arange(64.), indexing="ij")
    lin = (0.3 * zz + 0.7 * xx - 0.2 * yy + 5).astype(np.float32)[None]
    src = jnp.asarray(lin)
    pos = jnp.asarray([24.0, 32.0, 32.0])
    Ms = random_warp_matrices(jax.random.PRNGKey(3), 8, amount=1.0)
    for i in range(8):
        a = np.asarray(warp_patch(src, Ms[i], pos, (8, 16, 16)))
        b = np.asarray(warp_patch_separable(src, Ms[i], pos, (8, 16, 16)))
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_separable_close_to_gather_on_smooth(rng):
    from elektronn2_tpu.ops.warp import (warp_patch, warp_patch_separable,
                                         random_warp_matrices)
    src = jnp.asarray(_smooth(rng, (48, 64, 64))[None])
    pos = jnp.asarray([24.0, 32.0, 32.0])
    Ms = random_warp_matrices(jax.random.PRNGKey(5), 8, amount=1.0)
    scale = float(jnp.abs(src).max())
    for i in range(8):
        a = np.asarray(warp_patch(src, Ms[i], pos, (12, 20, 20)))
        b = np.asarray(warp_patch_separable(src, Ms[i], pos, (12, 20, 20)))
        assert np.abs(a - b).max() < 0.08 * scale


def test_separable_targets_and_strides(rng):
    from elektronn2_tpu.ops.warp import (warp_patch, warp_patch_separable,
                                         random_warp_matrices)
    src = jnp.asarray(_smooth(rng, (48, 64, 64))[None])
    lab = jnp.asarray((_smooth(rng, (48, 64, 64), 4) > 0).astype(np.int32))
    pos = jnp.asarray([24.0, 32.0, 32.0])
    M = random_warp_matrices(jax.random.PRNGKey(7), 1, amount=0.7)[0]
    _, tg = warp_patch(src, M, pos, (12, 20, 20), target=lab,
                       target_patch_size=(6, 10, 10),
                       target_strides=(1, 2, 2))
    _, ts = warp_patch_separable(src, M, pos, (12, 20, 20), target=lab,
                                 target_patch_size=(6, 10, 10),
                                 target_strides=(1, 2, 2))
    tg, ts = np.asarray(tg), np.asarray(ts)
    assert ts.shape == tg.shape == (6, 10, 10) and ts.dtype == np.int32
    assert set(np.unique(ts)) <= {0, 1}       # one-hot passes: no blending
    assert (tg == ts).mean() > 0.9            # boundary voxels may differ


def test_separable_deviation_bound_fuzzed(rng):
    """PARITY.md warp-taxonomy bound, fuzz-locked (VERDICT r1 #7): over a
    fuzzed family of warp draws (seeds × amounts, affine AND elastic via
    the augmenter), the separable MXU core stays within the DOCUMENTED
    deviation bounds of the voxel-parity gather core:
      raw  ≤ 0.1 · max|src|   (smooth fields)
      labels ≥ 90% voxel agreement, one-hot preserved
    """
    from elektronn2_tpu.ops.warp import DeviceBatchAugmenter
    raws = [_smooth(rng, (40, 48, 48))[None]]
    labs = [(_smooth(rng, (40, 48, 48), 4) > 0).astype(np.int16)]
    worst_raw, worst_lab = 0.0, 1.0
    for seed in (1, 2):
        # affine family: voxelwise bound vs the gather core
        for amount in (0.4, 0.9):
            kw = dict(patch_size=(10, 16, 16), warp_amount=amount,
                      seed=seed)
            a_sep = DeviceBatchAugmenter(raws, labs, resample="separable",
                                         **kw)
            a_gat = DeviceBatchAugmenter(raws, labs, resample="gather",
                                         **kw)
            d1, t1 = a_sep.getbatch(4, warp=1.0)
            d2, t2 = a_gat.getbatch(4, warp=1.0)
            scale = float(jnp.abs(d2).max())
            worst_raw = max(worst_raw,
                            float(jnp.abs(d1 - d2).max()) / scale)
            worst_lab = min(worst_lab, float((t1 == t2).mean()))
            assert set(np.unique(np.asarray(t1))) <= {0, 1}
    assert worst_raw < 0.1, f"raw deviation {worst_raw:.3f} breaks bound"
    assert worst_lab > 0.9, f"label agreement {worst_lab:.3f} breaks bound"
    # elastic family: the separable core applies a DIFFERENT (equally
    # valid) random deformation by construction (O(|e|·∇e) coordinate
    # deviation — PARITY.md taxonomy), so the contract is distributional:
    # output intensity statistics match the gather core's and the output
    # still differs from an unwarped crop
    for seed in (1,):
        kw = dict(patch_size=(10, 16, 16), warp_amount=0.6,
                  elastic_sigma=1.5, seed=seed)
        d1, _ = DeviceBatchAugmenter(raws, labs, resample="separable",
                                     **kw).getbatch(8, warp=1.0)
        d2, _ = DeviceBatchAugmenter(raws, labs, resample="gather",
                                     **kw).getbatch(8, warp=1.0)
        s = float(jnp.std(d2))
        assert abs(float(jnp.mean(d1)) - float(jnp.mean(d2))) < 0.2 * s
        assert abs(float(jnp.std(d1)) - float(jnp.std(d2))) < 0.2 * s


def test_augmenter_separable_matches_gather_closely(rng):
    from elektronn2_tpu.ops.warp import DeviceBatchAugmenter
    raws = [_smooth(rng, (40, 48, 48))[None]]
    labs = [(_smooth(rng, (40, 48, 48), 4) > 0).astype(np.int16)]
    kw = dict(patch_size=(10, 16, 16), warp_amount=0.8, seed=11)
    a_sep = DeviceBatchAugmenter(raws, labs, resample="separable", **kw)
    a_gat = DeviceBatchAugmenter(raws, labs, resample="gather", **kw)
    d1, t1 = a_sep.getbatch(4, warp=1.0)
    d2, t2 = a_gat.getbatch(4, warp=1.0)
    assert d1.shape == d2.shape and t1.shape == t2.shape
    scale = float(jnp.abs(d2).max())
    assert float(jnp.abs(d1 - d2).max()) < 0.1 * scale
    assert float((t1 == t2).mean()) > 0.9


def test_augmenter_separable_with_elastic(rng):
    """Separable core now applies elastic fields too (scanline passes) —
    'auto' stays gather-free even with elastic on."""
    from elektronn2_tpu.ops.warp import DeviceBatchAugmenter
    raws = [rng.rand(1, 24, 24, 24).astype(np.float32)]
    labs = [np.zeros((24, 24, 24), np.int16)]
    aug = DeviceBatchAugmenter(raws, labs, patch_size=(8, 8, 8),
                               elastic_sigma=2.0, resample="auto")
    assert aug._separable
    d, t = aug.getbatch(2, warp=1.0)
    assert np.isfinite(np.asarray(d)).all()
    with pytest.raises(ValueError):
        DeviceBatchAugmenter(raws, labs, patch_size=(8, 8, 8),
                             resample="bogus")


def test_separable_elastic_exact_on_linear_const(rng):
    """Constant displacement on a linear volume: coordinate-exact."""
    from elektronn2_tpu.ops.warp import (warp_patch, warp_patch_separable,
                                         random_warp_matrices)
    zz, xx, yy = np.meshgrid(np.arange(48.), np.arange(64.),
                             np.arange(64.), indexing="ij")
    lin = jnp.asarray((0.3 * zz + 0.7 * xx - 0.2 * yy + 5
                       ).astype(np.float32)[None])
    pos = jnp.asarray([24.0, 32.0, 32.0])
    patch = (10, 18, 18)
    M = random_warp_matrices(jax.random.PRNGKey(2), 1, amount=0.5)[0]
    e = jnp.ones((3,) + patch) * jnp.asarray([1.3, -0.7, 2.1]
                                             ).reshape(3, 1, 1, 1)
    a = np.asarray(warp_patch(lin, M, pos, patch, elastic=e))
    b = np.asarray(warp_patch_separable(lin, M, pos, patch, elastic=e))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_separable_elastic_applies_deformation(rng):
    """Smooth random field: the separable output must track the gather
    elastic output far better than the undeformed patch (the scanline
    decomposition differs at O(|e|·grad e) but applies the deformation)."""
    from elektronn2_tpu.ops.warp import (warp_patch, warp_patch_separable,
                                         random_warp_matrices,
                                         random_elastic_fields)
    src = jnp.asarray(_smooth(rng, (48, 64, 64))[None])
    pos = jnp.asarray([24.0, 32.0, 32.0])
    patch = (10, 18, 18)
    M = random_warp_matrices(jax.random.PRNGKey(2), 1, amount=0.5)[0]
    f = random_elastic_fields(jax.random.PRNGKey(3), 1, patch,
                              grid=4, sigma=1.5)[0]
    a_el = np.asarray(warp_patch(src, M, pos, patch, elastic=f))
    a_no = np.asarray(warp_patch(src, M, pos, patch))
    b = np.asarray(warp_patch_separable(src, M, pos, patch, elastic=f))
    err_el = np.abs(b - a_el).mean()
    err_no = np.abs(b - a_no).mean()
    assert err_el < 0.35 * err_no, (err_el, err_no)
    # labels: one-hot passes keep exact class values
    lab = jnp.asarray((_smooth(rng, (48, 64, 64), 4) > 0).astype(np.int32))
    _, tg = warp_patch(src, M, pos, patch, target=lab,
                       target_patch_size=(6, 10, 10),
                       target_strides=(1, 2, 2), elastic=f)
    _, ts = warp_patch_separable(src, M, pos, patch, target=lab,
                                 target_patch_size=(6, 10, 10),
                                 target_strides=(1, 2, 2), elastic=f)
    assert set(np.unique(np.asarray(ts))) <= {0, 1}
    assert (np.asarray(tg) == np.asarray(ts)).mean() > 0.85


def test_separable_fold_boundary_and_flips(rng):
    """Hand-built family matrices at the fold boundary (θ=±90°), pure
    flips, and flip+rotation combos — exact on linear fields."""
    from elektronn2_tpu.ops.warp import warp_patch, warp_patch_separable
    zz, xx, yy = np.meshgrid(np.arange(40.), np.arange(48.),
                             np.arange(48.), indexing="ij")
    lin = (0.25 * zz - 0.5 * xx + 0.35 * yy + 2).astype(np.float32)[None]
    src = jnp.asarray(lin)
    pos = jnp.asarray([20.0, 24.0, 24.0])

    def family_matrix(theta, dz=1.0, dx=1.0, dy=1.0, sh=0.0):
        c, s = np.cos(theta), np.sin(theta)
        R = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        Sh = np.eye(3); Sh[1, 2] = sh
        D = np.diag([dz, dx, dy])
        M = np.eye(4); M[:3, :3] = D @ Sh @ R
        return jnp.asarray(M.astype(np.float32))

    cases = [
        family_matrix(np.pi / 2),                      # fold boundary
        family_matrix(-np.pi / 2),
        family_matrix(np.pi * 0.999),                  # near-180°
        family_matrix(0.0, dx=-1.0),                   # pure x flip
        family_matrix(0.0, dy=-1.0, dz=-1.0),          # y+z flips
        family_matrix(2.2, dx=-1.1, dy=0.9, sh=0.2),   # everything at once
        family_matrix(-2.8, dz=1.2, dx=1.2, dy=-0.8, sh=-0.2),
    ]
    for i, M in enumerate(cases):
        a = np.asarray(warp_patch(src, M, pos, (8, 14, 14)))
        b = np.asarray(warp_patch_separable(src, M, pos, (8, 14, 14)))
        assert np.abs(a - b).max() < 2e-3, f"case {i}"


def test_device_unwarped_train_patches_are_exact_flipped_crops(rng):
    """Review r2 s5 fixes, device path: warp=0 TRAIN patches are exact
    voxel crops up to axis flips — integer-aligned positions (no
    interpolation blur) AND flips fire without the warp gate."""
    raws = [rng.rand(1, 24, 24, 24).astype(np.float32)]
    labs = [(raws[0][0] > 0.5).astype(np.int32)]
    aug = DeviceBatchAugmenter(raws, labs, patch_size=(7, 7, 7),
                               target_size=(3, 3, 3), grey_channels=None,
                               resample="gather")
    vol = raws[0][0]
    flipped = identity = 0
    for draw in range(6):
        d, _ = aug.getbatch(batch_size=2, warp=0.0)
        for b in range(2):
            patch = np.asarray(d[b, 0])
            found = None
            for fz in (1, -1):
                for fx in (1, -1):
                    for fy in (1, -1):
                        cand = patch[::fz, ::fx, ::fy]
                        hits = np.argwhere(
                            np.isclose(vol[:18, :18, :18], cand[0, 0, 0],
                                       atol=1e-6))
                        for z, x, y in hits:
                            if np.allclose(vol[z:z + 7, x:x + 7, y:y + 7],
                                           cand, atol=1e-5):
                                found = (fz, fx, fy)
                                break
                        if found:
                            break
                    if found:
                        break
                if found:
                    break
            assert found is not None, "patch not an exact (flipped) crop"
            if found != (1, 1, 1):
                flipped += 1
            else:
                identity += 1
    assert flipped > 0      # flips fire on unwarped draws


def test_device_validation_batches_are_unflipped_exact_crops(rng):
    """source='valid' stays augmentation-free: exact UNflipped crops."""
    raws = [rng.rand(1, 24, 24, 24).astype(np.float32) for _ in range(2)]
    labs = [(r[0] > 0.5).astype(np.int32) for r in raws]
    aug = DeviceBatchAugmenter(raws, labs, patch_size=(7, 7, 7),
                               target_size=(3, 3, 3), grey_channels=[0],
                               valid_cubes=[1], resample="gather")
    d, _ = aug.getbatch(batch_size=4, source="valid")
    vol = raws[1][0]
    for b in range(4):
        patch = np.asarray(d[b, 0])
        hits = np.argwhere(np.isclose(vol[:18, :18, :18], patch[0, 0, 0],
                                      atol=1e-6))
        ok = any(np.allclose(vol[z:z + 7, x:x + 7, y:y + 7], patch,
                             atol=1e-5) for z, x, y in hits)
        assert ok, "validation patch is not an exact unflipped crop"
