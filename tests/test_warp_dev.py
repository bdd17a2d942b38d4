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
