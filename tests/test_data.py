"""Data-layer tests: warp_slice vs scipy oracle, augmentation, batch
creation, KNOSSOS lazy volumes (SURVEY.md §5: warp parity is a hard part)."""

import os

import numpy as np
import pytest

from elektronn2_tpu.data.transformations import (
    warp_slice, warp_coords, WarpingOOBError, make_warp_matrix,
    get_random_warp_params, map_coordinates_linear, map_coordinates_nearest,
    make_elastic_field, rotate_z, identity, chain, scale as scale_mat,
)
from elektronn2_tpu.data.image import (greyAugment, ids2barriers,
                                       smearbarriers, center_cubes)


# ------------------------------------------------------------------- warping

def test_identity_warp_is_center_crop(rng):
    vol = rng.rand(1, 20, 21, 22).astype(np.float32)
    patch = (8, 9, 10)
    out = warp_slice(vol, patch)
    lo = [(s - p) // 2 for s, p in zip(vol.shape[1:], patch)]
    want = vol[:, lo[0]:lo[0] + 8, lo[1]:lo[1] + 9, lo[2]:lo[2] + 10]
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_warp_matches_scipy_map_coordinates(rng):
    from scipy import ndimage
    vol = rng.rand(18, 19, 20).astype(np.float32)
    params = get_random_warp_params(rng, amount=0.5)
    M = make_warp_matrix(**params)
    coords, _ = warp_coords((6, 6, 6), M,
                            position=np.array(vol.shape) / 2.0)
    ours = map_coordinates_linear(vol, coords).reshape(6, 6, 6)
    want = ndimage.map_coordinates(vol, coords, order=1,
                                   mode="nearest").reshape(6, 6, 6)
    np.testing.assert_allclose(ours, want, atol=1e-5)

    ours_n = map_coordinates_nearest(vol, coords).reshape(6, 6, 6)
    want_n = ndimage.map_coordinates(vol, coords, order=0,
                                     mode="nearest").reshape(6, 6, 6)
    assert (ours_n == want_n).mean() > 0.98  # ties at .5 may round differently


def test_native_warp_core_matches_numpy(rng, monkeypatch):
    """The C++ gather core (data/warp_core.cpp — the reference's numba
    inner loops gone native) == the vectorised-numpy oracle, including
    out-of-bounds coordinates (border clamp) and multi-channel sources.
    Skipped if no compiler is available (graceful-degradation policy)."""
    from elektronn2_tpu.data import transformations as T
    try:
        from elektronn2_tpu.data import _warp_native
        _warp_native.get_lib()
    except Exception:
        pytest.skip("no g++ available")
    src = rng.rand(2, 14, 15, 16).astype(np.float32)
    lab = rng.randint(0, 9, size=(1, 14, 15, 16)).astype(np.int32)
    coords = np.concatenate([
        rng.uniform(-3, 18, size=(3, 4000)),            # incl. OOB
        rng.randint(0, 14, size=(3, 50)).astype(np.float64),  # exact ints
    ], axis=1)
    nat_lin = _warp_native.map_linear_f32(src, coords)
    nat_nn = _warp_native.map_nearest_i32(lab, coords)
    # numpy oracle via the public functions with the native path disabled
    monkeypatch.setattr(T, "_NATIVE", None)
    ref_lin = T.map_coordinates_linear(src, coords)
    ref_nn = T.map_coordinates_nearest(lab, coords)
    np.testing.assert_allclose(nat_lin, ref_lin, atol=2e-5)
    np.testing.assert_array_equal(nat_nn, ref_nn)
    # and the public function dispatches to the native core for f32/i32
    monkeypatch.setattr(T, "_NATIVE", "unprobed")
    via_pub = T.map_coordinates_linear(src, coords)
    np.testing.assert_allclose(via_pub, ref_lin, atol=2e-5)


def test_rot90_matches_numpy(rng):
    vol = rng.rand(1, 9, 15, 15).astype(np.float32)
    M = rotate_z(np.pi / 2)
    out = warp_slice(vol, (5, 7, 7), M=M)
    ref = warp_slice(vol, (5, 7, 7))
    # rotation by 90° about z: out(z,x,y) samples ref rotated in (x,y)
    # (direction is a convention; lock it to np.rot90 in the (y,x) sense)
    np.testing.assert_allclose(out[0], np.rot90(ref[0], 1, axes=(2, 1)),
                               atol=1e-4)


def test_oob_raises(rng):
    vol = rng.rand(1, 10, 10, 10).astype(np.float32)
    with pytest.raises(WarpingOOBError):
        warp_slice(vol, (8, 8, 8), position=(1.0, 5.0, 5.0))
    with pytest.raises(WarpingOOBError):
        warp_slice(vol, (12, 4, 4))


def test_warp_with_target_alignment(rng):
    """Identity warp: target grid with stride 1 equals the label centre
    crop; with stride 2 equals the strided crop."""
    vol = rng.rand(1, 16, 16, 16).astype(np.float32)
    lab = rng.randint(0, 5, (16, 16, 16))
    d, t = warp_slice(vol, (10, 10, 10), target=lab,
                      target_patch_size=(4, 4, 4))
    np.testing.assert_array_equal(t, lab[6:10, 6:10, 6:10])

    d, t2 = warp_slice(vol, (10, 10, 10), target=lab,
                       target_patch_size=(4, 4, 4),
                       target_strides=(2, 2, 2))
    # stride-2 grid centred at 7.5 → positions 4.5,6.5,8.5,10.5 → round 4..10
    assert t2.shape == (4, 4, 4)
    np.testing.assert_array_equal(
        t2, lab[4:11:2, 4:11:2, 4:11:2])


def test_warp_target_offset_shifts_grid(rng):
    vol = rng.rand(1, 16, 16, 16).astype(np.float32)
    lab = np.arange(16 ** 3).reshape(16, 16, 16)
    _, t0 = warp_slice(vol, (10, 10, 10), target=lab,
                       target_patch_size=(4, 4, 4))
    _, t1 = warp_slice(vol, (10, 10, 10), target=lab,
                       target_patch_size=(4, 4, 4),
                       target_offset=(1, 0, 0))
    np.testing.assert_array_equal(t1[:-1], t0[1:])


def test_elastic_field_and_warp(rng):
    field = make_elastic_field(rng, (6, 7, 8), grid=3, sigma=2.0)
    assert field.shape == (3, 6, 7, 8)
    vol = rng.rand(1, 30, 30, 30).astype(np.float32)
    out = warp_slice(vol, (6, 7, 8), elastic=field)
    assert out.shape == (1, 6, 7, 8) and np.isfinite(out).all()


def test_lazy_slab_read_only_touches_bbox(rng):
    """warp_slice must only slice the bbox from the backing store."""
    reads = []

    class Spy:
        def __init__(self, a):
            self.a = a
            self.shape = a.shape

        def __getitem__(self, idx):
            reads.append(idx)
            return self.a[idx]

    vol = rng.rand(1, 40, 40, 40).astype(np.float32)
    warp_slice(Spy(vol), (8, 8, 8))
    assert len(reads) == 1
    sl = reads[0][-3:]
    for s, p in zip(sl, (8, 8, 8)):
        assert (s.stop - s.start) <= p + 3  # bbox + interpolation margin


# ---------------------------------------------------------------- image aug

def test_grey_augment_range_and_determinism(rng):
    d = rng.rand(2, 8, 8, 8).astype(np.float32)
    out1 = greyAugment(d.copy(), [0, 1], np.random.RandomState(3))
    out2 = greyAugment(d.copy(), [0, 1], np.random.RandomState(3))
    np.testing.assert_array_equal(out1, out2)
    assert out1.min() >= 0.0 and out1.max() <= 1.0
    assert not np.allclose(out1, d)


def test_ids2barriers():
    ids = np.zeros((1, 5, 5), np.int32)
    ids[0, :, :2] = 1
    ids[0, :, 3:] = 2
    b = ids2barriers(ids, dilute=(0, 0, 0), connectivity=(0, 1, 1))
    assert b[0, 2, 2] == 1            # background voxel is barrier
    assert b[0, 2, 0] == 0            # interior of object 1
    assert b[0, 2, 1] == 1            # touches background
    sm = smearbarriers(b, (1, 3, 3))
    assert 0 <= sm.min() and sm.max() <= 1


def test_center_cubes(rng):
    a = rng.rand(10, 12, 14)
    b = rng.rand(6, 8, 10)
    ca, cb = center_cubes(a, b)
    assert ca.shape == cb.shape == (6, 8, 10)
    np.testing.assert_array_equal(ca, a[2:8, 2:10, 2:12])


# ------------------------------------------------------------- batch creator

def make_dataset(rng, n=2, size=32):
    raws, labs = [], []
    for _ in range(n):
        r = rng.rand(1, size, size, size).astype(np.float32)
        l = (r[0] > 0.5).astype(np.int16)
        raws.append(r)
        labs.append(l)
    return raws, labs


def test_batch_creator_shapes(rng):
    from elektronn2_tpu.data import BatchCreatorImage
    raws, labs = make_dataset(rng)
    bc = BatchCreatorImage(input_data=raws, target_data=labs,
                           valid_cubes=[1])
    bc.set_geometry((12, 12, 12), (6, 6, 6))
    d, t = bc.getbatch(batch_size=3, warp=False)
    assert d.shape == (3, 1, 12, 12, 12)
    assert t.shape == (3, 6, 6, 6) and t.dtype == np.int32
    d, t = bc.getbatch(batch_size=2, warp=True,
                       grey_augment_channels=[0])
    assert d.shape == (2, 1, 12, 12, 12) and np.isfinite(d).all()


def test_batch_creator_identity_warp_consistency(rng):
    """With warp off, the target must be the centre crop of the labels at
    the image patch position (alignment contract with valid-mode convs)."""
    from elektronn2_tpu.data import BatchCreatorImage
    raws, labs = make_dataset(rng, n=1)
    labs = [np.arange(32 ** 3).reshape(32, 32, 32).astype(np.int32)]
    raws = [raws[0]]
    bc = BatchCreatorImage(input_data=raws, target_data=labs)
    bc.set_geometry((9, 9, 9), (3, 3, 3))
    d, t = bc.getbatch(batch_size=1, warp=False, flip=False)
    # locate the patch in the raw volume by matching
    from scipy.signal import fftconvolve  # noqa: F401 (cheap presence check)
    # target must equal labels at the centre of wherever the patch came from
    # find patch origin by matching the first voxel row
    patch = d[0, 0]
    vol = raws[0][0]
    found = False
    for z in range(32 - 9 + 1):
        for x in range(32 - 9 + 1):
            for y in range(32 - 9 + 1):
                if abs(vol[z, x, y] - patch[0, 0, 0]) < 1e-6 \
                        and np.allclose(vol[z:z + 9, x:x + 9, y:y + 9],
                                        patch, atol=1e-5):
                    want = labs[0][z + 3:z + 6, x + 3:x + 6, y + 3:y + 6]
                    np.testing.assert_array_equal(t[0], want)
                    found = True
                    break
            if found:
                break
        if found:
            break
    assert found


def test_batch_creator_linked_model_geometry(rng):
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.data import BatchCreatorImage
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 11, 11, 11], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 1, name="c1")
    cls = nm.Conv(c1, 2, 1, 1, activation_func="lin", name="cls")
    probs = nm.Softmax(cls)
    tgt = nm.Input([1, *probs.shape.spatial_shape], "b,z,x,y",
                   dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    model = nm.model_manager.getmodel()
    model.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs)
    raws, labs = make_dataset(rng)
    bc = BatchCreatorImage(input_data=raws, target_data=labs)
    bc.link_model_geometry(model)
    assert bc.patch_size == [11, 11, 11]
    assert bc.target_size == [9, 9, 9]
    d, t = bc.getbatch(batch_size=2, warp=0.5)
    model.set_opt("Adam", lr=1e-3)
    l0, _ = model.trainingstep(d[:1], t[:1])
    assert np.isfinite(float(l0))


def test_batch_creator_mfp_fragment_targets(rng):
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.data import BatchCreatorImage
    nm.model_manager.reset()
    inp = nm.Input([1, 1, 1, 13, 13], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 4, (1, 3, 3), (1, 2, 2), mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([probs.shape["b"], *probs.shape.spatial_shape],
                   "b,z,x,y", dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    model = nm.model_manager.getmodel()
    model.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs)
    raws, labs = make_dataset(rng)
    bc = BatchCreatorImage(input_data=raws, target_data=labs)
    bc.link_model_geometry(model)
    d, t = bc.getbatch(batch_size=2, warp=False)
    assert d.shape == (2, 1, 1, 13, 13)
    assert t.shape == (8, 1, 5, 5)  # 4 fragments × 2 samples, fragment-major
    l0, _ = model.trainingstep(d, t)
    assert np.isfinite(float(l0))


# ----------------------------------------------------------------- KNOSSOS

def write_knossos(tmp_path, vol, cube_edge=8, exp="testds"):
    """vol: (z, x, y) uint8; writes KNOSSOS layout (x-fastest in cube)."""
    e = cube_edge
    Z, X, Y = vol.shape
    root = tmp_path / exp / "mag1"
    for cz in range(-(-Z // e)):
        for cx in range(-(-X // e)):
            for cy in range(-(-Y // e)):
                cube = np.zeros((e, e, e), np.uint8)
                z1 = min(Z, (cz + 1) * e)
                x1 = min(X, (cx + 1) * e)
                y1 = min(Y, (cy + 1) * e)
                part = vol[cz * e:z1, cx * e:x1, cy * e:y1]
                cube[:part.shape[0], :part.shape[1], :part.shape[2]] = part
                d = root / f"x{cx:04d}" / f"y{cy:04d}" / f"z{cz:04d}"
                os.makedirs(d, exist_ok=True)
                # stored (z, y, x)
                cube.transpose(0, 2, 1).tofile(
                    str(d / f"{exp}_mag1_x{cx:04d}_y{cy:04d}_z{cz:04d}.raw"))
    (tmp_path / exp / "knossos.conf").write_text(
        f'experiment name "{exp}";\nboundary x {X};\nboundary y {Y};\n'
        f'boundary z {Z};\nedge length {e};\nmagnification 1;\n')
    return str(tmp_path / exp)


def test_knossos_array_roundtrip(rng, tmp_path):
    from elektronn2_tpu.data import KnossosArray
    vol = (rng.rand(24, 16, 24) * 255).astype(np.uint8)
    path = write_knossos(tmp_path, vol)
    ka = KnossosArray(path, n_preload=2, cube_edge=8)
    assert ka.shape == (24, 16, 24)
    np.testing.assert_array_equal(ka[:, :, :], vol)
    np.testing.assert_array_equal(ka[3:19, 2:14, 5:21], vol[3:19, 2:14, 5:21])
    np.testing.assert_array_equal(ka[5], vol[5])
    ka.preload([(0, 0, 0), (1, 1, 1)])


def test_knossos_missing_cube_is_zeros(rng, tmp_path):
    from elektronn2_tpu.data import KnossosArray
    vol = (rng.rand(8, 8, 8) * 255).astype(np.uint8)
    path = write_knossos(tmp_path, vol)
    ka = KnossosArray(path, cube_edge=8)
    ka.shape = (16, 8, 8)  # pretend a second z-cube exists (it doesn't)
    out = ka[8:16, :, :]
    np.testing.assert_array_equal(out, 0)


def test_knossos_native_matches_numpy(rng, tmp_path):
    """The C++ cube core is value-identical to the numpy path, including
    the missing-cube zero fill (the numpy path is the oracle)."""
    pytest.importorskip("elektronn2_tpu.data._knossos_native")
    from elektronn2_tpu.data import KnossosArray
    from elektronn2_tpu.data import _knossos_native
    try:
        _knossos_native.get_lib()
    except Exception:
        pytest.skip("no compiler for the native KNOSSOS core")
    vol = (rng.rand(24, 16, 24) * 255).astype(np.uint8)
    path = write_knossos(tmp_path, vol)
    ka_py = KnossosArray(path, cube_edge=8, native=False)
    ka_nat = KnossosArray(path, cube_edge=8, native=True)
    # pretend an extra z-cube exists -> exercises missing-cube zero fill
    for ka in (ka_py, ka_nat):
        ka.shape = (32, 16, 24)
    for sl in [np.s_[:, :, :], np.s_[3:19, 2:14, 5:21], np.s_[5],
               np.s_[20:30, :, :]]:
        np.testing.assert_array_equal(ka_nat[sl], ka_py[sl])


def test_knossos_native_direct_assembly(rng, tmp_path):
    """Reads larger than the cube cache stream through the C++ direct
    assembler (no caching) — value-identical to the numpy path, including
    unaligned bounds and missing-cube zero fill."""
    from elektronn2_tpu.data import _knossos_native
    try:
        _knossos_native.get_lib()
    except Exception:
        pytest.skip("no compiler for the native KNOSSOS core")
    from elektronn2_tpu.data import KnossosArray
    vol = (rng.rand(24, 16, 24) * 255).astype(np.uint8)
    path = write_knossos(tmp_path, vol)
    ka_py = KnossosArray(path, cube_edge=8, native=False)
    # max_ram=0 -> _max_cubes floor of 8; 3x2x3=18 cubes + the extra
    # missing z-layer exceed it, forcing the direct path for big reads
    ka_nat = KnossosArray(path, cube_edge=8, native=True, max_ram=0)
    assert ka_nat._max_cubes < 18
    for ka in (ka_py, ka_nat):
        ka.shape = (32, 16, 24)
    for sl in [np.s_[:, :, :], np.s_[1:31, 3:15, 2:23]]:
        np.testing.assert_array_equal(ka_nat[sl], ka_py[sl])
    assert len(ka_nat._cache) == 0    # streamed, not cached


def test_knossos_native_u16_f32(rng, tmp_path):
    from elektronn2_tpu.data import _knossos_native
    try:
        _knossos_native.get_lib()
    except Exception:
        pytest.skip("no compiler for the native KNOSSOS core")
    e = 8
    for dtype in (np.uint16, np.float32):
        cube = (rng.rand(e, e, e) * 100).astype(dtype)   # (z, x, y)
        p = tmp_path / f"cube_{np.dtype(dtype).name}.raw"
        cube.transpose(0, 2, 1).tofile(str(p))           # stored (z, y, x)
        out = _knossos_native.load_cubes([str(p)], e, dtype)[0]
        np.testing.assert_array_equal(out, cube)


def test_knossos_native_size_mismatch_raises(rng, tmp_path):
    from elektronn2_tpu.data import _knossos_native
    try:
        _knossos_native.get_lib()
    except Exception:
        pytest.skip("no compiler for the native KNOSSOS core")
    p = tmp_path / "bad.raw"
    p.write_bytes(b"\x00" * (8 ** 3 - 1))   # one byte short
    with pytest.raises(IOError, match="size mismatch"):
        _knossos_native.load_cubes([str(p)], 8, np.uint8)
    p.write_bytes(b"\x00" * (8 ** 3 + 1))   # one byte long
    with pytest.raises(IOError, match="size mismatch"):
        _knossos_native.load_cubes([str(p)], 8, np.uint8)


def test_knossos_native_unsupported_dtype_falls_back(rng, tmp_path):
    """auto mode silently uses numpy for dtypes the core doesn't cover;
    native=True raises a clear error."""
    from elektronn2_tpu.data import KnossosArray
    vol = (rng.rand(8, 8, 8) * 255).astype(np.int64)
    path = write_knossos(tmp_path, vol.astype(np.uint8))
    # rewrite the one cube as int64 so the numpy path reads it back
    cube_p = os.path.join(path, "mag1", "x0000", "y0000", "z0000",
                          "testds_mag1_x0000_y0000_z0000.raw")
    vol.transpose(0, 2, 1).tofile(cube_p)
    ka = KnossosArray(path, cube_edge=8, dtype=np.int64)
    np.testing.assert_array_equal(ka[:, :, :], vol)
    with pytest.raises(TypeError, match="does not support dtype"):
        KnossosArray(path, cube_edge=8, dtype=np.int64,
                     native=True)[:, :, :]


def test_knossos_backed_warp(rng, tmp_path):
    """warp_slice over a KnossosArrayMulti: lazy cube reads end-to-end."""
    from elektronn2_tpu.data import KnossosArray
    vol = (rng.rand(24, 24, 24) * 255).astype(np.uint8)
    path = write_knossos(tmp_path, vol)
    ka = KnossosArray(path, cube_edge=8)

    class FWrap:  # (f, z, x, y) facade
        def __init__(self, a):
            self.a = a
            self.shape = (1,) + a.shape
            self.ndim = 4

        def __getitem__(self, idx):
            return np.asarray(self.a[idx[-3:]], np.float32)[None] / 255.0

    out = warp_slice(FWrap(ka), (8, 8, 8))
    want = warp_slice(vol[None].astype(np.float32) / 255.0, (8, 8, 8))
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_griddata_rasterizes_points(rng):
    from elektronn2_tpu.data import GridData
    raws = [rng.rand(1, 24, 24, 24).astype(np.float32)]
    labs = [np.zeros((24, 24, 24), np.int16)]
    gd = GridData(input_data=raws, target_data=labs,
                  grid_points=[np.array([[12, 12, 12], [5, 5, 5]])],
                  point_radius=2)
    gd.set_geometry((9, 9, 9), (9, 9, 9))
    assert gd.train_l[0][12, 12, 12] == 1
    assert gd.train_l[0][0, 0, 0] == 0
    d, t = gd.getbatch(2, warp=False)
    assert d.shape == (2, 1, 9, 9, 9) and t.shape == (2, 9, 9, 9)


def test_batch_creator_2d_images(rng):
    """2D image-to-image training through the same pipeline (reference
    supported 2D nets; promoted internally to singleton-z 3D)."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.data import BatchCreatorImage
    nm.model_manager.reset()
    inp = nm.Input([2, 1, 20, 20], "b,f,x,y", name="raw")
    c1 = nm.Conv(inp, 4, 3, 1, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([2, *probs.shape.spatial_shape], "b,x,y",
                   dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    model = nm.model_manager.getmodel()
    model.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs)
    imgs = [rng.rand(48, 48).astype(np.float32) for _ in range(2)]
    labs = [(im > 0.5).astype(np.int16) for im in imgs]
    bc = BatchCreatorImage(input_data=imgs, target_data=labs)
    bc.link_model_geometry(model)
    d, t = bc.getbatch(batch_size=2, warp=False)
    assert d.shape == (2, 1, 20, 20)
    assert t.shape == (2, 18, 18)
    d2, t2 = bc.getbatch(batch_size=2, warp=True)  # in-plane warps only
    assert d2.shape == (2, 1, 20, 20) and np.isfinite(d2).all()
    model.set_opt("Adam", lr=1e-3)
    l, _ = model.trainingstep(d, t)
    assert np.isfinite(float(l))


def test_mfp_fragment_target_alignment(rng):
    """Load-bearing MFP-training contract: fragment k's target equals the
    labels at (patch_start + base_offset + frag_offset + j*stride) — i.e.
    the voxels fragment k's outputs actually predict."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.data import BatchCreatorImage
    nm.model_manager.reset()
    # conv3 + mfp-pool2 in x/y: fov 4 (even), offsets {0,1}^2, stride 2
    inp = nm.Input([1, 1, 1, 13, 13], "b,f,z,x,y", name="raw")
    c1 = nm.Conv(inp, 2, (1, 3, 3), (1, 2, 2), mfp=True, name="c1")
    probs = nm.Softmax(nm.Conv(c1, 2, 1, 1, activation_func="lin"))
    tgt = nm.Input([probs.shape["b"], *probs.shape.spatial_shape],
                   "b,z,x,y", dtype="int32", name="target")
    loss = nm.AggregateLoss(nm.MultinoulliNLL(probs, tgt,
                                              target_is_sparse=True))
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                      prediction_node=probs)

    size = 32
    raw = rng.rand(1, 1, size, size).astype(np.float32)
    lab = np.arange(size * size).reshape(1, size, size).astype(np.int32)
    bc = BatchCreatorImage(input_data=[raw], target_data=[lab])
    bc.link_model_geometry(m)
    d, t = bc.getbatch(1, warp=False, flip=False)
    assert t.shape == (4, 1, 5, 5)   # 4 fragments × b=1

    # locate the (1,13,13) patch in the raw volume
    found = None
    for x0 in range(size - 13 + 1):
        for y0 in range(size - 13 + 1):
            if np.allclose(raw[0, 0, x0:x0 + 13, y0:y0 + 13], d[0, 0, 0],
                           atol=1e-6):
                found = (x0, y0)
                break
        if found:
            break
    assert found is not None
    x0, y0 = found

    frag_offsets = m.prediction_node.shape.mfp_offsets   # (4, 3)
    strides = m.prediction_node.shape.strides            # (1, 2, 2)
    # patch centre-aligned target grid: t[k, 0, i, j] should equal
    # lab[x0 + cx + off_x + i*sx, y0 + cy + off_y + j*sy] where (cx, cy)
    # centre the 5-point stride-2 grid in the 13-wide patch: (13-1)/2 - 2*2
    c = (13 - 1) // 2 - 2 * 2
    for k, off in enumerate(frag_offsets):
        want = lab[0,
                   x0 + c + off[1]:x0 + c + off[1] + 10:2,
                   y0 + c + off[2]:y0 + c + off[2] + 10:2]
        np.testing.assert_array_equal(t[k, 0], want)


def test_compute_class_weights(rng):
    from elektronn2_tpu.data import BatchCreatorImage
    raws = [rng.rand(1, 16, 16, 16).astype(np.float32)]
    lab = np.zeros((16, 16, 16), np.int16)
    lab[:2] = 1                      # rare class
    bc = BatchCreatorImage(input_data=raws, target_data=[lab])
    w = bc.compute_class_weights()
    assert w.shape == (2,)
    assert w[1] > w[0]               # rare class upweighted
    np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-5)


def test_save_knossos_roundtrip(rng, tmp_path):
    from elektronn2_tpu.data import KnossosArray
    from elektronn2_tpu.data.knossos_array import save_knossos
    vol = (rng.rand(10, 20, 12) * 255).astype(np.uint8)
    path = str(tmp_path / "outds")
    save_knossos(vol, path, exp_name="outds", cube_edge=8)
    ka = KnossosArray(path, cube_edge=8)
    assert ka.shape == (10, 20, 12)
    np.testing.assert_array_equal(ka[:, :, :], vol)


def test_flip_applies_without_warp(rng):
    """flip=True acts on UNWARPED draws (it was silently inert when the
    warp gate didn't fire): patches are exact axis-reversed voxel crops,
    and targets follow the same flip."""
    from elektronn2_tpu.data import BatchCreatorImage
    size = 32
    raw = rng.rand(1, size, size, size).astype(np.float32)
    lab = (raw[0] > 0.5).astype(np.int16)
    bc = BatchCreatorImage(input_data=[raw], target_data=[lab])
    bc.set_geometry((9, 9, 9), (3, 3, 3))
    flipped_seen = exact_crop = 0
    for _ in range(12):
        d, t = bc.getbatch(batch_size=1, warp=False, flip=True)
        patch = d[0, 0]
        found = None
        vol = raw[0]
        for fz in (1, -1):
            for fx in (1, -1):
                for fy in (1, -1):
                    cand = patch[::fz, ::fx, ::fy]
                    # locate cand as an exact crop
                    corr = (vol[:size - 8, :size - 8, :size - 8]
                            == cand[0, 0, 0])
                    for z, x, y in np.argwhere(corr):
                        if np.array_equal(
                                vol[z:z + 9, x:x + 9, y:y + 9], cand):
                            found = (fz, fx, fy, z, x, y)
                            break
                    if found:
                        break
                if found:
                    break
            if found:
                break
        assert found is not None, "patch is not an exact (flipped) crop"
        fz, fx, fy, z, x, y = found
        if (fz, fx, fy) != (1, 1, 1):
            flipped_seen += 1
        else:
            exact_crop += 1
        # target matches the same flip of the label crop
        want = lab[z + 3:z + 6, x + 3:x + 6, y + 3:y + 6][
            ::fz, ::fx, ::fy]
        np.testing.assert_array_equal(t[0], want)
    assert flipped_seen > 0            # flips actually fire without warp


def test_knossos_negative_and_oob_int_index(tmp_path, rng):
    """Negative integer indices normalise like ndarray (they used to read
    the missing-cube zeros fallback silently); out-of-range ints raise."""
    from elektronn2_tpu.data import KnossosArray
    vol = (rng.rand(16, 16, 16) * 255).astype(np.uint8)
    ka = KnossosArray(write_knossos(tmp_path, vol, cube_edge=8))
    np.testing.assert_array_equal(np.asarray(ka[-1]),
                                  np.asarray(ka[15]))
    np.testing.assert_array_equal(np.asarray(ka[2, -3, 1:5]),
                                  np.asarray(ka[2, 13, 1:5]))
    with pytest.raises(IndexError):
        ka[16]
    with pytest.raises(IndexError):
        ka[-17]


def test_knossos_shape_inference_ignores_stray_files(tmp_path, rng):
    """Directory-structure shape inference (conf without boundary lines)
    skips stray files (.DS_Store, the conf itself) instead of crashing."""
    from elektronn2_tpu.data import KnossosArray
    vol = (rng.rand(16, 16, 16) * 255).astype(np.uint8)
    root = write_knossos(tmp_path, vol, cube_edge=8)
    (tmp_path / "testds" / "knossos.conf").write_text(
        'experiment name "testds";\nedge length 8;\nmagnification 1;\n')
    (tmp_path / "testds" / "mag1" / ".DS_Store").write_text("junk")
    (tmp_path / "testds" / "mag1" / "x0000" / "stray.txt").write_text("x")
    ka = KnossosArray(root)
    assert ka.shape == (16, 16, 16)
    np.testing.assert_array_equal(np.asarray(ka[:, :, :]), vol)


def test_griddata_does_not_mutate_caller_labels(rng):
    """GridData rasterises point labels into COPIES — the caller's arrays
    stay pristine, and a second GridData over the same arrays derives the
    same point label id."""
    from elektronn2_tpu.data import GridData
    raw = rng.rand(1, 24, 24, 24).astype(np.float32)
    lab = (raw[0] > 0.5).astype(np.int16)
    lab_before = lab.copy()
    pts = [np.array([[12.0, 12.0, 12.0]])]
    gd = GridData(input_data=[raw], target_data=[lab], grid_points=pts,
                  point_radius=2)
    np.testing.assert_array_equal(lab, lab_before)     # caller untouched
    gd2 = GridData(input_data=[raw], target_data=[lab], grid_points=pts,
                   point_radius=2)
    # both instances rasterised the SAME new label id (max+1 == 2)
    assert max(int(c.max()) for c in gd._all_labels) == 2
    assert max(int(c.max()) for c in gd2._all_labels) == 2


def test_agentdata_skeleton_cube_pairing(rng):
    """Skeletons pair with the cube they annotate: ambiguous counts raise;
    explicit skeleton_cube indexes the right volume."""
    from elektronn2_tpu.data.cnndata import AgentData
    from elektronn2_tpu.data.skeleton import SkeletonMFK
    vols = [rng.rand(1, 32, 32, 32).astype(np.float32) for _ in range(3)]
    labs = [(v[0] > 0.5).astype(np.int16) for v in vols]
    ad = AgentData(input_data=vols, target_data=labs)
    ad.set_geometry((7, 7, 7))
    t = np.linspace(0, 2 * np.pi, 20)
    pos = np.stack([16 + 6 * np.cos(t), 16 + 6 * np.sin(t),
                    np.linspace(10, 22, 20)], 1)
    ad.skeletons = [SkeletonMFK(pos, [(i, i + 1) for i in range(19)])]
    with pytest.raises(ValueError, match="skeleton_cube"):
        ad.get_tracing_batch(batch_size=1, n_steps=2)
    ad.skeleton_cube = [2]
    d, tg = ad.get_tracing_batch(batch_size=1, n_steps=2)
    assert d.shape[:2] == (2, 1) and np.isfinite(tg).all()
    ad.skeleton_cube = [7]          # nonexistent cube: nothing eligible
    with pytest.raises(ValueError, match="no skeletons annotate"):
        ad.get_tracing_batch(batch_size=1, n_steps=2)


def test_agentdata_skeleton_cube_respects_split(rng):
    """skeleton_cube uses ORIGINAL cube indices and each source draws
    only skeletons annotating its own cubes — a valid batch must never
    cut patches at train-skeleton coordinates (review r2 s6)."""
    from elektronn2_tpu.data.cnndata import AgentData
    from elektronn2_tpu.data.skeleton import SkeletonMFK
    vols = [rng.rand(1, 32, 32, 32).astype(np.float32) for _ in range(2)]
    labs = [(v[0] > 0.5).astype(np.int16) for v in vols]
    ad = AgentData(input_data=vols, target_data=labs, valid_cubes=[1])
    ad.set_geometry((7, 7, 7))
    t = np.linspace(0, 2 * np.pi, 20)
    helix = np.stack([16 + 6 * np.cos(t), 16 + 6 * np.sin(t),
                      np.linspace(10, 22, 20)], 1)
    e = [(i, i + 1) for i in range(19)]
    ad.skeletons = [SkeletonMFK(helix, e), SkeletonMFK(helix + 1.0, e)]
    ad.skeleton_cube = [0, 1]          # s0 on train cube, s1 on valid cube
    d, tg = ad.get_tracing_batch(batch_size=2, n_steps=2)          # train
    assert np.isfinite(d).all()
    dv, _ = ad.get_tracing_batch(batch_size=2, n_steps=2,
                                 source="valid")                   # valid
    assert np.isfinite(dv).all()
    # all skeletons on the train cube: a valid draw has nothing eligible
    ad.skeleton_cube = [0, 0]
    with pytest.raises(ValueError, match="no skeletons annotate"):
        ad.get_tracing_batch(batch_size=1, n_steps=2, source="valid")
