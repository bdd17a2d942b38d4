"""Unit tests for the shape oracles: TaggedShape and cnncalculator.

These two are executable specs for conv/pool/MFP geometry (SURVEY.md §5) —
everything downstream (node shape propagation, MFP stitching, halo sizing)
is cross-checked against them.
"""

import numpy as np
import pytest

from elektronn2_tpu.neuromancer.graphutils import TaggedShape
from elektronn2_tpu.utils.cnncalculator import (
    cnncalculator, get_valid_patch_sizes, get_cloesest_valid_patch_size,
    get_closest_valid_patch_size,
)


# ---------------------------------------------------------------- TaggedShape

def test_tagged_shape_basics():
    ts = TaggedShape((1, 3, 23, 183, 183), "b,f,z,x,y")
    assert ts["b"] == 1 and ts["f"] == 3 and ts["z"] == 23
    assert ts.spatial_axes == (2, 3, 4)
    assert ts.spatial_shape == (23, 183, 183)
    assert ts.spatial_size == 23 * 183 * 183
    assert ts.strides == (1, 1, 1)
    assert ts.fov == (1, 1, 1)
    assert ts.n_frag == 1
    assert len(ts) == 5
    assert tuple(ts) == (1, 3, 23, 183, 183)
    assert ts == (1, 3, 23, 183, 183)


def test_tagged_shape_validation():
    with pytest.raises(ValueError):
        TaggedShape((1, 2), "b,f,z")           # length mismatch
    with pytest.raises(ValueError):
        TaggedShape((1, 2), ("b", "b"))        # duplicate tag
    with pytest.raises(ValueError):
        TaggedShape((1, 2), ("b", "q"))        # unknown tag
    with pytest.raises(KeyError):
        TaggedShape((1, 2), "b,f").tag2index("z")


def test_tagged_shape_updates():
    ts = TaggedShape((1, 3, 16, 16), "b,f,x,y", strides=(2, 2), fov=(5, 5))
    ts2 = ts.updateshape("x", 8)
    assert ts2["x"] == 8 and ts["x"] == 16          # original untouched
    assert ts2.strides == (2, 2) and ts2.fov == (5, 5)
    assert ts.offsets == (2, 2)


def test_tagged_shape_axis_insert_delete():
    ts = TaggedShape((1, 3, 16, 16), "b,f,x,y", strides=(2, 4), fov=(5, 9))
    ts3 = ts.addaxis(2, 10, "z")
    assert ts3.tags == ("b", "f", "z", "x", "y")
    assert ts3.strides == (1, 2, 4) and ts3.fov == (1, 5, 9)
    ts4 = ts3.delaxis("z")
    assert ts4.tags == ts.tags and ts4.strides == ts.strides
    ts5 = ts.delaxis(-1)
    assert ts5.tags == ("b", "f", "x") and ts5.strides == (2,)


def test_tagged_shape_roundtrip_dict():
    ts = TaggedShape((2, 4, 9, 9), "b,f,x,y", strides=(2, 2), fov=(7, 7),
                     mfp_offsets=[[0, 0], [0, 1], [1, 0], [1, 1]])
    ts2 = TaggedShape.from_dict(ts.to_dict())
    assert ts2.shape == ts.shape and ts2.tags == ts.tags
    assert ts2.strides == ts.strides and ts2.fov == ts.fov
    assert np.array_equal(ts2.mfp_offsets, ts.mfp_offsets)
    assert ts2.n_frag == 4
    assert ts2.fov_all_offsets == (8, 8)


# ------------------------------------------------------------- cnncalculator

def brute_force_fov(filters, poolings, mfp=False):
    """Independent fov oracle: perturb one input voxel, see which outputs move.

    Runs a literal numpy valid-conv/pool stack twice and measures the input
    extent influencing the centre output voxel.
    """
    def run(x):
        for f, p in zip(filters, poolings):
            # valid "conv": windowed sum
            x = np.array([x[i:i + f].sum() for i in range(len(x) - f + 1)])
            if p > 1:
                n = (len(x) // p) * p
                x = x[:n].reshape(-1, p).max(1)
        return x

    # find a big-enough valid input
    calc = cnncalculator(filters, poolings, desired_patch_size=80, mfp=False)
    n = calc.input
    base = np.zeros(n)
    out0 = run(base)
    touched = []
    for i in range(n):
        x = base.copy()
        x[i] = 1.0
        if run(x)[len(out0) // 2] != out0[len(out0) // 2]:
            touched.append(i)
    return touched[-1] - touched[0] + 1


@pytest.mark.parametrize("filters,poolings", [
    ([3], [1]),
    ([3, 3], [2, 1]),
    ([5, 3, 3], [2, 2, 1]),
    ([3, 3, 3, 3], [2, 1, 2, 1]),
])
def test_fov_matches_brute_force(filters, poolings):
    calc = cnncalculator(filters, poolings, desired_patch_size=60)
    assert calc.fov == brute_force_fov(filters, poolings)


def test_valid_sizes_plain_pooling():
    # conv3 -> pool2: i-2 must be even and >= 2
    valids = get_valid_patch_sizes([3], [2], desired_patch_size=20)
    assert all((v - 2) % 2 == 0 and v - 2 >= 2 for v in valids)
    assert 4 in valids and 5 not in valids


def test_valid_sizes_mfp_pooling():
    # MFP: o=i-2 needs (o+1)%2==0 -> i odd
    valids = get_valid_patch_sizes([3], [2], desired_patch_size=20, mfp=True)
    assert all(v % 2 == 1 for v in valids)


def test_mfp_output_and_frag_count():
    calc = cnncalculator([3, 3], [2, 2], desired_patch_size=21, mfp=True,
                         ndim=1)
    # i=21: conv->19, mfp-pool2 -> (19+1)/2-1 = 9; conv->7, mfp-pool2 -> 3
    assert calc.input == 21 and calc.output == 3
    assert calc.n_frag == 4
    assert calc.pred_stride == 1          # all pools MFP'd: dense output
    assert calc.stride == 4               # per-fragment stride


def test_strides_and_offset():
    calc = cnncalculator([5, 3], [2, 2], desired_patch_size=40)
    assert calc.stride == 4
    assert calc.pred_stride == 4
    # fov: 1 +(5-1)*1 +(2-1)*1 [pool] +(3-1)*2 +(2-1)*2 [pool] = 12
    assert calc.fov == 12
    assert calc.offset == 5.5  # even fov → half-voxel centre


def test_multidim_anisotropic():
    calc = cnncalculator([[1, 3, 3], [3, 3, 3]], [[1, 2, 2], [1, 2, 2]],
                         desired_patch_size=[10, 40, 40], ndim=3)
    assert len(calc.input) == 3
    assert calc.fov[0] == 3            # z: two convs 1 and 3, no pooling
    assert calc.fov[1] == calc.fov[2]  # x/y symmetric
    assert calc.stride[0] == 1 and calc.stride[1] == 4


def test_closest_valid_patch_size_and_alias():
    v = get_cloesest_valid_patch_size([3], [2], desired_patch_size=21)
    assert (v - 2) % 2 == 0
    assert abs(v - 21) <= 1
    assert get_closest_valid_patch_size([3], [2], 21) == v


def test_desired_output():
    calc = cnncalculator([3], [2], desired_output=10, ndim=1)
    assert calc.output >= 10


def test_forward_consistency_with_output():
    calc = cnncalculator([5, 3, 3], [2, 2, 1], desired_patch_size=50)
    # output must equal manual simulation
    i = calc.input
    o = i - 5 + 1
    o //= 2
    o = o - 3 + 1
    o //= 2
    o = o - 3 + 1
    assert calc.output == o


def test_calculator_vs_runtime_shapes_fuzz():
    """Property sweep: for random conv/pool stacks, cnncalculator's
    input/output/pred_stride/fov must agree with both the TaggedShape
    metadata AND the actual runtime array shapes (the three geometry
    systems can never drift apart)."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.neuromancer import model_manager

    for trial in range(8):
        rng = np.random.RandomState(500 + trial)
        n_layers = rng.randint(1, 4)
        filters = [int(rng.choice([1, 3, 5])) for _ in range(n_layers)]
        pools = [int(rng.choice([1, 2])) for _ in range(n_layers)]
        mfp = bool(rng.rand() < 0.5) and any(p > 1 for p in pools)
        calc = cnncalculator(filters, pools,
                             desired_patch_size=int(rng.randint(18, 40)),
                             mfp=mfp, ndim=1)
        n = int(calc.input)

        model_manager.reset(seed=600 + trial)
        inp = nm.Input([1, 1, n, n], "b,f,x,y", name="raw")
        h = inp
        for i, (f, p) in enumerate(zip(filters, pools)):
            h = nm.Conv(h, 3, f, p, mfp=mfp, name=f"c{i}")
        m = model_manager.getmodel()
        m.designate_nodes(input_node=inp, prediction_node=h)

        # TaggedShape vs calculator. NOTE the domains: TaggedShape tracks
        # the PRE-stitch fragment grid; the calculator reports the
        # post-stitch EFFECTIVE stride — they relate through the fragment
        # offsets (_dense_geometry), which is the invariant asserted here.
        from elektronn2_tpu.neuromancer.inference import _dense_geometry
        assert h.shape.spatial_shape[0] == int(calc.output), \
            f"trial {trial}: tagged {h.shape.spatial_shape} calc {calc.output}"
        g, n_off, _ = _dense_geometry(h.shape)
        assert g[0] == int(calc.pred_stride), \
            f"trial {trial}: effective stride {g[0]} calc {calc.pred_stride}"
        assert h.shape.fov[0] == int(calc.fov), trial

        # runtime vs TaggedShape
        x = rng.rand(1, 1, n, n).astype(np.float32)
        out = np.asarray(m.predict(x))
        assert out.shape == tuple(h.shape), \
            f"trial {trial}: runtime {out.shape} tagged {tuple(h.shape)}"


def test_warp_host_device_parity_fuzz():
    """Property sweep: host warp_slice == device warp_patch (gather) ==
    device warp_patch_separable for random affine draws."""
    import jax.numpy as jnp
    from elektronn2_tpu.data.transformations import (warp_slice,
                                                     WarpingOOBError)
    from elektronn2_tpu.ops.warp import warp_patch, warp_patch_separable

    from scipy import ndimage
    checked = 0
    for trial in range(12):
        rng = np.random.RandomState(700 + trial)
        # smooth EM-like content: the separable core's closeness claim is
        # for band-limited volumes (white noise is the pathological case;
        # the GATHER check below stays exact on it regardless)
        vol = ndimage.gaussian_filter(
            rng.rand(36, 36, 36), 1.2).astype(np.float32)[None]
        ps = (9, 11, 11)
        # random small affine: rotation about z + anisotropic scale
        ang = rng.uniform(-0.4, 0.4)
        sc = rng.uniform(0.85, 1.15, size=3)
        M = np.eye(4)
        M[1, 1], M[2, 2] = np.cos(ang) * sc[1], np.cos(ang) * sc[2]
        M[1, 2], M[2, 1] = -np.sin(ang), np.sin(ang)
        M[0, 0] = sc[0]
        pos = rng.uniform(14, 22, size=3)
        try:
            host = warp_slice(vol, ps, M=M, position=pos)
        except WarpingOOBError:
            continue
        dev_g = np.asarray(warp_patch(jnp.asarray(vol), jnp.asarray(M),
                                      jnp.asarray(pos), ps))
        np.testing.assert_allclose(dev_g, host, atol=1e-5,
                                   err_msg=f"gather trial {trial}")
        dev_s = np.asarray(warp_patch_separable(
            jnp.asarray(vol), jnp.asarray(M), jnp.asarray(pos), ps,
            amount_bound=1.0))
        # separable core: same interpolation ORDER but a different
        # factorisation — exact on affine-linear content (locked in
        # test_warp_dev), bounded-close on white noise (worst case)
        assert np.abs(dev_s - host).mean() < 0.02, f"separable trial {trial}"
        c = np.corrcoef(dev_s.ravel(), host.ravel())[0, 1]
        assert c > 0.98, f"separable trial {trial}: corr {c:.3f}"
        checked += 1
    assert checked >= 6          # the sweep must actually exercise draws
