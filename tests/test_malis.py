"""MALIS tests: affinity graphs + maximin pair counting vs brute force
(SURVEY.md §5: 'MALIS vs brute-force pair counting on tiny graphs')."""

import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from elektronn2_tpu.malis import (
    mknhood3d, mknhood2d, seg_to_affgraph, malis_weights,
    malis_weighted_nll, default_nhood,
)


def test_mknhood3d():
    nh = mknhood3d(1)
    assert nh.shape == (3, 3)
    assert set(map(tuple, nh)) == {(-1, 0, 0), (0, -1, 0), (0, 0, -1)}


def test_seg_to_affgraph_1d_line():
    seg = np.array([[[1, 1, 0, 2, 2]]], np.int32)  # (1,1,5)
    nh = np.array([[0, 0, -1]], np.int32)
    aff = np.asarray(seg_to_affgraph(seg, nh))
    # aff[0, z, x, y] = 1 iff seg[y]==seg[y-1]!=0
    np.testing.assert_array_equal(aff[0, 0, 0], [0, 1, 0, 0, 1])


def test_seg_to_affgraph_jax_matches_numpy(rng):
    seg = rng.randint(0, 3, (4, 5, 6)).astype(np.int32)
    nh = mknhood3d(1)
    a_np = np.asarray(seg_to_affgraph(seg, nh))
    a_jx = np.asarray(seg_to_affgraph(jnp.asarray(seg), nh))
    np.testing.assert_array_equal(a_np, a_jx)


def test_malis_weights_simple_line():
    """1D line, 2 objects: the weakest edge inside each object gets the
    positive pairs; the max-affinity edge between objects gets the
    negative pairs."""
    seg = np.array([[[1, 1, 1, 2, 2]]], np.int32)
    nh = np.array([[0, 0, -1]], np.int32)
    # predicted affinities for edges (y-1,y): idx 1..4
    aff = np.zeros((1, 1, 1, 5), np.float32)
    aff[0, 0, 0] = [0, 0.9, 0.4, 0.3, 0.8]
    pos, neg = malis_weights(aff, seg, nh)
    # object 1 = {0,1,2}: pairs (0,1),(1,2),(0,2)=3 pairs; maximin edges:
    # edge1 (aff .9 ∧ gt 1) merges 0-1 → 1 pair; edge2 (.4) merges 2 → 2 prs
    assert pos[0, 0, 0, 1] == 1 and pos[0, 0, 0, 2] == 2
    # object 2 = {3,4}: edge4 (.8): 1 pair
    assert pos[0, 0, 0, 4] == 1
    # neg: 3×2=6 cross pairs, all through edge3 (the only bridge)
    assert neg[0, 0, 0, 3] == 6
    assert neg.sum() == 6 and pos.sum() == 4


def test_malis_weights_2d_grid(rng):
    """Cross-check totals on a small 2D grid: total positive pairs =
    sum over objects of nC2; total negative = cross pairs (nonzero)."""
    seg3 = np.zeros((1, 3, 3), np.int32)
    seg3[0, :, 0] = 1
    seg3[0, :, 2] = 2
    nh = np.array([[0, -1, 0], [0, 0, -1]], np.int32)
    aff = rng.rand(2, 1, 3, 3).astype(np.float32)
    pos, neg = malis_weights(aff, seg3, nh)
    assert pos.sum() == 3 + 3          # two objects of 3 → 3 pairs each
    assert neg.sum() == 9              # 3×3 cross pairs
    assert (pos >= 0).all() and (neg >= 0).all()


def test_malis_nll_gradient_direction(rng):
    """MALIS NLL must push bridge-edge affinity down and intra-object
    affinity up."""
    seg = np.array([[[[1, 1, 2, 2]]]], np.int32)     # (b=1, 1, 1, 4)
    nh = np.array([[0, 0, -1]], np.int32)
    # intra-object edges confident (0.9), bridge uncertain (0.5) — with
    # uniform predictions the neg maximin path may tie through intra edges
    pred_np = np.zeros((1, 1, 1, 1, 4), np.float32)
    pred_np[0, 0, 0, 0] = [0.5, 0.9, 0.5, 0.9]
    pred = jnp.asarray(pred_np)

    def total(p):
        return jnp.sum(malis_weighted_nll(p, None, jnp.asarray(seg), nh))

    g = np.asarray(jax.grad(total)(pred))[0, 0, 0, 0]
    assert g[1] < 0      # intra-object edge (0-1): increase affinity
    assert g[2] > 0      # bridge edge (1-2): decrease affinity
    assert g[3] < 0      # intra-object edge (2-3)


def test_malis_nll_node(rng):
    """MalisNLL node trains end-to-end in a graph."""
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset(seed=4)
    inp = nm.Input([1, 1, 3, 8, 8], "b,f,z,x,y", name="raw")
    c = nm.Conv(inp, 4, 1, 1, name="c1")
    aff = nm.Conv(c, 3, 1, 1, activation_func="sig", name="aff")
    seg = nm.Input([1, 3, 8, 8], "b,z,x,y", dtype="int32", name="seg")
    mal = nm.MalisNLL(aff, None, seg, name="malis")
    loss = nm.AggregateLoss(mal)
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, target_node=seg, loss_node=loss,
                      prediction_node=aff)
    m.set_opt("Adam", lr=5e-3)
    x = rng.rand(1, 1, 3, 8, 8).astype(np.float32)
    segv = np.ones((1, 3, 8, 8), np.int32)
    segv[:, :, :, 4:] = 2
    losses = []
    for _ in range(10):
        l, _ = m.trainingstep(x, segv)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_mknhood2d_radius2():
    from elektronn2_tpu.malis import mknhood2d
    nh = mknhood2d(2)
    # one representative per ± pair within the disc, origin excluded
    assert len(set(map(tuple, nh))) == len(nh)
    for o in map(tuple, nh):
        assert o != (0, 0)
        assert o[0] ** 2 + o[1] ** 2 <= 4
        assert tuple(-np.array(o)) not in set(map(tuple, nh))


def test_mknhood3d_aniso():
    from elektronn2_tpu.malis import mknhood3d_aniso
    nh = mknhood3d_aniso(1, 1.8)
    rows = set(map(tuple, nh))
    # in-plane nearest edges + one z edge
    assert {(0, -1, 0), (0, 0, -1), (-1, 0, 0)} <= rows
    # diagonal inter-slice edges in BOTH in-plane signs
    assert (-1, -1, 0) in rows and (-1, 1, 0) in rows
    assert (-1, 0, -1) in rows and (-1, 0, 1) in rows
    # all inter-slice offsets stay within the radius
    for o in rows:
        if o[0] == -1:
            assert o[1] ** 2 + o[2] ** 2 <= 1.8 ** 2
    assert len(rows) == len(nh)


def test_affgraph_to_edgelist_roundtrip():
    from elektronn2_tpu.malis import (affgraph_to_edgelist, seg_to_affgraph,
                                      mknhood3d)
    rng = np.random.RandomState(0)
    seg = rng.randint(0, 3, size=(3, 4, 5)).astype(np.int32)
    nhood = mknhood3d(1)
    aff = np.asarray(seg_to_affgraph(seg, nhood))
    n1, n2, w = affgraph_to_edgelist(aff, nhood)
    # edge count: sum over axes of in-bounds positions
    expect = 2 * 4 * 5 + 3 * 3 * 5 + 3 * 4 * 4
    assert len(n1) == len(n2) == len(w) == expect
    # every edge weight matches the graph entry it came from
    flat = seg.reshape(-1)
    for v, u, weight in zip(n1[:50], n2[:50], w[:50]):
        assert weight == float((flat[v] == flat[u]) and flat[v] != 0)


def test_connected_components_matches_labels():
    from elektronn2_tpu.malis import (connected_components, seg_to_affgraph,
                                      mknhood3d)
    # two separated objects + background
    seg = np.zeros((4, 6, 6), np.int32)
    seg[:, :2, :2] = 5
    seg[:, 4:, 4:] = 9
    nhood = mknhood3d(1)
    aff = np.asarray(seg_to_affgraph(seg, nhood))
    cc, sizes = connected_components(aff, nhood, threshold=0.5)
    # objects resolve to single components of the right size
    ids_a = np.unique(cc[:, :2, :2])
    ids_b = np.unique(cc[:, 4:, 4:])
    assert len(ids_a) == 1 and len(ids_b) == 1 and ids_a[0] != ids_b[0]
    assert sizes[ids_a[0] - 1] == 4 * 2 * 2
    assert sizes[ids_b[0] - 1] == 4 * 2 * 2
    # background voxels (affinity 0 everywhere) are singletons
    assert cc.min() >= 1
    assert sizes.sum() == seg.size


def test_compute_v_rand_n2():
    from elektronn2_tpu.malis import compute_V_rand_N2
    gt = np.zeros((4, 4, 4), np.int32)
    gt[:2] = 1
    gt[2:] = 2
    # perfect (up to a relabel)
    v, vs, vm = compute_V_rand_N2(gt, gt * 7)
    assert v == pytest.approx(1.0) and vs == pytest.approx(1.0) \
        and vm == pytest.approx(1.0)
    # a full merge: merge score suffers, split score stays perfect
    # (SNEMI convention: split = Σp²/Σt² over GT marginals, high when no
    # gt segment is split; merge = Σp²/Σs² over pred marginals)
    merged = np.ones_like(gt)
    v2, vs2, vm2 = compute_V_rand_N2(gt, merged)
    assert vs2 == pytest.approx(1.0)   # no gt segment is split
    assert vm2 == pytest.approx(0.5)   # everything merged into one
    assert v2 == pytest.approx(2 / 3)
    # background-restriction: gt zeros are ignored entirely
    gt0 = gt.copy()
    gt0[:, :, 0] = 0
    pred = gt * 7
    pred[:, :, 0] = 12345
    v3, _, _ = compute_V_rand_N2(gt0, pred)
    assert v3 == pytest.approx(1.0)


def test_make_affinities_and_downsample_xy():
    from elektronn2_tpu.data.image import make_affinities, downsample_xy
    seg = np.zeros((3, 6, 6), np.int32)
    seg[:, :2, :2] = 1
    seg[:, 4:, 4:] = 1          # same id, spatially disconnected
    seg[:, 4, 0] = 2            # 3-voxel bar
    aff, cc = make_affinities(seg, size_thresh=4)
    assert aff.shape == (3, 3, 6, 6)
    # the disconnected same-id object splits into two components
    a = np.unique(cc[:, :2, :2])
    b = np.unique(cc[:, 4:, 4:])
    assert len(a) == 1 and len(b) == 1 and a[0] != b[0] and a[0] != 0
    # the 3-voxel bar is below size_thresh → zeroed
    assert (cc[:, 4, 0] == 0).all()
    # background stays background
    assert (cc[seg == 0] == 0).all()
    # batch form mirrors single form
    affb, ccb = make_affinities(seg[None], size_thresh=4)
    np.testing.assert_array_equal(ccb[0], cc)
    np.testing.assert_array_equal(affb[0], aff)

    d = np.arange(2 * 3 * 6 * 7, dtype=np.float32).reshape(2, 3, 6, 7)
    l = np.arange(3 * 6 * 7, dtype=np.int32).reshape(3, 6, 7)
    d2, l2 = downsample_xy(d, l, factor=2)
    assert d2.shape == (2, 3, 3, 3) and l2.shape == (3, 3, 3)
    assert d2[0, 0, 0, 0] == pytest.approx(d[0, 0, :2, :2].mean())
    assert (l2 == l[:, :6:2, :6:2]).all()
    d3, l3 = downsample_xy(d, None, factor=3)
    assert d3.shape == (2, 3, 2, 2) and l3 is None
