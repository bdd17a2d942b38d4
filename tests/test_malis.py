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
