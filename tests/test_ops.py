"""Tests for ops: conv/pool primitives vs numpy oracles, and the MFP
shift-and-stitch equivalence (the load-bearing correctness property of
max-fragment-pooling, SURVEY.md §8 hard part #1)."""

import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from elektronn2_tpu.ops import (
    conv, dot, upconv, pooling, unpooling, maxout, softmax, apply_activation,
    fragmentpool, fragments2dense,
)

HI = jax.lax.Precision.HIGHEST


def np_valid_conv(x, w):
    """Brute-force valid cross-correlation oracle, any spatial rank."""
    b, fi = x.shape[:2]
    fo = w.shape[0]
    sp_in = x.shape[2:]
    fsh = w.shape[2:]
    sp_out = tuple(i - f + 1 for i, f in zip(sp_in, fsh))
    out = np.zeros((b, fo) + sp_out, dtype=np.float64)
    for pos in itertools.product(*[range(s) for s in sp_out]):
        sl = (slice(None), slice(None)) + tuple(
            slice(p, p + f) for p, f in zip(pos, fsh))
        patch = x[sl]  # (b, fi, *fsh)
        out[(slice(None), slice(None)) + pos] = np.tensordot(
            patch, w, axes=(list(range(1, patch.ndim)),
                            list(range(1, w.ndim))))
    return out


@pytest.mark.parametrize("sp,fsh", [((7,), (3,)), ((6, 7), (3, 2)),
                                    ((5, 6, 7), (3, 3, 2))])
def test_conv_matches_numpy(rng, sp, fsh):
    x = rng.randn(2, 3, *sp).astype(np.float32)
    w = rng.randn(4, 3, *fsh).astype(np.float32)
    got = np.asarray(conv(jnp.asarray(x), jnp.asarray(w), precision=HI))
    want = np_valid_conv(x, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dot_is_1x1_conv(rng):
    x = rng.randn(2, 3, 5, 5).astype(np.float32)
    w = rng.randn(3, 4).astype(np.float32)
    got = np.asarray(dot(jnp.asarray(x), jnp.asarray(w), precision=HI))
    want = np_valid_conv(x, w.T[:, :, None, None])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pooling_max_and_avg(rng):
    x = rng.randn(1, 2, 6, 6).astype(np.float32)
    got = np.asarray(pooling(jnp.asarray(x), (2, 2)))
    want = x.reshape(1, 2, 3, 2, 3, 2).max((3, 5))
    np.testing.assert_array_equal(got, want)
    got_avg = np.asarray(pooling(jnp.asarray(x), (2, 2), mode="avg"))
    want_avg = x.reshape(1, 2, 3, 2, 3, 2).mean((3, 5))
    np.testing.assert_allclose(got_avg, want_avg, rtol=1e-5)


def test_pooling_drops_trailing(rng):
    x = rng.randn(1, 1, 7).astype(np.float32)
    got = np.asarray(pooling(jnp.asarray(x), (2,)))
    assert got.shape == (1, 1, 3)
    np.testing.assert_array_equal(got[0, 0], x[0, 0, :6].reshape(3, 2).max(1))


def test_unpooling_roundtrip(rng):
    x = rng.randn(1, 2, 3, 4).astype(np.float32)
    up = np.asarray(unpooling(jnp.asarray(x), (2, 2)))
    assert up.shape == (1, 2, 6, 8)
    down = np.asarray(pooling(jnp.asarray(up), (2, 2)))
    np.testing.assert_array_equal(down, x)


def test_upconv_inverts_shape(rng):
    x = rng.randn(2, 3, 4, 5).astype(np.float32)
    w = rng.randn(6, 3, 2, 2).astype(np.float32)  # (f_out, f_in, *pool)
    y = np.asarray(upconv(jnp.asarray(x), jnp.asarray(w), (2, 2),
                          precision=HI))
    assert y.shape == (2, 6, 8, 10)
    # kernel==stride → output block (2i..2i+1, 2j..2j+1) depends on x[i,j] only
    # check linearity/locality: perturb one input voxel, only its block changes
    x2 = x.copy()
    x2[0, 0, 1, 1] += 1.0
    y2 = np.asarray(upconv(jnp.asarray(x2), jnp.asarray(w), (2, 2),
                           precision=HI))
    diff = np.abs(y2 - y).sum((0, 1))
    changed = np.argwhere(diff > 1e-6)
    assert changed.min(0).tolist() == [2, 2] and changed.max(0).tolist() == [3, 3]


def test_maxout(rng):
    x = rng.randn(2, 6, 4).astype(np.float32)
    got = np.asarray(maxout(jnp.asarray(x), 2))
    want = x.reshape(2, 3, 2, 4).max(2)
    np.testing.assert_array_equal(got, want)


def test_softmax_normalises(rng):
    x = rng.randn(2, 5, 3, 3).astype(np.float32)
    s = np.asarray(softmax(jnp.asarray(x)))
    np.testing.assert_allclose(s.sum(1), 1.0, rtol=1e-5)


def test_activations(rng):
    x = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(apply_activation(x, "relu")),
                                  np.maximum(np.asarray(x), 0))
    m = apply_activation(jnp.asarray(rng.randn(2, 4, 3).astype(np.float32)),
                         "maxout:2")
    assert m.shape == (2, 2, 3)
    alpha = jnp.asarray(np.full(4, 0.1, np.float32))
    p = apply_activation(x, "prelu", alpha=alpha)
    np.testing.assert_allclose(
        np.asarray(p),
        np.where(np.asarray(x) >= 0, np.asarray(x), 0.1 * np.asarray(x)),
        rtol=1e-6)


# ------------------------------------------------------- MFP: the hard oracle

def _mini_net_plain(x, ws, pools):
    """Conv→pool stack with plain (decimating) pooling."""
    for w, p in zip(ws, pools):
        x = conv(x, w, precision=HI)
        if any(pi > 1 for pi in p):
            x = pooling(x, p)
    return x


def _mini_net_mfp(x, ws, pools):
    """Same stack with MFP pooling; returns (y, offsets)."""
    nsp = x.ndim - 2
    offsets = np.zeros((1, nsp), dtype=np.int64)
    strides = np.ones(nsp, dtype=np.int64)
    for w, p in zip(ws, pools):
        x = conv(x, w, precision=HI)
        if any(pi > 1 for pi in p):
            x, offsets = fragmentpool(x, p, offsets, strides)
            strides = strides * np.asarray(p)
    return x, offsets


@pytest.mark.parametrize("sp,pools,fshapes", [
    # 1D two mfp pools of 2 → stride 4
    ((29,), [(2,), (2,)], [(3,), (3,)]),
    # 2D anisotropic
    ((19, 23), [(2, 2), (1, 2)], [(3, 3), (2, 2)]),
    # 3D single pool (10-2+1=9 ≡ 1 mod 2 → valid MFP size)
    ((10, 10, 10), [(2, 2, 2)], [(2, 2, 2)]),
])
def test_mfp_equals_shift_and_stitch(rng, sp, pools, fshapes):
    """THE MFP correctness property: the stitched dense map equals running
    the plain network at every input shift (shift-and-stitch oracle)."""
    nsp = len(sp)
    n_in, n_f = 1, 2
    ws, f_prev = [], n_in
    for fs in fshapes:
        ws.append(jnp.asarray(rng.randn(n_f, f_prev, *fs).astype(np.float32)))
        f_prev = n_f
    x = jnp.asarray(rng.randn(1, n_in, *sp).astype(np.float32))

    y, offsets = _mini_net_mfp(x, ws, pools)
    dense = np.asarray(fragments2dense(y, offsets))

    S = [int(np.prod([p[d] for p in pools])) for d in range(nsp)]
    assert dense.shape[2:] == tuple(k * s for k, s in zip(y.shape[2:], S))

    # oracle: for every shift s, plain net on x[..., s_d:] must equal
    # dense[..., s_d::S_d]
    for shift in itertools.product(*[range(s) for s in S]):
        sl = (slice(None), slice(None)) + tuple(
            slice(sd, None) for sd in shift)
        ref = np.asarray(_mini_net_plain(x[sl], ws, pools))
        got = dense[(slice(None), slice(None)) + tuple(
            slice(sd, None, Sd) for sd, Sd in zip(shift, S))]
        got = got[(slice(None), slice(None)) + tuple(
            slice(0, r) for r in ref.shape[2:])]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_mfp_batch_layout_fragment_major(rng):
    """Fragments are stacked fragment-major: reshape(n_frag, b, ...), and
    each (fragment, sample) row depends on that sample alone."""
    w = jnp.asarray(rng.randn(1, 1, 2).astype(np.float32))
    x = jnp.asarray(rng.randn(3, 1, 10).astype(np.float32))  # b=3
    y, off = _mini_net_mfp(x, [w], [(2,)])
    assert y.shape[0] == 6 and len(off) == 2
    yf = np.asarray(y).reshape(2, 3, *y.shape[1:])
    y1, _ = _mini_net_mfp(x[1:2], [w], [(2,)])
    y1 = np.asarray(y1).reshape(2, 1, *y1.shape[1:])
    np.testing.assert_allclose(yf[:, 1], y1[:, 0], rtol=1e-6)


def test_fragments2dense_identity_when_single_fragment(rng):
    y = jnp.asarray(rng.randn(2, 3, 4, 4).astype(np.float32))
    out = fragments2dense(y, np.zeros((1, 2), np.int64))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(y))
