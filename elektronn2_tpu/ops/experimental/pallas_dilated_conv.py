"""EXPERIMENTAL: Pallas dilated-conv kernel (im2col-in-VMEM + MXU matmul).

Motivation: the dense-inference hot op is a dilated conv with SMALL channel
counts (20-40) — XLA's lowering reaches only ~3.5 TFLOP/s because the MXU
contraction (K = Cin) is underfilled. This kernel folds all 27 taps into the
contraction (K = 27*Cin ≈ 810) by building a per-output-row im2col buffer in
VMEM (9 row DMAs from HBM + 27 VMEM copies), then issuing ONE
(Cout_pad, K) @ (K, TY) MXU matmul per grid cell — a ~4x utilisation
ceiling improvement.

STATUS (round 1): numerically CORRECT (verified vs lax.conv_general_dilated,
maxdiff ~1e-5/f32, tests run it in interpret mode and at TY=128 on TPU), but
the Mosaic remote-compile toolchain in this sandbox HANGS at production tile
sizes (TY=512). Measured at TY=128 on the flagship layer shape: 3.9 TFLOP/s
vs XLA's 3.6 — both bound by the same MXU underfill at Cout=40, so the
production dense path stays on XLA
(neuromancer/inference.py::dilated_dense_forward). Round-2 direction:
fuse the WHOLE layer stack per tile (VMEM-resident intermediates) rather
than beating XLA on a single conv.

Layout contract: activations (Z, X, Cin, Y) — sliced dims leading, tiled
(8, 128) dims trailing; Cin padded to 8; DMA'd y-slices 128-aligned.
"""

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def make_kernel(Cin, Cout_pad, d, TY, TYA, K3=3):
    K = K3 * K3 * K3 * Cin

    def kernel(x_hbm, w_ref, out_ref, slab, col, sem):
        z = pl.program_id(0)
        xg = pl.program_id(1)
        yt = pl.program_id(2)
        y0 = yt * TY
        for iz in range(K3):
            for ix in range(K3):
                pltpu.make_async_copy(
                    x_hbm.at[z + iz * d, xg + ix * d, :, pl.ds(y0, TYA)],
                    slab.at[iz * K3 + ix],
                    sem.at[iz * K3 + ix]).start()
        for iz in range(K3):
            for ix in range(K3):
                pltpu.make_async_copy(
                    x_hbm.at[z + iz * d, xg + ix * d, :, pl.ds(y0, TYA)],
                    slab.at[iz * K3 + ix],
                    sem.at[iz * K3 + ix]).wait()
        for iz in range(K3):
            for ix in range(K3):
                for iy in range(K3):
                    tap = (iz * K3 + ix) * K3 + iy
                    col[pl.ds(tap * Cin, Cin), :] = \
                        slab[iz * K3 + ix, :, pl.ds(iy * d, TY)]
        out_ref[0, 0, :, :] = jnp.dot(w_ref[:, :], col[:, :],
                                      preferred_element_type=jnp.float32)

    return kernel, K


def dilated_conv_pallas(x_zxcy, w, d, TY=512, Yo=None):
    """x_zxcy: (Z, X, Cin, Y) f32 (Y possibly over-padded for DMA);
    w: (Cout, Cin, 3, 3, 3); isotropic dilation d. Yo: desired output y
    extent (default Y - 2d); Yo % TY == 0, TY % 128 == 0.
    Returns (Zo, Xo, Cout_pad, Yo)."""
    Z, X, Cin, Y = x_zxcy.shape
    Cout = w.shape[0]
    if Cin % 8:
        pad_c = 8 - Cin % 8
        x_zxcy = jnp.pad(x_zxcy, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, pad_c), (0, 0), (0, 0), (0, 0)))
        Cin += pad_c
    Zo, Xo = Z - 2 * d, X - 2 * d
    Yo = Yo if Yo is not None else Y - 2 * d
    assert Yo % TY == 0 and TY % 128 == 0, (Yo, TY)
    TYA = _round_up(TY + 2 * d, 128)
    assert Y >= TY * (Yo // TY - 1) + TYA, "input Y too short for TYA DMA"
    Cout_pad = _round_up(Cout, 8)
    kernel, K = make_kernel(Cin, Cout_pad, d, TY, TYA)
    w_mat = jnp.zeros((Cout_pad, K), jnp.float32)
    w_flat = w.transpose(2, 3, 4, 1, 0).reshape(K, Cout).T
    w_mat = w_mat.at[:Cout].set(w_flat)

    out = pl.pallas_call(
        kernel,
        grid=(Zo, Xo, Yo // TY),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, Cout_pad, TY),
                               lambda z, x, y: (z, x, 0, y),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Zo, Xo, Cout_pad, Yo), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((9, Cin, TYA), jnp.float32),
            pltpu.VMEM((K, TY), jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )(x_zxcy, w_mat)
    return out


if __name__ == "__main__":
    import time
    from jax import lax
    rng = np.random.RandomState(0)
    d = 4

    # correctness small
    Cin, Cout = 5, 7
    Z, X, Y = 12, 12, 128 + 2 * d + 120   # Yo = 248? need Yo%TY==0, TY=128 → Y=136+120=256→Yo=248 no
    Y = 128 + 2 * d                        # Yo = 128
    xs = jnp.asarray(rng.rand(Z, X, Cin, Y).astype(np.float32))
    ws = jnp.asarray(rng.rand(Cout, Cin, 3, 3, 3).astype(np.float32))
    # pad input Y so the last tile's TYA DMA stays in bounds
    TYA = _round_up(128 + 2 * d, 128)
    xs_p = jnp.pad(xs, ((0, 0), (0, 0), (0, 0), (0, TYA - (128 + 2 * d))))
    got = np.asarray(dilated_conv_pallas(xs_p, ws, d, TY=128,
                                         Yo=128))[:, :, :Cout]
    xs_nc = xs.transpose(2, 0, 1, 3)[None]
    dn = lax.conv_dimension_numbers((1, Cin, 1, 1, 1), (1, 1, 1, 1, 1),
                                    ("NCDHW", "OIDHW", "NCDHW"))
    ref = lax.conv_general_dilated(xs_nc, ws, (1, 1, 1), "VALID",
                                   rhs_dilation=(d, d, d),
                                   dimension_numbers=dn)[0]
    ref = np.asarray(ref).transpose(1, 2, 0, 3)   # (Zo, Xo, Cout, Yo)
    print("correct maxdiff:", float(np.abs(got - ref).max()), flush=True)

    # perf
    Cin, Cout = 30, 40
    Z, X = 44, 307
    TY = 512
    Yo = 512
    TYA = _round_up(TY + 2 * d, 128)
    Y = Yo + 2 * d
    Ypad = TY * (Yo // TY - 1) + TYA
    x = jax.device_put(rng.rand(Z, X, Cin, max(Y, Ypad)).astype(np.float32))
    w = jax.device_put(rng.rand(Cout, Cin, 3, 3, 3).astype(np.float32))
    float(jnp.sum(x))
    f = jax.jit(functools.partial(dilated_conv_pallas, d=d, TY=TY, Yo=Yo))
    o = f(x, w); float(jnp.sum(o))
    t0 = time.perf_counter()
    o = f(x, w); s = float(jnp.sum(o))
    dt = time.perf_counter() - t0
    flops = (Z - 2 * d) * (X - 2 * d) * Yo * Cin * Cout * 27 * 2
    print("pallas: %.1f ms, %.1f TFLOP/s" % (dt * 1e3, flops / dt / 1e12),
          flush=True)

    xn = jax.device_put(rng.rand(1, Cin, Z, X, Y).astype(np.float32))
    g = jax.jit(lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID", rhs_dilation=(d, d, d),
        dimension_numbers=dn))
    o2 = g(xn, w); float(jnp.sum(o2))
    t0 = time.perf_counter()
    o2 = g(xn, w); s2 = float(jnp.sum(o2))
    dt2 = time.perf_counter() - t0
    print("XLA:    %.1f ms, %.1f TFLOP/s" % (dt2 * 1e3, flops / dt2 / 1e12))
