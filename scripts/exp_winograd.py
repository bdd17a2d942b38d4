"""Winograd lowering A/B for the dense-sweep tail convs (measured study).

The last "standard remedy" for the Cout=40 MXU-lane underfill not yet in
docs/tpu_performance.md's tried list: Winograd F(2x2,3x3) cuts the MACs of
a 3x3 conv 2.25x (16 mults per 2x2 output tile vs 36).  Composed with the
ztapsum z-decomposition (3 z-shifted 2D convs summed) the 3^3 tail conv
drops from 27 to 12 effective MACs/output.

Why the arithmetic predicts a LOSS on TPU before measuring:

* The conv's im2col GEMM contracts over K = Cin*9 (= 270/360 here), which
  fills the MXU's 128-deep accumulation well.  Winograd's per-point GEMMs
  contract over K = Cin (= 30/40): the MAC *count* drops 2.25x but each
  MAC runs at ~Cin/128 MXU row fill, so the *time* per MAC rises ~4x.
  The N=40 lane underfill this study targets is untouched (N stays Cout).
  Same group-structure failure as the rejected s2d phase->Cin fold.
* The 16 transform coefficient planes materialise ~4x the input volume in
  HBM between transform and GEMM (the fused conv reads its input once).

This script measures it anyway (same sustained protocol as
exp_tail_conv.py) so the rejection -- or surprise -- is data, not theory.
Variants:

  conv3d   -- lax 3D conv (what the champion's tail does)      [baseline]
  wino2d   -- ztapsum over z, each 2D 3x3 conv via F(2x2,3x3)
  wino2d44 -- same with F(4x4,3x3) (36 mults / 16 outputs: 2.25x fewer
              2D MACs again vs F(2x2,3x3)'s 4/output -> 2.25/output, at
              the cost of 36 coefficient planes and wider transforms)

Exactness: checked vs conv3d at f32 (rel tol ~1e-5; Winograd is an exact
algorithm up to floating-point reassociation).  Reference analog:
`elektronn2/neuromancer/computations.py::conv` (the op being lowered).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _wino_mats(m):
    """Transform matrices for F(m x m, 3x3), float64 exact."""
    if m == 2:
        BT = np.array([[1, 0, -1, 0],
                       [0, 1, 1, 0],
                       [0, -1, 1, 0],
                       [0, 1, 0, -1]], np.float64)
        G = np.array([[1, 0, 0],
                      [.5, .5, .5],
                      [.5, -.5, .5],
                      [0, 0, 1]], np.float64)
        AT = np.array([[1, 1, 1, 0],
                       [0, 1, -1, -1]], np.float64)
    elif m == 4:
        # Lavin & Gray (arXiv:1509.09308) F(4x4,3x3) with points
        # {0, 1, -1, 2, -2, inf}; the widely used scaled variant.
        BT = np.array([
            [4, 0, -5, 0, 1, 0],
            [0, -4, -4, 1, 1, 0],
            [0, 4, -4, -1, 1, 0],
            [0, -2, -1, 2, 1, 0],
            [0, 2, -1, -2, 1, 0],
            [0, 4, 0, -5, 0, 1]], np.float64)
        G = np.array([
            [1 / 4, 0, 0],
            [-1 / 6, -1 / 6, -1 / 6],
            [-1 / 6, 1 / 6, -1 / 6],
            [1 / 24, 1 / 12, 1 / 6],
            [1 / 24, -1 / 12, 1 / 6],
            [0, 0, 1]], np.float64)
        AT = np.array([
            [1, 1, 1, 1, 1, 0],
            [0, 1, -1, 2, -2, 0],
            [0, 1, 1, 4, 4, 0],
            [0, 1, -1, 8, -8, 1]], np.float64)
    else:
        raise ValueError(m)
    return BT, G, AT


def main():
    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    from elektronn2_tpu.ops.conv import conv

    P = int(os.environ.get("P", "16"))          # phases
    Z, X, Y = (int(v) for v in os.environ.get(
        "SP", "64,128,128").split(","))
    Cin = int(os.environ.get("CIN", "30"))
    Cout = int(os.environ.get("COUT", "40"))
    K = int(os.environ.get("BENCH_K", "4"))
    cdtype = os.environ.get("CDTYPE", "bfloat16")

    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randn(P, Cin, Z, X, Y).astype(np.float32)
                       .astype(cdtype))
    w = jax.device_put((rng.randn(Cout, Cin, 3, 3, 3) / 30)
                       .astype(np.float32).astype(cdtype))
    float(jnp.sum(x.astype(jnp.float32)))

    def conv3d(x, w):
        return conv(x, w)

    def _wino2d_tap(x2, w2, m):
        """VALID 3x3 2D conv of x2 (B,Cin,H,W) via F(m x m, 3x3)."""
        BTn, Gn, ATn = _wino_mats(m)
        t = m + 2                                   # input tile edge
        BT = jnp.asarray(BTn, x2.dtype)
        AT = jnp.asarray(ATn, x2.dtype)
        B_, C, H, W = x2.shape
        Ho, Wo = H - 2, W - 2
        nH, nW = Ho // m, Wo // m
        # kernel transform U[a,b,o,i] = (G w G^T), in f32 then cast
        G = jnp.asarray(Gn, jnp.float32)
        U = jnp.einsum("aj,oijk,bk->aboi", G,
                       w2.astype(jnp.float32), G).astype(x2.dtype)
        # gather the overlapping t x t input tiles by strided slicing
        rows = []
        for a in range(t):
            cols = []
            for b in range(t):
                cols.append(jax.lax.slice(
                    x2, (0, 0, a, b),
                    (B_, C, a + (nH - 1) * m + 1, b + (nW - 1) * m + 1),
                    (1, 1, m, m)))
            rows.append(jnp.stack(cols))
        D = jnp.stack(rows)                        # (t,t,B,C,nH,nW)
        V = jnp.einsum("ac,bd,cdpihw->abpihw", BT, BT, D)
        # per-point GEMM, K = Cin only -- the structural problem
        Vm = V.reshape(t * t, B_, C, nH * nW).transpose(0, 1, 3, 2)
        Um = U.reshape(t * t, Cout, C).transpose(0, 2, 1)
        M = jnp.matmul(Vm, Um[:, None])            # (t*t,B,nH*nW,Cout)
        M = M.reshape(t, t, B_, nH, nW, Cout)
        Yt = jnp.einsum("ua,vb,abphwo->pohuwv", AT, AT, M)
        return Yt.reshape(B_, Cout, m * nH, m * nW)

    def _ztapsum(x, w, tap2d):
        zo = Z - 2
        acc = None
        for tz in range(3):
            x2 = (x[:, :, tz:tz + zo].transpose(0, 2, 1, 3, 4)
                  .reshape(P * zo, Cin, X, Y))
            y = tap2d(x2, w[:, :, tz])
            acc = y if acc is None else acc + y
        return acc.reshape(P, zo, Cout, X - 2, Y - 2).transpose(
            0, 2, 1, 3, 4)

    def wino2d(x, w):
        return _ztapsum(x, w, lambda a, b: _wino2d_tap(a, b, 2))

    def wino2d44(x, w):
        return _ztapsum(x, w, lambda a, b: _wino2d_tap(a, b, 4))

    fns = {"conv3d": conv3d, "wino2d": wino2d, "wino2d44": wino2d44}
    only = os.environ.get("ONLY")
    ref = None
    flops = (P * (Z - 2) * (X - 2) * (Y - 2)) * Cout * Cin * 27 * 2
    for name, f in fns.items():
        if only and name not in only.split(","):
            continue
        if name == "wino2d44" and ((X - 2) % 4 or (Y - 2) % 4):
            print(json.dumps({"variant": name,
                              "skipped": "output not 4-divisible"}),
                  flush=True)
            continue
        jf = jax.jit(f)
        try:
            out = jf(x, w)
            s = float(jnp.sum(out.astype(jnp.float32)))
            if os.environ.get("CHECK") and name != "conv3d":
                refy = jax.jit(conv3d)(x, w)
                dev = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - refy.astype(jnp.float32))))
                scale = float(jnp.max(jnp.abs(refy.astype(jnp.float32))))
                print(json.dumps({"variant": name, "check_maxdev": dev,
                                  "check_rel": dev / (scale + 1e-9)}),
                      flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        if ref is None:
            ref = s
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                out = jf(x, w)
            float(jnp.sum(out.astype(jnp.float32)))
            ts.append((time.perf_counter() - t0) / K)
        dt = min(ts)
        print(json.dumps({
            "variant": name, "ms": round(dt * 1e3, 1),
            "tflops_effective": round(flops / dt / 1e12, 1),
            "sum_relerr": abs(s - ref) / (abs(ref) + 1e-9)}), flush=True)


if __name__ == "__main__":
    main()
