"""Ablation probes for the tail kernel's per-row cost (r2 s10).

Standalone copy of the mstack kernel with pieces removed (WRONG VALUES —
timing only): which of {ring DMA, stage copy, dot, epilogue, out write}
actually serializes into the measured ~1.7 us/row?

  full     — the real mstack body (sanity vs exp_ptail_floor)
  nodot    — stage + epilogue on stage slice (no MXU dot)
  nostage  — dot straight from ring slot 0 (no staging copies)
  noepi    — stage + dot, write p slice raw (no shifted adds)
  dotonly  — dot from a FIXED stage (no staging, no epilogue)
  none     — ring DMA + out write only
  dmaonly  — ring DMA; all cells write ONE shared tiny out block
             (decomposes `none` into its DMA leg)
  outonly  — out write only, no ring DMA (decomposes the write leg;
             nczxy block writes are strided 2 KB chunks — the xzcy
             production layout writes contiguously instead)

JSON per probe. Shapes default to the canonical isolated tail shape.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

    shp = tuple(int(v) for v in os.environ.get(
        "SHAPE", "1,40,34,320,531").split(","))
    dil = tuple(int(v) for v in os.environ.get("DIL", "1,4,4").split(","))
    Cout = int(os.environ.get("COUT", "40"))
    K_disp = int(os.environ.get("BENCH_K", "8"))
    ZB = int(os.environ.get("ZB", "8"))
    probes = os.environ.get(
        "PROBES",
        "full,nodot,nostage,noepi,dotonly,none,dmaonly,outonly"
    ).split(",")

    _, Cin, Z, X, Y = shp
    dz, dx, dy = dil
    C = ((Cin + 7) // 8) * 8
    Cout_p = ((Cout + 7) // 8) * 8
    Yp = ((Y + 127) // 128) * 128
    Zo, Xo, Yo = Z - 2, X - 2 * dx, Y - 2 * dy
    Zo_p = ((Zo + ZB - 1) // ZB) * ZB
    SC = (ZB + 2) * C
    R = 2 * dx + 2
    n_prime = 2 * dx + 1

    rng = np.random.RandomState(0)
    xt = rng.randn(X, (max(Z, Zo_p + 2)) * C, Yp).astype(np.float32)
    x = jax.device_put(xt)
    w = jax.device_put(rng.randn(3 * Cout_p, 9 * C).astype(np.float32)
                       / 30)
    b = jax.device_put(rng.randn(Cout_p, 1).astype(np.float32))
    float(jnp.sum(x))

    def make(probe):
        def kernel(x_hbm, w_ref, b_ref, out_ref, ring, sem, stage):
            z = pl.program_id(0)
            xg = pl.program_id(1)
            n_x = pl.num_programs(1)

            def dma(row, slot):
                return pltpu.make_async_copy(
                    x_hbm.at[row, pl.ds(z * ZB * C, SC), :],
                    ring.at[pl.ds(slot * SC, SC), :],
                    sem.at[slot])

            if probe != "outonly":
                @pl.when(xg == 0)
                def _prime():
                    for r in range(n_prime):
                        dma(r, r % R).start()
                    for r in range(n_prime):
                        dma(r, r % R).wait()

                @pl.when(xg > 0)
                def _wait():
                    dma(xg + 2 * dx, (xg + 2 * dx) % R).wait()

                @pl.when(xg + 1 < n_x)
                def _next():
                    dma(xg + 1 + 2 * dx, (xg + 1 + 2 * dx) % R).start()

            dn = (((1,), (0,)), ((), ()))
            for zz in range(ZB):
                if probe in ("full", "nodot", "noepi"):
                    for kx in range(3):
                        slot = (xg + kx * dx) % R
                        stage[pl.ds(kx * 3 * C, 3 * C), :] = \
                            ring[pl.ds(slot * SC + zz * C, 3 * C), :]
                if probe in ("full", "noepi", "dotonly"):
                    p = jax.lax.dot_general(
                        w_ref[:, :], stage[:, :], dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                elif probe == "nostage":
                    p = jax.lax.dot_general(
                        w_ref[:, :],
                        ring[pl.ds(0 * SC + zz * C, 9 * C), :],
                        dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                if probe in ("full", "nostage"):
                    acc = p[0: Cout_p, 0: Yo]
                    acc = acc + p[Cout_p: 2 * Cout_p, dy: dy + Yo]
                    acc = acc + p[2 * Cout_p: 3 * Cout_p,
                                  2 * dy: 2 * dy + Yo]
                    acc = acc + b_ref[:, :1]
                    out_ref[zz, 0] = jnp.maximum(acc, 0.0)
                elif probe in ("noepi", "dotonly"):
                    out_ref[zz, 0] = p[0: Cout_p, 0: Yo]
                elif probe == "nodot":
                    acc = stage[0: Cout_p, 0: Yo]
                    acc = acc + stage[Cout_p: 2 * Cout_p, dy: dy + Yo]
                    acc = acc + stage[2 * Cout_p: 3 * Cout_p,
                                      2 * dy: 2 * dy + Yo]
                    acc = acc + b_ref[:, :1]
                    out_ref[zz, 0] = jnp.maximum(acc, 0.0)
                else:               # none / dmaonly / outonly
                    out_ref[zz, 0] = ring[pl.ds(zz * C, Cout_p),
                                          0: Yo]
            return
        return kernel

    rows = Zo_p * Xo
    flops = 2 * rows * Yo * 3 * Cout_p * 9 * C
    for probe in probes:
        if probe == "dmaonly":
            # all cells share ONE out block: the write leg collapses to
            # a single block copy — what remains is the ring-DMA leg
            out_specs = pl.BlockSpec((ZB, 1, Cout_p, Yo),
                                     lambda z, xg: (0, 0, 0, 0),
                                     memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((ZB, 1, Cout_p, Yo),
                                             jnp.float32)
        else:
            out_specs = pl.BlockSpec((ZB, 1, Cout_p, Yo),
                                     lambda z, xg: (z, xg, 0, 0),
                                     memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((Zo_p, Xo, Cout_p, Yo),
                                             jnp.float32)
        f = pl.pallas_call(
            make(probe),
            grid=(Zo_p // ZB, Xo),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((R * SC, Yp), jnp.float32),
                pltpu.SemaphoreType.DMA((R,)),
                pltpu.VMEM((9 * C, Yp), jnp.float32),
            ],
        )
        jf = jax.jit(f)
        try:
            out = jf(x, w, b)
            float(jnp.sum(out))
        except Exception as e:
            print(json.dumps({"probe": probe, "error": str(e)[:160]}),
                  flush=True)
            continue
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K_disp):
                out = jf(x, w, b)
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0) / K_disp)
        dt = min(ts)
        print(json.dumps({
            "probe": probe, "ms": round(dt * 1e3, 2),
            "us_per_row": round(dt * 1e6 / rows, 3),
            "tflops_padded": round(flops / dt / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
