"""Mosaic dot-rate probe at the tail kernel's exact dot shapes (r2 s10).

Question: the in-graph f32 tail chain runs at ~86% of v5e's f32 MXU peak
(docs/tpu_performance.md), so the only remaining tail lever is operand
dtype — yet s9 measured bf16 operands SLOWER in-kernel. This probe
isolates the dot itself: a Pallas kernel whose grid cells each run ZB
INDEPENDENT (no accumulator chain — the s9 microbench flaw) dots of the
kernel's exact shape (M=3*Cout_p, K=9C, N=Yp) from VMEM-resident
operands, writing one row of each result (keeps Mosaic from DCE'ing,
adds negligible traffic).

JSON per config: effective TF/s on the dot MACs.
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

    K_disp = int(os.environ.get("BENCH_K", "8"))
    n_cells = int(os.environ.get("CELLS", "1024"))
    ZB = int(os.environ.get("ZB", "8"))
    configs = []
    for dt in ("float32", "bfloat16"):
        align = 16 if dt == "bfloat16" else 8
        C = ((40 + align - 1) // align) * align
        configs += [
            (dt, 120, 9 * C, 512),     # kernel dot, in-graph N
            (dt, 120, 9 * C, 640),     # kernel dot, isolated-shape N
            (dt, 128, 9 * C, 512),     # M padded to full
        ]

    for dt, M, Kd, N in configs:
        cd = jnp.dtype(dt)

        def kern(w_ref, x_ref, o_ref):
            outs = []
            for zz in range(ZB):
                p = jax.lax.dot_general(
                    w_ref[:, :], x_ref[pl.ds(zz * Kd, Kd), :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                outs.append(p[0:1, :])
            o_ref[:, :] = jnp.concatenate(outs, 0)

        rng = np.random.RandomState(0)
        w = jax.device_put(rng.randn(M, Kd).astype(np.float32).astype(dt))
        x = jax.device_put(
            rng.randn(ZB * Kd, N).astype(np.float32).astype(dt))
        try:
            f = pl.pallas_call(
                kern,
                grid=(n_cells,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((ZB, N), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((ZB, N), jnp.float32),
            )
            jf = jax.jit(f)
            out = jf(w, x)
            float(jnp.sum(out))
        except Exception as e:
            print(json.dumps({"dtype": dt, "M": M, "K": Kd, "N": N,
                              "error": str(e)[:160]}), flush=True)
            continue
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K_disp):
                out = jf(w, x)
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0) / K_disp)
        dt_s = min(ts)
        flops = 2 * M * Kd * N * ZB * n_cells
        print(json.dumps({
            "dtype": dt, "M": M, "K": Kd, "N": N,
            "ms": round(dt_s * 1e3, 2),
            "us_per_dot": round(dt_s * 1e6 / (ZB * n_cells), 3),
            "tflops": round(flops / dt_s / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
