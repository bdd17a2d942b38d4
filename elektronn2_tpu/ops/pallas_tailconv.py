"""Pallas TPU kernel for the dense-sweep tail convs (3x3x3, xy-dilated).

The dense-inference hot op — ~92% of the sweep FLOPs
(docs/tpu_performance.md) — is a valid-mode 3D conv with kernel (3,3,3),
z-dilation 1, xy-dilation d (the cumulative pool stride of the à-trous
formulation; reference mechanism: ``elektronn2/neuromancer/computations.py::
fragmentpool`` + ``conv``), and SMALL channel counts (Cin 30-40, Cout 40).
Cout=40 underfills the MXU's 128-wide output dimension, capping ANY
lowering at ~31% of peak (~61 TF/s bf16 on v5e); XLA's conv reaches ~28
TF/s in-graph. This kernel attacks the gap between the two with a design
XLA cannot express:

* activations live in layout ``(X, Z*C, Y)`` — channels on sublanes, Y on
  lanes — so one (3C, Y) VMEM slab holds all three kz taps of one x-row;
* a ring of ``2*dx+2`` slabs in VMEM scratch (persistent across the
  sequential TPU grid) turns the 9-fold x/z input reuse into ONE
  double-buffered HBM DMA per output row (the round-1 kernel,
  ``ops/experimental/pallas_dilated_conv.py``, paid 9 serial DMAs + 27
  strided VMEM copies per tile and managed only 3.9 TF/s);
* the three ky weight blocks are stacked along the matmul M dimension
  (default ``variant='mstack'``: ONE ``(3*Cout, 9C) @ (9C, Yp)`` dot per
  output row at 94% MXU row fill instead of Cout=40's 31%), with the ky
  lane shifts moved into a cheap VPU epilogue — no im2col buffer is ever
  built (``tap9``/``kfuse``/``mstack3`` variants stay selectable; all
  measured within noise in-graph);
* bias + ReLU are fused into the epilogue, and ``out_layout='xzcy'``
  writes the output directly in the next tail conv's input layout so
  chained tail convs need no transposes between them (a 1x1 prediction
  head can consume xzcy too — see ``inference.py``).

A sibling head-unit kernel, ``conv1x3x3_pool_dilated`` (kz=1 conv + bias
+ stride-1 dilated 2x2 max-pool + relu fused), shares the design and the
chainable layout; for the flagship it measured a wash vs XLA's fused head
and is not wired into the default path (docs/tpu_performance.md).

Dilation enters only as static offsets (ring stride dx, lane shifts
ky*dy), so the kernel's cost is identical for any dilation — it runs the
tail in the DILATED domain at full lane width instead of the s2bg phase
domain's ragged 134-lane tiles.

Status + measured numbers: docs/tpu_performance.md "Pallas tail-conv v2".
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def _make_kernel(C, Cout_p, dx, dy, Yp, Yo, R, n_prime, ZB, dtype,
                 variant="mstack", A=1, X_rows=None):
    """C: padded channel count; slab = ((ZB+2)*C, Yp); ring = R slabs.

    One grid cell computes ZB consecutive output z-rows at one x: the slab
    DMA and grid-step fixed costs amortise over ZB rows (measured: ZB=1 is
    per-cell-overhead-bound at ~33 us/cell).

    A = prefetch depth: number of ring DMAs kept in flight (R = 2dx+1+A).
    The s10 ablation (scripts/exp_ptail_ablate.py) decomposed the kernel
    body's floor into a ring-DMA leg (0.52 us/row) and an out-write leg
    (0.45); with A=1 the DMA leg is LATENCY-bound — one 1 MB DMA in
    flight at a time runs at ~250 GB/s vs ~800 peak — so deeper prefetch
    targets max(write, dma/A) instead."""
    SC = (ZB + 2) * C          # slab rows

    def kernel(x_hbm, w_ref, b_ref, out_ref, ring, sem, *scratch):
        if variant == "mstackd":
            stage, sem2 = scratch
        else:
            stage = scratch[0] if scratch else None
        z = pl.program_id(0)
        x = pl.program_id(1)
        n_x = pl.num_programs(1)

        def dma(row, slot):
            # one x-row slab: input rows (z*ZB .. z*ZB+ZB+1)*C at x=`row`
            return pltpu.make_async_copy(
                x_hbm.at[row, pl.ds(z * ZB * C, SC), :],
                ring.at[pl.ds(slot * SC, SC), :],
                sem.at[slot])

        @pl.when(x == 0)
        def _prime():
            # new z-row: the ring holds stale slabs — refill rows 0..2dx
            # (waited: cell 0 reads them) and launch the A-1 extra
            # in-flight rows beyond them (unwaited)
            for r in range(n_prime):
                dma(r, r % R).start()
            for a in range(1, A):
                r = n_prime - 1 + a               # rows 2dx+1 .. 2dx+A-1
                if X_rows is None or r < X_rows:
                    dma(r, r % R).start()
            for r in range(n_prime):
                dma(r, r % R).wait()

        @pl.when(x > 0)
        def _wait_inflight():
            # slab for row x+2dx was started A cells ago
            dma(x + 2 * dx, (x + 2 * dx) % R).wait()

        # keep A slabs in flight, overlapping this cell's dots. Target
        # slot (x+A+2dx) % R is provably not read by cells x..x+A-1
        # (R = 2dx+1+A keeps the live window x..x+2dx+A distinct mod R).
        @pl.when(x + A < n_x)
        def _start_next():
            dma(x + A + 2 * dx, (x + A + 2 * dx) % R).start()

        dn = (((1,), (0,)), ((), ()))
        if variant == "mstackd":
            # mstack with DOUBLE-BUFFERED ASYNC staging: the (9C, Yp)
            # stage for row zz+1 is copied ring->stage by the DMA engines
            # WHILE the MXU runs row zz's dot. Motivation (s10 probes,
            # scripts/exp_ptail_dot.py): the dot alone costs ~0.79 us/row
            # and the measured per-row total is ~1.71 us — the synchronous
            # staging copy serializes VPU-copy with MXU-dot; overlapping
            # them targets max(copy, dot) instead of their sum.
            # stage here is (2, 9C, Yp); sem2 has 6 slots (3 copies/row).
            def stage_copies(zz, buf):
                return [pltpu.make_async_copy(
                    ring.at[pl.ds(((x + kx * dx) % R) * SC + zz * C,
                                  3 * C), :],
                    stage.at[buf, pl.ds(kx * 3 * C, 3 * C), :],
                    sem2.at[buf * 3 + kx]) for kx in range(3)]

            for c in stage_copies(0, 0):
                c.start()
            for zz in range(ZB):
                buf = zz % 2
                for c in stage_copies(zz, buf):
                    c.wait()
                if zz + 1 < ZB:
                    for c in stage_copies(zz + 1, 1 - buf):
                        c.start()
                p = jax.lax.dot_general(
                    w_ref[:, :], stage[buf], dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                acc = p[0: Cout_p, 0: Yo]
                acc = acc + p[Cout_p: 2 * Cout_p, dy: dy + Yo]
                acc = acc + p[2 * Cout_p: 3 * Cout_p,
                              2 * dy: 2 * dy + Yo]
                acc = acc + b_ref[:, :1]
                out_ref[zz, 0] = jnp.maximum(acc, 0.0)
            return
        if variant == "nfold":
            # ONE dot per grid cell: all ZB output rows fold into the
            # matmul N (lane) dimension — stage is (9C, ZB*Yp), each
            # row's tap slabs occupy its own Yp-lane segment (columns of
            # a dot are independent, so per-row K content is fine). Every
            # other structural variant (mstack/mstack3/kfuse/tap9/
            # mstack2p — 1..9 dots per ROW, M fill 31..94%, RHS bytes
            # 1..3x) measured the same ~1.05 us/row, i.e. the binding
            # cost is per-row-invariant; this is the one axis that
            # divides that per-row cost by ZB.
            for zz in range(ZB):
                for kx in range(3):
                    slot = (x + kx * dx) % R
                    stage[pl.ds(kx * 3 * C, 3 * C),
                          pl.ds(zz * Yp, Yp)] = \
                        ring[pl.ds(slot * SC + zz * C, 3 * C), :]
            p = jax.lax.dot_general(
                w_ref[:, :], stage[:, :], dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            for zz in range(ZB):
                base = zz * Yp
                acc = p[0: Cout_p, base: base + Yo]
                acc = acc + p[Cout_p: 2 * Cout_p,
                              base + dy: base + dy + Yo]
                acc = acc + p[2 * Cout_p: 3 * Cout_p,
                              base + 2 * dy: base + 2 * dy + Yo]
                acc = acc + b_ref[:, :1]
                out_ref[zz, 0] = jnp.maximum(acc, 0.0)
            return
        if variant == "mstack2p":
            # two-phase: ALL zz dots first (results parked in VMEM
            # values), then all epilogues — gives Mosaic an explicit
            # opportunity to pipeline MXU dots against VPU epilogues
            # across rows instead of alternating per row
            ps = []
            for zz in range(ZB):
                p3 = None
                for kx in range(3):
                    slot = (x + kx * dx) % R
                    pk = jax.lax.dot_general(
                        w_ref[kx],
                        ring[pl.ds(slot * SC + zz * C, 3 * C), :],
                        dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                    p3 = pk if p3 is None else p3 + pk
                ps.append(p3)
            for zz in range(ZB):
                p = ps[zz]
                acc = p[0: Cout_p, 0: Yo]
                acc = acc + p[Cout_p: 2 * Cout_p, dy: dy + Yo]
                acc = acc + p[2 * Cout_p: 3 * Cout_p,
                              2 * dy: 2 * dy + Yo]
                acc = acc + b_ref[:, :1]
                out_ref[zz, 0] = jnp.maximum(acc, 0.0)
            return
        for zz in range(ZB):
            if variant == "mstack":
                # THE utilisation fix for Cout=40: stack the 3 ky weight
                # blocks along the matmul M dim (M = 3*Cout_p = 120 rows,
                # 94% MXU row fill instead of 31%) and contract all 9
                # (kz, kx) tap blocks at once (K = 9C) from the staged
                # row. Each ky product is computed over the FULL lane
                # range; the ky lane shifts move into a cheap VPU
                # epilogue (3 shifted adds in VMEM) — the 'fatn' trick,
                # but with the shift-adds in VMEM instead of HBM.
                for kx in range(3):
                    slot = (x + kx * dx) % R
                    stage[pl.ds(kx * 3 * C, 3 * C), :] = \
                        ring[pl.ds(slot * SC + zz * C, 3 * C), :]
                p = jax.lax.dot_general(
                    w_ref[:, :], stage[:, :], dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                acc = p[0: Cout_p, 0: Yo]
                acc = acc + p[Cout_p: 2 * Cout_p, dy: dy + Yo]
                acc = acc + p[2 * Cout_p: 3 * Cout_p, 2 * dy: 2 * dy + Yo]
            elif variant == "mstack3":
                # mstack without the staging copy: one M-stacked dot per
                # kx tap, reading the ring at its (dynamic, free —
                # measured) slot offset. 3 dots of (3*Cout_p, 3C) per row.
                p = None
                for kx in range(3):
                    slot = (x + kx * dx) % R
                    pk = jax.lax.dot_general(
                        w_ref[kx], ring[pl.ds(slot * SC + zz * C, 3 * C), :],
                        dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                    p = pk if p is None else p + pk
                acc = p[0: Cout_p, 0: Yo]
                acc = acc + p[Cout_p: 2 * Cout_p, dy: dy + Yo]
                acc = acc + p[2 * Cout_p: 3 * Cout_p, 2 * dy: 2 * dy + Yo]
            elif variant == "kfuse":
                # stage this row's 9 (kz, kx) tap-blocks contiguously so
                # the ky dots contract K = 9C at once: 3 MXU dots instead
                # of 9 — fewer weight (re)loads per output row at the
                # price of 3 VMEM copies (~1 MB)
                for kx in range(3):
                    slot = (x + kx * dx) % R
                    stage[pl.ds(kx * 3 * C, 3 * C), :] = \
                        ring[pl.ds(slot * SC + zz * C, 3 * C), :]
                acc = jnp.zeros((Cout_p, Yo), jnp.float32)
                for ky in range(3):
                    acc = acc + jax.lax.dot_general(
                        w_ref[ky], stage[:, ky * dy: ky * dy + Yo],
                        dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
            else:                                   # tap9
                acc = jnp.zeros((Cout_p, Yo), jnp.float32)
                for kx in range(3):
                    slot = (x + kx * dx) % R
                    u = ring[pl.ds(slot * SC + zz * C, 3 * C), :]
                    for ky in range(3):
                        acc = acc + jax.lax.dot_general(
                            w_ref[kx * 3 + ky], u[:, ky * dy: ky * dy + Yo],
                            dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
            acc = acc + b_ref[:, :1]
            out_ref[zz, 0] = jnp.maximum(acc, 0.0)

    def kernel_xz(x_hbm, w_ref, b_ref, out_ref, ring, sem, *scratch):
        # identical, but the output block is (1, ZB, Cout_p, Yp_out) —
        # xzcy layout (chained tail convs), lanes padded to 128 so the
        # next kernel's DMAs stay tile-aligned (valid lanes = Yo)
        kernel(x_hbm, w_ref, b_ref, _SwapRef(out_ref, Yo), ring, sem,
               *scratch)

    if variant not in ("mstack", "mstack3", "mstack2p", "kfuse",
                       "tap9", "nfold", "mstackd"):
        raise ValueError(f"unknown pallas tail-conv variant {variant!r}")

    return kernel, kernel_xz


class _SwapRef:
    """Adapter: out[zz, 0] writes land at out[0, zz, :, :Yo] (xzcy block,
    lane-padded — the pad lanes stay uninitialised and are never read)."""

    def __init__(self, ref, valid_y):
        self._ref = ref
        self._vy = valid_y

    def __setitem__(self, idx, val):
        zz, zero = idx
        self._ref[zero, zz, :, 0: self._vy] = val


def tail_kernel_kwargs(knobs):
    """Map a model-level ptail knobs value (``Model.set_dilated_impl`` /
    ``set_convdense_impl`` ``ptail=`` — True or a dict) to
    ``conv3x3_dilated`` kwargs. ONE definition of the knob names and
    defaults for every call site (the dilated trace in inference.py and
    the conv-dense trace in neural.Conv) — a desynchronised copy gives
    the two paths silently different kernel defaults."""
    k = knobs if isinstance(knobs, dict) else {}
    return dict(variant=k.get("variant", "mstack"),
                z_block=int(k.get("z_block", 8)),
                prefetch=int(k.get("prefetch", 1)),
                # Mosaic is TPU-only; CPU (tests) runs the kernel's
                # interpreter — exact, slow. (The sandbox TPU platform is
                # named 'axon', hence the cpu check.)
                interpret=jax.default_backend() == "cpu")


@functools.partial(jax.jit, static_argnames=("dil", "relu", "out_layout",
                                             "in_layout", "interpret",
                                             "compute_dtype", "z_block",
                                             "variant", "valid_y",
                                             "prefetch"))
def conv3x3_dilated(x, w, b, dil=(1, 1, 1), relu=True, out_layout="nczxy",
                    in_layout="nczxy", interpret=False,
                    compute_dtype="float32", z_block=8, variant="mstack",
                    valid_y=None, prefetch=1):
    """Valid-mode (3,3,3) conv, z-dilation 1, xy-dilation (dx, dy), fused
    bias + optional ReLU, as a Pallas TPU kernel.

    x: ``(1, Cin, Z, X, Y)`` (``in_layout='nczxy'``) or the kernel-native
    ``(X, Z, Cp, Yp)`` produced by a previous ``out_layout='xzcy'`` call
    (``in_layout='xzcy'`` — Cp/Yp already padded).
    w: (Cout, Cin, 3, 3, 3); b: (Cout,).
    Returns (1, Cout, Zo, Xo, Yo) or, with ``out_layout='xzcy'``,
    (Xo, Zo, Cp_out, Yp_out) ready to chain (caller slices C/Y).
    """
    dz, dx, dy = dil
    if dz != 1:
        raise ValueError("pallas tail conv: z-dilation must be 1")
    cd = jnp.dtype(compute_dtype)
    c_align = 16 if cd == jnp.bfloat16 else 8
    Cout = w.shape[0]
    Cin = w.shape[1]

    if in_layout == "nczxy":
        _, _, Z, X, Y = x.shape
        C = _round_up(Cin, c_align)
        Yp = _round_up(Y, 128)
        xt = jnp.transpose(x[0], (2, 1, 0, 3))        # (X, Z, Cin, Y)
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, C - Cin), (0, Yp - Y)))
        xt = xt.reshape(X, Z * C, Yp)
    elif in_layout == "xzcy":
        X, Z, C, Yp = x.shape
        if C < Cin or C % c_align:
            raise ValueError(f"xzcy input C={C} incompatible with "
                             f"Cin={Cin} (align {c_align})")
        Y = int(valid_y) if valid_y else Yp   # pad lanes carry garbage
        xt = x.reshape(X, Z * C, Yp)
    else:
        raise ValueError(in_layout)
    xt = xt.astype(cd)

    Zo, Xo, Yo = Z - 2, X - 2 * dx, Y - 2 * dy
    if min(Zo, Xo, Yo) < 1:
        raise ValueError(f"volume too small for fov: {(Z, X, Y)} dil {dil}")
    Cout_p = _round_up(Cout, c_align)

    # z-block: pad Z so each grid cell owns exactly ZB output rows
    ZB = max(1, min(int(z_block), Zo))
    Zo_p = _round_up(Zo, ZB)
    if Zo_p + 2 > Z:
        xt = jnp.pad(xt, ((0, 0), (0, (Zo_p + 2 - Z) * C), (0, 0)))

    if variant in ("kfuse", "mstack", "nfold", "mstackd"):
        # weights as 3 ky blocks of (Cout_p, 9C): cols kx*3C + kz*C + c
        wt = jnp.transpose(w.astype(cd), (4, 3, 0, 2, 1))  # ky,kx,O,kz,c
        wt = jnp.pad(wt, ((0, 0),) * 4 + ((0, C - Cin),))
        wt = jnp.transpose(wt.reshape(3, 3, Cout, 3 * C), (0, 2, 1, 3))
        wb = jnp.zeros((3, Cout_p, 9 * C), cd)
        wb = wb.at[:, :Cout, :].set(wt.reshape(3, Cout, 9 * C))
        if variant in ("mstack", "nfold", "mstackd"):
            # ...then stacked along M: (3*Cout_p, 9C) — one dot per row.
            # (Padding M/K to 128 multiples was measured and REJECTED:
            # an isolated Mosaic dot microbenchmark showed (128,384) dots
            # 1.8-2.6x faster than (120,360), but in-graph the padded
            # kernel is SLOWER (148 vs 143 ms at 112x496x496) — the
            # kernel is not dot-throughput-bound; docs/tpu_performance.md)
            wb = wb.reshape(3 * Cout_p, 9 * C)
    elif variant in ("mstack3", "mstack2p"):
        # per-kx M-stacked blocks: (3 kx, 3*Cout_p, 3C)
        wt = jnp.transpose(w.astype(cd), (3, 4, 0, 2, 1))  # kx,ky,O,kz,c
        wt = jnp.pad(wt, ((0, 0),) * 4 + ((0, C - Cin),)).reshape(
            3, 3, Cout, 3 * C)
        wb = jnp.zeros((3, 3, Cout_p, 3 * C), cd)
        wb = wb.at[:, :, :Cout, :].set(wt)
        wb = wb.reshape(3, 3 * Cout_p, 3 * C)
    else:
        # weights as 9 (kx, ky) blocks of (Cout_p, 3C): rows kz*C + c
        wb = jnp.zeros((3, 3, Cout_p, 3 * C), cd)
        wt = jnp.transpose(w.astype(cd), (3, 4, 0, 2, 1))  # kx,ky,O,kz,c
        wb = wb.at[:, :, :Cout, :].set(
            jnp.pad(wt, ((0, 0),) * 4 + ((0, C - Cin),)).reshape(
                3, 3, Cout, 3 * C))
        wb = wb.reshape(9, Cout_p, 3 * C)
    bp = jnp.zeros((Cout_p, 1), jnp.float32).at[:Cout, 0].set(
        b.astype(jnp.float32))
    if not relu:
        # the kernel's epilogue is max(acc+b, 0); shift so it is identity:
        # handled by caller instead (relu=False unsupported in-kernel)
        raise ValueError("pallas tail conv: relu=False not supported")

    A = max(1, int(prefetch))
    R = 2 * dx + 1 + A
    n_prime = 2 * dx + 1                      # rows 0..2dx
    kernel, kernel_xz = _make_kernel(C, Cout_p, dx, dy, Yp, Yo, R, n_prime,
                                     ZB, cd, variant=variant, A=A,
                                     X_rows=int(xt.shape[0]))

    if out_layout == "xzcy":
        Yo_p = _round_up(Yo, 128)
        out_spec = pl.BlockSpec((1, ZB, Cout_p, Yo_p),
                                lambda z, x: (x, z, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Xo, Zo_p, Cout_p, Yo_p),
                                         jnp.float32)
        kfn = kernel_xz
    else:
        out_spec = pl.BlockSpec((ZB, 1, Cout_p, Yo),
                                lambda z, x: (z, x, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Zo_p, Xo, Cout_p, Yo), jnp.float32)
        kfn = kernel

    out = pl.pallas_call(
        kfn,
        grid=(Zo_p // ZB, Xo),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((R * (ZB + 2) * C, Yp), cd),
            pltpu.SemaphoreType.DMA((R,)),
        ] + ([pltpu.VMEM((9 * C, ZB * Yp), cd)] if variant == "nfold"
             else [pltpu.VMEM((2, 9 * C, Yp), cd),
                   pltpu.SemaphoreType.DMA((6,))]
             if variant == "mstackd"
             else [pltpu.VMEM((9 * C, Yp), cd)]
             if variant in ("kfuse", "mstack") else []),
        cost_estimate=pl.CostEstimate(
            flops=2 * Zo * Xo * Yo * Cin * Cout * 27,
            bytes_accessed=(Zo * Xo * 3 * C * Yp + Zo * Xo * Cout_p * Yo)
            * cd.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xt, wb, bp)

    if out_layout == "xzcy":
        return out[:, :Zo]
    return jnp.transpose(out[:Zo, :, :Cout, :], (2, 0, 1, 3))[None]


def conv3x3_dilated_reference(x, w, b, dil=(1, 1, 1)):
    """lax.conv_general_dilated oracle for the kernel (tests/A-B)."""
    from jax import lax
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NCDHW", "OIDHW", "NCDHW"))
    y = lax.conv_general_dilated(x, w, (1, 1, 1), "VALID",
                                 rhs_dilation=dil, dimension_numbers=dn)
    return jnp.maximum(y + b.reshape(1, -1, 1, 1, 1), 0.0)


def _make_head_kernel(C, Co, d, dp, Yp, ZB, pool, dtype):
    """Head-unit kernel body: kz=1 (1,3,3) conv + optional (2,2) stride-1
    dilated max-pool, per x-row, z-blocked. See conv1x3x3_pool_dilated."""
    SC = ZB * C                  # input slab rows per x position
    SO = ZB * Co                 # conv-row slab rows
    R_in = 2 * d + dp + 2
    R_c = dp + 2
    Wc = Yp - 2 * d              # conv-valid lane width
    Wp = Wc - dp                 # pool-valid lane width

    def kernel(x_hbm, w_ref, b_ref, out_ref, ring_in, ring_c, stage, sem):
        zb = pl.program_id(0)
        x = pl.program_id(1)
        n_x = pl.num_programs(1)

        def dma(row, slot):
            return pltpu.make_async_copy(
                x_hbm.at[row, pl.ds(zb * SC, SC), :],
                ring_in.at[pl.ds(slot * SC, SC), :],
                sem.at[slot])

        def conv_row(v):
            """Conv row v (all ZB z-slices) -> ring_c slot v % R_c.
            ky weight blocks are M-stacked (the tail kernel's 'mstack'):
            one (3*Co, 3*C) dot per z-slice, ky lane shifts as VPU adds."""
            for zz in range(ZB):
                for kx in range(3):
                    s_in = (v + kx * d) % R_in
                    stage[pl.ds(kx * C, C), :] = \
                        ring_in[pl.ds(s_in * SC + zz * C, C), :]
                p = jax.lax.dot_general(
                    w_ref[:, :], stage[:, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                c = (p[0:Co, 0:Wc] + p[Co:2 * Co, d:d + Wc]
                     + p[2 * Co:3 * Co, 2 * d:2 * d + Wc]
                     + b_ref[:, :1])
                if pool == 1:
                    out_ref[0, zz, :, 0:Wc] = jnp.maximum(c, 0.0)
                else:
                    ring_c[pl.ds((v % R_c) * SO + zz * Co, Co), 0:Wc] = c

        @pl.when(x == 0)
        def _prime():
            for r in range(2 * d + dp + 1):
                dma(r, r % R_in).start()
            for r in range(2 * d + dp + 1):
                dma(r, r % R_in).wait()
            if pool == 2:
                for v in range(dp):
                    conv_row(v)

        @pl.when(x > 0)
        def _wait_inflight():
            dma(x + 2 * d + dp, (x + 2 * d + dp) % R_in).wait()

        @pl.when(x + 1 < n_x)
        def _start_next():
            dma(x + 1 + 2 * d + dp, (x + 1 + 2 * d + dp) % R_in).start()

        conv_row(x + dp)
        if pool == 2:
            # pool over conv rows x, x+dp and lane shift d; relu after
            # pool (the reference's pooling-before-activation order —
            # identical for monotone relu)
            a = ring_c[pl.ds((x % R_c) * SO, SO), :]
            bb = ring_c[pl.ds(((x + dp) % R_c) * SO, SO), :]
            t = jnp.maximum(a, bb)
            o = jnp.maximum(t[:, 0:Wp], t[:, d:d + Wp])
            out_ref[0, :, :, 0:Wp] = jnp.maximum(o, 0.0).reshape(
                ZB, Co, Wp)

    return kernel


@functools.partial(jax.jit, static_argnames=("dil", "pool", "relu",
                                             "in_layout", "interpret",
                                             "z_block", "valid_y"))
def conv1x3x3_pool_dilated(x, w, b, dil=(1, 1), pool=2, relu=True,
                           in_layout="nczxy", valid_y=None, z_block=8,
                           interpret=False):
    """Head-unit Pallas kernel: valid-mode (1,3,3) conv (xy-dilation
    ``dil``) + bias + optional stride-1 xy-dilated (2,2) max-pool + ReLU,
    fused in one pass — the dense sweep's kz=1 head layers
    (conv0+pool0 / conv1+pool1), which in XLA cost several full-volume
    HBM round-trips each (reference mechanism:
    ``elektronn2/neuromancer/computations.py::conv`` + ``pooling``).

    x: ``(1, Cin, Z, X, Y)`` or a previous unit's xzcy output
    ``(X, Z, Cp, Yp)`` (pass ``valid_y``). Output is ALWAYS xzcy
    ``(Xo, Z_p, Cout_p, Yp)`` with valid lanes ``valid_y - 2d - d*(pool-1)``
    — ready to chain into the next head unit or the tail kernel
    (``conv3x3_dilated(in_layout='xzcy')``).
    """
    d = int(dil[-1])
    if len(dil) == 2:
        dxy = tuple(int(v) for v in dil)
    else:
        if dil[0] != 1:
            raise ValueError("head kernel: z-dilation must be 1")
        dxy = (int(dil[1]), int(dil[2]))
    if dxy[0] != dxy[1]:
        raise ValueError(f"head kernel: anisotropic xy dilation {dxy}")
    d = dxy[0]
    if pool not in (1, 2):
        raise ValueError(f"head kernel: pool must be 1 or 2, got {pool}")
    if not relu:
        raise ValueError("head kernel: relu=False not supported")
    cd = jnp.dtype("float32")
    Cout, Cin = w.shape[0], w.shape[1]
    if w.ndim == 5:
        if w.shape[2] != 1 or w.shape[3:] != (3, 3):
            raise ValueError(f"head kernel needs (1,3,3), got {w.shape}")
        w2 = w[:, :, 0]
    else:
        w2 = w
    C = _round_up(Cin, 8)
    Co = _round_up(Cout, 8)

    if in_layout == "nczxy":
        _, _, Z, X, Y = x.shape
        Yp = _round_up(Y, 128)
        xt = jnp.transpose(x[0], (2, 1, 0, 3))          # (X, Z, Cin, Y)
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, C - Cin), (0, Yp - Y)))
    elif in_layout == "xzcy":
        X, Z, Cp, Yp = x.shape
        if Cp != C:
            raise ValueError(f"xzcy input C={Cp}, expected {C}")
        Y = int(valid_y) if valid_y else Yp
        xt = x
    else:
        raise ValueError(in_layout)

    dp = d * (pool - 1)
    Xo = X - 2 * d - dp
    Yo = Y - 2 * d - dp
    if min(Xo, Yo, Z) < 1:
        raise ValueError(f"volume too small: {(Z, X, Y)} dil {d} "
                         f"pool {pool}")
    ZB = max(1, min(int(z_block), Z))
    Z_p = _round_up(Z, ZB)
    if Z_p > Z:
        xt = jnp.pad(xt, ((0, 0), (0, Z_p - Z), (0, 0), (0, 0)))
    xt = xt.reshape(X, Z_p * C, Yp).astype(cd)

    # weights: ky blocks M-stacked — (3*Co, 3kx*C)
    wt = jnp.transpose(w2.astype(cd), (3, 2, 0, 1))     # (ky, kx, O, c)
    wt = jnp.pad(wt, ((0, 0), (0, 0), (0, 0), (0, C - Cin)))
    wt = jnp.transpose(wt, (0, 2, 1, 3))                # (ky, O, kx, c)
    wb = jnp.zeros((3, Co, 3 * C), cd)
    wb = wb.at[:, :Cout, :].set(wt.reshape(3, Cout, 3 * C))
    wb = wb.reshape(3 * Co, 3 * C)
    bp = jnp.zeros((Co, 1), jnp.float32).at[:Cout, 0].set(
        b.astype(jnp.float32))

    R_in = 2 * d + dp + 2
    R_c = dp + 2
    kernel = _make_head_kernel(C, Co, d, dp, Yp, ZB, pool, cd)
    out = pl.pallas_call(
        kernel,
        grid=(Z_p // ZB, Xo),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ZB, Co, Yp),
                               lambda zb, x: (x, zb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Xo, Z_p, Co, Yp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R_in * ZB * C, Yp), cd),
            pltpu.VMEM((max(R_c * ZB * Co, 8) if pool == 2 else 8, Yp),
                       cd),
            pltpu.VMEM((3 * C, Yp), cd),
            pltpu.SemaphoreType.DMA((R_in,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Z * Xo * Yo * Cin * Cout * 9,
            bytes_accessed=(X * Z * C * Yp + Xo * Z * Co * Yp)
            * cd.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xt, wb, bp)
    return out


def conv1x3x3_pool_reference(x, w, b, dil=(1, 1), pool=2):
    """lax oracle for the head unit (conv+bias -> pool -> relu)."""
    from jax import lax
    d = dil[-1]
    w5 = w if w.ndim == 5 else w[:, :, None]
    dn = lax.conv_dimension_numbers(x.shape, w5.shape,
                                    ("NCDHW", "OIDHW", "NCDHW"))
    y = lax.conv_general_dilated(x, w5, (1, 1, 1), "VALID",
                                 rhs_dilation=(1, d, d),
                                 dimension_numbers=dn)
    y = y + b.reshape(1, -1, 1, 1, 1)
    if pool == 2:
        y = lax.reduce_window(y, -jnp.inf, lax.max, (1, 1, 1, 2, 2),
                              (1, 1, 1, 1, 1), "VALID",
                              window_dilation=(1, 1, 1, d, d))
    return jnp.maximum(y, 0.0)
