"""Wide-graph glue attribution + harvest experiments (VERDICT r4 #1).

The r4 campaign profiled the wide U-Net dispatch by hlo_category:
conv 52% / data formatting 19.3% / loop fusions 19.1% / slice+pad+out
~9% — i.e. ~2x of serving throughput sits in non-conv glue. This
script drills one level deeper (per-OP attribution, not categories)
and A/Bs targeted graph-surgery variants against the default lowering.

Usage:
  python scripts/exp_wide_glue.py --profile          # op-level capture
  python scripts/exp_wide_glue.py --variants         # A/B experiments
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _sustained(call, K=4):
    import jax.numpy as jnp
    out = call()
    float(jnp.sum(out))
    float(jnp.sum(call()))
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(K):
            acc = acc + jnp.sum(call())
        assert np.isfinite(float(acc))
        dt = (time.perf_counter() - t0) / K
        best = dt if best is None else min(best, dt)
    return out, best


def build(slab=(32, 256, 256)):
    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.neuromancer.inference import (
        convolutional_dense_forward)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))
    from unet3d_wide import create_model

    model = create_model(batch=1)
    vol = jax.random.uniform(jax.random.PRNGKey(0), (1, 1, *slab),
                             jnp.float32)
    float(jnp.sum(vol))
    fn = jax.jit(lambda p, s, v: convolutional_dense_forward(
        model, v, batch=True, params=p, state=s))
    return model, vol, fn


def aggregate_trace(d):
    """Aggregate device-op durations by (hlo_category, op name) from a
    jax.profiler trace dir; returns {(cat, name): usec}."""
    ev = {}
    for fpath in glob.glob(f"{d}/**/*.trace.json.gz", recursive=True):
        with gzip.open(fpath, "rt") as fh:
            tr = json.load(fh)
        for e in tr.get("traceEvents", []):
            if e.get("ph") != "X":
                continue
            cat = (e.get("args", {}) or {}).get("hlo_category")
            if cat is None:
                continue
            key = (cat, e.get("name", ""))
            ev[key] = ev.get(key, 0) + e.get("dur", 0)
    return ev


def print_trace_summary(ev, top=25):
    total = sum(ev.values())
    print(f"total device-op time {total/1e3:.1f} ms")
    bycat = {}
    for (cat, name), dur in ev.items():
        bycat[cat] = bycat.get(cat, 0) + dur
    for cat, dur in sorted(bycat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<28s} {dur/1e3:8.2f} ms  {100*dur/total:5.1f}%")
    print(f"top {top} ops:")
    for (cat, name), dur in sorted(ev.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {dur/1e3:8.2f} ms  {100*dur/total:5.1f}%  [{cat}] "
              f"{name[:110]}")
    return bycat, total


def profile(slab, impl=None):
    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.neuromancer.inference import (
        convolutional_dense_forward)
    model, vol, fn = build(slab)
    if impl:
        kw = dict(kv.split("=") for kv in impl.split(","))
        kw = {k: (v == "True" or (v if v in ("dilate", "d2s") else False))
              for k, v in kw.items()}
        model.set_convdense_impl(**kw)
        fn = jax.jit(lambda p, s, v: convolutional_dense_forward(
            model, v, batch=True, params=p, state=s))
    out, dt = _sustained(lambda: fn(model.params, model.state, vol))
    n_vox = float(np.prod(slab))
    print(json.dumps({"leg": "default", "ms": round(dt * 1e3, 2),
                      "Mvox_s": round(n_vox / dt / 1e6, 1)}), flush=True)
    d = "/tmp/prof_wide_glue"
    os.system(f"rm -rf {d}")
    with jax.profiler.trace(d):
        acc = jnp.float32(0)
        for _ in range(3):
            acc = acc + jnp.sum(fn(model.params, model.state, vol))
        float(acc)
    # aggregate device events by op name from the perfetto trace
    files = glob.glob(f"{d}/**/*.trace.json.gz", recursive=True)
    ev = {}
    for fpath in files:
        with gzip.open(fpath, "rt") as fh:
            tr = json.load(fh)
        for e in tr.get("traceEvents", []):
            if e.get("ph") != "X":
                continue
            # device lanes only: XLA Ops thread names
            name = e.get("name", "")
            dur = e.get("dur", 0)
            args = e.get("args", {}) or {}
            cat = args.get("hlo_category", None)
            if cat is None:
                continue
            key = (cat, name)
            ev[key] = ev.get(key, 0) + dur
    total = sum(ev.values())
    print(f"\ntotal device-op time {total/1e3:.1f} ms over 3 dispatches")
    bycat = {}
    for (cat, name), dur in ev.items():
        bycat[cat] = bycat.get(cat, 0) + dur
    for cat, dur in sorted(bycat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<28s} {dur/1e3:8.2f} ms  {100*dur/total:5.1f}%")
    print("\ntop 30 ops:")
    for (cat, name), dur in sorted(ev.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {dur/1e3:8.2f} ms  {100*dur/total:5.1f}%  [{cat}] "
              f"{name[:110]}")


def variants(slab):
    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.neuromancer.inference import (
        convolutional_dense_forward)
    model, vol, _ = build(slab)
    n_vox = float(np.prod(slab))
    combos = [
        ("default", {}),
        ("zfold", dict(zfold=True)),
        ("poolslice", dict(poolslice=True)),
        ("skipsum", dict(skipsum=True)),
        ("poolslice+skipsum", dict(poolslice=True, skipsum=True)),
        ("zfold+skipsum", dict(zfold=True, skipsum=True)),
    ]
    ref = None
    for name, kw in combos:
        model.set_convdense_impl(**kw)
        fn = jax.jit(lambda p, s, v: convolutional_dense_forward(
            model, v, batch=True, params=p, state=s))
        try:
            out, dt = _sustained(
                lambda: fn(model.params, model.state, vol))
        except Exception as e:
            print(json.dumps({"leg": name, "error":
                              f"{type(e).__name__}: {str(e)[:120]}"}),
                  flush=True)
            model.set_convdense_impl()
            continue
        if ref is None:
            ref = out
            dmax = 0.0
        else:
            dmax = float(jnp.max(jnp.abs(out - ref)))
        print(json.dumps({"leg": name, "ms": round(dt * 1e3, 2),
                          "Mvox_s": round(n_vox / dt / 1e6, 1),
                          "maxdiff_vs_default": round(dmax, 7)}),
              flush=True)
        model.set_convdense_impl()


def sweep(slabs, kw, dtype=None, act=False):
    """One impl across a slab-geometry list (the frontier search)."""
    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.neuromancer.inference import (
        convolutional_dense_forward)
    best = (None, 0.0)
    for slab in slabs:
        try:
            model, vol, _ = build(slab)
            model.set_convdense_impl(**kw)
            if dtype:
                model.set_compute_dtype(dtype, activations=act)
            fn = jax.jit(lambda p, s, v: convolutional_dense_forward(
                model, v, batch=True, params=p, state=s))
            out, dt = _sustained(
                lambda: fn(model.params, model.state, vol))
            mvox = float(np.prod(slab)) / dt / 1e6
            # 0.919 MFLOP/vox (the wide U-Net's per-voxel conv cost —
            # docs/tpu_performance.md r5 table): TF/s = Mvox/s x 0.919
            print(json.dumps({"slab": list(slab),
                              "ms": round(dt * 1e3, 2),
                              "Mvox_s": round(mvox, 1),
                              "TF_s": round(mvox * 0.919, 1),
                              "pct_bf16_peak":
                              round(mvox * 0.919 / 197 * 100, 1)}),
                  flush=True)
            if mvox > best[1]:
                best = (slab, mvox)
            del vol, out
        except Exception as e:   # noqa: BLE001 — OOM/compile tolerant
            print(json.dumps({"slab": list(slab), "error":
                              f"{type(e).__name__}: {str(e)[:110]}"}),
                  flush=True)
    print(json.dumps({"champion": list(best[0] or ()),
                      "Mvox_s": round(best[1], 1)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--variants", action="store_true")
    ap.add_argument("--sweep", default=None,
                    help="semicolon list of slabs, e.g. "
                         "'128,448,448;160,416,416'")
    ap.add_argument("--dtype", default=None,
                    help="serving compute dtype for --sweep "
                         "(e.g. bfloat16)")
    ap.add_argument("--act", action="store_true",
                    help="with --dtype: store activations in it too")
    ap.add_argument("--slab", default="32,256,256")
    ap.add_argument("--impl", default=None,
                    help="e.g. zfold=True,skipsum=True")
    args = ap.parse_args()
    slab = tuple(int(v) for v in args.slab.split(","))
    from elektronn2_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    if args.profile:
        profile(slab, args.impl)
    if args.variants:
        variants(slab)
    if args.sweep:
        kw = {}
        if args.impl:
            kw = dict(kv.split("=") for kv in args.impl.split(","))
            kw = {k: v == "True" if v in ("True", "False") else v
                  for k, v in kw.items()}
        slabs = [tuple(int(v) for v in s.split(","))
                 for s in args.sweep.split(";")]
        sweep(slabs, kw, dtype=args.dtype, act=args.act)


if __name__ == "__main__":
    main()
