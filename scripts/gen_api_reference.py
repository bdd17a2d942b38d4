#!/usr/bin/env python
"""Generate docs/api_reference.md from the package's live docstrings.

One section per module (reference layer map order — SURVEY.md §2), one
row per public symbol DEFINED in that module (re-exports are listed once,
at their definition site), with the first docstring line. Class rows are
followed by their public methods (indented) so the node/model surfaces
read like the reference's Sphinx API docs.

Run after API changes:  python scripts/gen_api_reference.py
tests/test_utils_misc.py::test_api_reference_current fails when stale.
"""

import importlib
import inspect
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# layer-map order (SURVEY.md §2), with one-line section blurbs
MODULES = [
    ("Graph / node layer (neuromancer)", [
        "elektronn2_tpu.neuromancer.node_basic",
        "elektronn2_tpu.neuromancer.neural",
        "elektronn2_tpu.neuromancer.loss",
        "elektronn2_tpu.neuromancer.various",
        "elektronn2_tpu.neuromancer.graphutils",
        "elektronn2_tpu.neuromancer.graphmanager",
        "elektronn2_tpu.neuromancer.variables",
    ]),
    ("Model / optimiser / inference", [
        "elektronn2_tpu.neuromancer.model",
        "elektronn2_tpu.neuromancer.optimiser",
        "elektronn2_tpu.neuromancer.inference",
    ]),
    ("Ops (XLA/Pallas compute layer)", [
        "elektronn2_tpu.ops.conv",
        "elektronn2_tpu.ops.mfp",
        "elektronn2_tpu.ops.warp",
        "elektronn2_tpu.ops.activations",
    ]),
    ("Data pipeline", [
        "elektronn2_tpu.data.cnndata",
        "elektronn2_tpu.data.transformations",
        "elektronn2_tpu.data.image",
        "elektronn2_tpu.data.knossos_array",
        "elektronn2_tpu.data.skeleton",
        "elektronn2_tpu.data.tracing_utils",
        "elektronn2_tpu.data.traindata",
    ]),
    ("Training", [
        "elektronn2_tpu.training.trainer",
        "elektronn2_tpu.training.fused_loop",
        "elektronn2_tpu.training.parallelisation",
        "elektronn2_tpu.training.trainutils",
    ]),
    ("Parallelism (mesh / collectives)", [
        "elektronn2_tpu.parallel.mesh",
        "elektronn2_tpu.parallel.halo",
        "elektronn2_tpu.parallel.spatial_train",
        "elektronn2_tpu.parallel.pipeline",
        "elektronn2_tpu.parallel.multihost",
    ]),
    ("MALIS structured loss", [
        "elektronn2_tpu.malis",
    ]),
    ("Utilities & observability", [
        "elektronn2_tpu.utils.basic",
        "elektronn2_tpu.utils.cnncalculator",
        "elektronn2_tpu.utils.plotting",
        "elektronn2_tpu.utils.profiling",
        "elektronn2_tpu.utils.locking",
        "elektronn2_tpu.utils.legacy",
        "elektronn2_tpu.utils.d3viz",
        "elektronn2_tpu.utils.gpu",
        "elektronn2_tpu.config",
    ]),
    ("CLIs", [
        "elektronn2_tpu.scripts.train",
        "elektronn2_tpu.scripts.predict",
        "elektronn2_tpu.scripts.profile",
    ]),
]


def _first_line(obj):
    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    line = doc.strip().splitlines()[0].strip()
    return line.replace("|", "\\|")


def _public_symbols(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in sorted(names):
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        if not (inspect.isclass(obj) or inspect.isfunction(obj)):
            continue
        # list symbols at their definition site only (skip re-exports),
        # except package __init__ aggregators (malis)
        defined_in = getattr(obj, "__module__", mod.__name__)
        if defined_in != mod.__name__ and not mod.__name__.endswith(
                defined_in.rsplit(".", 1)[-1]):
            if not (mod.__file__ or "").endswith("__init__.py"):
                continue
        out.append((n, obj))
    return out


def _methods(cls):
    rows = []
    for n, m in sorted(vars(cls).items()):
        if n.startswith("_") or not callable(m):
            continue
        rows.append((n, _first_line(m)))
    return rows


def generate():
    buf = io.StringIO()
    w = buf.write
    w("# API reference\n\n")
    w("Generated from live docstrings by `scripts/gen_api_reference.py` "
      "— do not edit by hand (CI checks freshness). Symbols keep the "
      "reference's names and placements (SURVEY.md §3); reference "
      "anchors live in each docstring.\n")
    for section, mods in MODULES:
        w(f"\n## {section}\n")
        for mname in mods:
            mod = importlib.import_module(mname)
            w(f"\n### `{mname}`\n\n")
            mdoc = _first_line(mod)
            if mdoc:
                w(f"{mdoc}\n\n")
            syms = _public_symbols(mod)
            if not syms:
                w("*(no public symbols — CLI entry module)*\n")
                continue
            w("| Symbol | Summary |\n|---|---|\n")
            for n, obj in syms:
                kind = "class" if inspect.isclass(obj) else "def"
                w(f"| `{kind} {n}` | {_first_line(obj)} |\n")
                if inspect.isclass(obj) and mname in (
                        "elektronn2_tpu.neuromancer.model",
                        "elektronn2_tpu.training.trainer",
                        "elektronn2_tpu.data.cnndata",
                        "elektronn2_tpu.data.tracing_utils"):
                    for mn, md in _methods(obj):
                        w(f"| &nbsp;&nbsp;`.{mn}()` | {md} |\n")
    return buf.getvalue()


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "api_reference.md")
    text = generate()
    if "--check" in sys.argv:
        with open(out) as f:
            if f.read() != text:
                print("docs/api_reference.md is STALE — regenerate with "
                      "python scripts/gen_api_reference.py")
                return 1
        print("docs/api_reference.md is current")
        return 0
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {out} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
