"""Compatibility shim: the reference's import surface (``elektronn2.*``),
backed by ``elektronn2_tpu``.

Reference users' experiment configs and scripts import
``elektronn2.neuromancer`` / ``elektronn2.data`` / ``elektronn2.training``
/ ``elektronn2.utils`` (SURVEY.md §2 layer map). This package registers
every ``elektronn2_tpu`` submodule under the corresponding ``elektronn2``
name in ``sys.modules`` — the SAME module objects, not copies, so
singletons (``model_manager``, logging, config) stay single. Deep imports
(``from elektronn2.neuromancer.node_basic import Input``) and attribute
access both work.

The import is lazy per subpackage tree: a meta-path hook resolves
``elektronn2.X`` to the already-initialised ``elektronn2_tpu.X`` on first
use, so ``import elektronn2`` stays cheap.
"""

import importlib
import importlib.abc
import importlib.machinery
import sys

_BASE = "elektronn2_tpu"


class _AliasLoader(importlib.abc.Loader):
    """Return the existing real module; exec is a no-op. __name__/__spec__
    of the real module are restored afterwards (the import machinery
    overwrites them on the object it gets from create_module)."""

    def __init__(self, real):
        self._real = real
        self._saved = {k: real.__dict__.get(k)
                       for k in ("__name__", "__spec__", "__package__",
                                 "__loader__")}

    def create_module(self, spec):
        return self._real

    def exec_module(self, module):
        # undo the attribute rewrites _init_module_attrs applied for the
        # alias name — the canonical identity must stay elektronn2_tpu.*
        for k, v in self._saved.items():
            if v is not None:
                module.__dict__[k] = v

    def is_package(self, fullname):
        return hasattr(self._real, "__path__")


class _AliasFinder(importlib.abc.MetaPathFinder):
    _prefix = __name__ + "."

    def find_spec(self, fullname, path=None, target=None):
        if not fullname.startswith(self._prefix):
            return None
        real_name = _BASE + "." + fullname[len(self._prefix):]
        try:
            real = importlib.import_module(real_name)
        except ImportError as e:
            # only a genuinely missing elektronn2_tpu submodule maps to
            # "no such module"; a dependency failing INSIDE a real module
            # must propagate, not masquerade as a missing shim name
            missing = getattr(e, "name", None) or ""
            if missing == real_name or (real_name.startswith(missing + ".")
                                        and missing.startswith(_BASE)):
                return None
            raise
        loader = _AliasLoader(real)
        return importlib.machinery.ModuleSpec(
            fullname, loader, is_package=loader.is_package(fullname))


sys.meta_path.insert(0, _AliasFinder())

# top level: same public names as elektronn2_tpu
_base_mod = importlib.import_module(_BASE)
globals().update({k: v for k, v in _base_mod.__dict__.items()
                  if not k.startswith("_")})
__version__ = getattr(_base_mod, "__version__", "2.0")
__all__ = getattr(_base_mod, "__all__",
                  [k for k in _base_mod.__dict__ if not k.startswith("_")])
