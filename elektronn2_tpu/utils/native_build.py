"""Shared first-use g++ build helper for the native cores.

Policy (same for every .so in the tree — warp gather, MALIS): compile on
first use next to the source, cache the .so, degrade gracefully when no
compiler is available (callers catch and fall back to numpy). The build
goes to a per-process temp name followed by an atomic ``os.rename`` so
concurrent first users (forked data workers) never ``CDLL`` a partially
written library.
"""

from __future__ import annotations

import os
import subprocess

from elektronn2_tpu.log import logger


def build_shared(src, so, extra_flags=()):
    """Compile ``src`` into shared library ``so`` (atomic replace)."""
    tmp = f"{so}.tmp.{os.getpid()}"
    cmd = (["g++", "-O3", "-std=c++17", "-shared", "-fPIC"]
           + list(extra_flags) + [src, "-o", tmp])
    logger.info("building native core: " + " ".join(cmd))
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.rename(tmp, so)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
