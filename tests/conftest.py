"""Test configuration: force an 8-device virtual CPU mesh BEFORE backends init.

This mirrors the driver's multi-chip dry-run environment (SURVEY.md §5.d):
distributed behaviour (DP gradients, halo exchange, sharded MFP) is tested on
host CPU devices without a TPU pod.

NOTE: the sandbox's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel),
so the env var alone is not enough — we must override via jax.config.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags +
                               " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _check_cpu_mesh():
    assert jax.local_device_count() == 8, (
        "tests expect an 8-device virtual CPU mesh; got "
        f"{jax.devices()}")


@pytest.fixture
def rng():
    return np.random.RandomState(42)
