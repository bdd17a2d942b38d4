"""Pallas batched trilinear patch extraction (ops/pallas_extract.py).

The kernel is the r3 tracer-rollout headline (vmapped dynamic_slice
extraction measured 97% of the rollout; the kernel bought 4.9x end to
end — docs/tpu_performance.md). These tests run it in INTERPRET mode on
the CPU mesh against the exact `DeviceTracer._extract` oracle; on-chip
exactness is re-checked by the verify drives and scripts/exp_tracer_*.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from elektronn2_tpu.ops.pallas_extract import (extract_eligible,
                                               trilinear_patches_pallas)


def _oracle(vol, pos, patch):
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    dt = object.__new__(DeviceTracer)
    dt.patch_size = patch
    return jax.vmap(lambda q: dt._extract(vol, q))(pos)


def test_kernel_matches_extract_oracle(rng):
    patch = (8, 8, 8)
    vol = jnp.asarray(rng.rand(1, 24, 24, 256), jnp.float32)
    pos = jnp.asarray(
        np.concatenate([
            rng.uniform(6, 18, (13, 3)),
            [[5.0, 5.0, 250.0]],         # y near the far edge (clip leg)
            [[-2.0, 30.0, 1.0]],         # fully out of bounds (clip leg)
            [[6.0, 6.0, 120.5]],         # y span crossing a 128 tile
        ]).astype(np.float32))
    want = _oracle(vol, pos, patch)
    got = trilinear_patches_pallas(vol, pos, patch, interpret=True)
    assert got.shape == (16, 1, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_kernel_multichannel(rng):
    patch = (4, 4, 4)
    vol = jnp.asarray(rng.rand(2, 16, 16, 256), jnp.float32)
    pos = jnp.asarray(rng.uniform(4, 12, (8, 3)), jnp.float32)
    want = _oracle(vol, pos, patch)
    got = trilinear_patches_pallas(vol, pos, patch, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_eligibility_gates():
    f32 = jnp.float32
    assert extract_eligible((1, 64, 64, 256), f32, (16, 16, 16))
    # lane dim not 128-aligned / too small
    assert not extract_eligible((1, 64, 64, 200), f32, (16, 16, 16))
    assert not extract_eligible((1, 64, 64, 128), f32, (16, 16, 16))
    # sublane dim not 8-aligned
    assert not extract_eligible((1, 64, 60, 256), f32, (16, 16, 16))
    # z too small for the interpolation slab
    assert not extract_eligible((1, 16, 64, 256), f32, (16, 16, 16))
    assert not extract_eligible((1, 64, 64, 256), jnp.bfloat16,
                                (16, 16, 16))


def test_device_tracer_auto_is_off_on_cpu(rng):
    """On the CPU test mesh the tracer must auto-select the XLA path
    (the kernel is TPU-only outside interpret mode) — the seeded rollout
    goldens depend on it."""
    import elektronn2_tpu.neuromancer as nm
    from elektronn2_tpu.data.tracing_utils import DeviceTracer
    nm.model_manager.reset(seed=3)
    inp = nm.Input([1, 1, 5, 5, 5], "b,f,z,x,y", name="x")
    step = nm.Perceptron(inp, 3, activation_func="lin", flatten=True,
                         name="step")
    m = nm.model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=step)
    vol = rng.rand(1, 32, 32, 256).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=3)
    assert not dt._use_pallas()
    assert DeviceTracer(m, vol, max_steps=3,
                        use_pallas_extract=True)._use_pallas()


def test_split_call_batches_match_xla(rng):
    """Batches past _MAX_CALL_B are served by multiple kernel calls and
    re-concatenated (the r4 B=1024 cliff fix) — must equal the XLA
    extraction exactly. The threshold is patched small so the interpret
    path exercises the split without a 1024-agent CPU run."""
    import elektronn2_tpu.ops.pallas_extract as pe

    vol = jnp.asarray(rng.rand(1, 40, 256, 256).astype(np.float32))
    patch = (5, 5, 5)
    pos = jnp.asarray(rng.uniform(8, 30, (8, 3)).astype(np.float32))
    old = pe._MAX_CALL_B
    try:
        pe._MAX_CALL_B = 4          # 8 agents -> two interpret calls
        got = np.asarray(pe.trilinear_patches_pallas(vol, pos, patch,
                                                     interpret=True))
    finally:
        pe._MAX_CALL_B = old
    from elektronn2_tpu.data.tracing_utils import DeviceTracer

    class _Shim:                    # _extract only needs patch_size
        patch_size = patch
    ref = np.stack([np.asarray(DeviceTracer._extract(_Shim(), vol, p))
                    for p in pos])
    np.testing.assert_allclose(got, ref, atol=1e-6)
