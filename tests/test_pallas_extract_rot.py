"""Rotated (frame-aligned) Pallas extraction kernel vs the XLA oracle.

The oracle is ``DeviceTracer._extract_rot_batch`` — the whole-volume
8-corner gather path (reference semantics:
``transformations.py::get_tracing_slice``). Interpreter mode on CPU.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from elektronn2_tpu.data.tracing_utils import (  # noqa: E402
    DeviceTracer, _flight_frame_jnp)
from elektronn2_tpu.ops.pallas_extract_rot import (  # noqa: E402
    rotated_patches_pallas, rotated_extract_eligible, rotated_ok, _geom)


class _Stub:
    """Bare-minimum DeviceTracer shell to reach _extract_rot_batch."""

    def __init__(self, patch):
        self.patch_size = tuple(patch)

    _extract_rot_batch = DeviceTracer._extract_rot_batch


def _oracle(vol, pos, heads, patch):
    return _Stub(patch)._extract_rot_batch(vol, jnp.asarray(pos),
                                           jnp.asarray(heads))


def _rand_case(seed, B, shape=(1, 16, 32, 256), patch=(4, 4, 4),
               margin=7.0):
    rng = np.random.RandomState(seed)
    vol = jnp.asarray(rng.rand(*shape), jnp.float32)
    dims = np.asarray(shape[1:], np.float32)
    pos = rng.uniform(margin, dims - margin, (B, 3)).astype(np.float32)
    heads = rng.randn(B, 3).astype(np.float32)
    return vol, pos, heads


def test_geom_and_eligibility():
    H, Wz, WXr, P, PT = _geom((4, 4, 4))
    assert (H, Wz, P, PT) == (4, 10, 64, 64)
    assert WXr % 8 == 0 and WXr >= 2 * H + 9
    assert rotated_extract_eligible((1, 16, 32, 256), jnp.float32,
                                    (4, 4, 4))
    assert rotated_extract_eligible((1, 40, 64, 256), jnp.float32,
                                    (16, 16, 16))
    # ineligible: patch diagonal too large for the 32-slice window
    assert not rotated_extract_eligible((1, 64, 64, 256), jnp.float32,
                                        (20, 20, 20))
    # ineligible: int volume / unaligned Y
    assert not rotated_extract_eligible((1, 16, 32, 256), jnp.int32,
                                        (4, 4, 4))
    assert not rotated_extract_eligible((1, 16, 32, 200), jnp.float32,
                                        (4, 4, 4))


def test_rotated_kernel_matches_oracle_random():
    vol, pos, heads = _rand_case(0, B=24)
    patch = (4, 4, 4)
    ref, ok_ref, F = _oracle(vol, pos, heads, patch)
    got, ok = rotated_patches_pallas(vol, jnp.asarray(pos), F, patch,
                                     interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
    m = np.asarray(ok_ref)
    d = float(jnp.max(jnp.abs(got[m] - ref[m]))) if m.any() else 0.0
    assert d < 1e-5, d
    assert m.any()


def test_rotated_kernel_anisotropic_patch():
    vol, pos, heads = _rand_case(1, B=12, shape=(1, 24, 40, 256),
                                 patch=None, margin=9.0)
    patch = (4, 8, 8)          # P=256, PT=256
    ref, ok_ref, F = _oracle(vol, pos, heads, patch)
    got, ok = rotated_patches_pallas(vol, jnp.asarray(pos), F, patch,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
    m = np.asarray(ok_ref)
    assert m.any()
    d = float(jnp.max(jnp.abs(got[m] - ref[m])))
    assert d < 1e-5, d


def test_rotated_kernel_multichannel():
    vol, pos, heads = _rand_case(2, B=6, shape=(2, 16, 32, 256))
    ref, ok_ref, F = _oracle(vol, pos, heads, (4, 4, 4))
    got, ok = rotated_patches_pallas(vol, jnp.asarray(pos), F, (4, 4, 4),
                                     interpret=True)
    m = np.asarray(ok_ref)
    assert m.any()
    d = float(jnp.max(jnp.abs(got[m] - ref[m])))
    assert d < 1e-5, d


def test_ok_flags_edge_positions():
    """ok must flip exactly at the host source_bbox margin — probe
    positions straddling the boundary along each axis, canonical and
    rotated headings."""
    vol = jnp.asarray(np.random.RandomState(3).rand(1, 16, 32, 256),
                      jnp.float32)
    patch = (4, 4, 4)
    for head in ([0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.5, 0.5, 0.7]):
        pos, heads = [], []
        for axis in range(3):
            for v in (2.0, 3.4, 5.0, 9.0):
                p = [8.0, 16.0, 128.0]
                p[axis] = v
                pos.append(p)
                heads.append(head)
        pos = np.asarray(pos, np.float32)
        heads = np.asarray(heads, np.float32)
        ref, ok_ref, F = _oracle(vol, pos, heads, patch)
        got, ok = rotated_patches_pallas(vol, jnp.asarray(pos), F, patch,
                                         interpret=True)
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
        m = np.asarray(ok_ref)
        if m.any():
            d = float(jnp.max(jnp.abs(got[m] - ref[m])))
            assert d < 1e-5, d


def test_rotated_ok_corner_criterion_equals_dense_check():
    """The 8-corner convexity shortcut == the all-samples check."""
    vol, pos, heads = _rand_case(4, B=64, margin=3.0)
    patch = (4, 4, 4)
    F = jax.vmap(_flight_frame_jnp)(jnp.asarray(heads))
    ok = rotated_ok(vol.shape, jnp.asarray(pos), F, patch)
    _, ok_ref, _ = _oracle(vol, pos, heads, patch)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))


def test_call_split_over_max_b(monkeypatch):
    import elektronn2_tpu.ops.pallas_extract_rot as mod
    monkeypatch.setattr(mod, "_MAX_CALL_B", 8)
    vol, pos, heads = _rand_case(5, B=20)      # 8 + 8 + 4 (uneven tail)
    patch = (4, 4, 4)
    ref, ok_ref, F = _oracle(vol, pos, heads, patch)
    got, ok = mod.rotated_patches_pallas.__wrapped__(
        vol, jnp.asarray(pos), F, patch, interpret=True)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
    m = np.asarray(ok_ref)
    d = float(jnp.max(jnp.abs(jnp.asarray(got)[m] - ref[m])))
    assert d < 1e-5, d


@pytest.mark.parametrize("variant", ["mxb", "sepa", "fact2"])
def test_contraction_variants_match_oracle(variant):
    """All contraction strategies are the same trilinear sum, reordered
    (r5: mxb = MXU-assisted weight build, sepa = separable full-lane
    z-fold; fact2 = the measured-rejected factored form, kept as the
    attribution baseline)."""
    vol, pos, heads = _rand_case(8, B=16)
    patch = (4, 4, 4)
    ref, ok_ref, F = _oracle(vol, pos, heads, patch)
    got, ok = rotated_patches_pallas(vol, jnp.asarray(pos), F, patch,
                                     interpret=True, variant=variant)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
    m = np.asarray(ok_ref)
    assert m.any()
    d = float(jnp.max(jnp.abs(got[m] - ref[m])))
    assert d < 1e-5, (variant, d)


@pytest.mark.parametrize("variant", ["bigk", "sepa"])
def test_precision_high_mode(variant):
    """precision='high' (3-pass bf16x3 dot) stays f32-close in interpret
    mode (on-chip ladder: HIGHEST 2.4e-6 / high ~2e-5 / bf16 3.8e-3 —
    scripts/exp_rotated_kernel.py)."""
    vol, pos, heads = _rand_case(9, B=12)
    patch = (4, 4, 4)
    ref, ok_ref, F = _oracle(vol, pos, heads, patch)
    got, ok = rotated_patches_pallas(vol, jnp.asarray(pos), F, patch,
                                     interpret=True, variant=variant,
                                     precision="high")
    m = np.asarray(ok_ref)
    assert m.any()
    d = float(jnp.max(jnp.abs(got[m] - ref[m])))
    assert d < 1e-3, (variant, d)


def test_unknown_variant_and_precision_rejected():
    """An unknown variant must raise, not fall into the wrong-numerics
    probe branch silently (found by the r5 verify error-path drive)."""
    vol, pos, heads = _rand_case(10, B=4)
    F = jax.vmap(_flight_frame_jnp)(jnp.asarray(heads))
    with pytest.raises(ValueError, match="variant='nope'"):
        rotated_patches_pallas(vol, jnp.asarray(pos), F, (4, 4, 4),
                               interpret=True, variant="nope")
    with pytest.raises(ValueError, match="precision='hi'"):
        rotated_patches_pallas(vol, jnp.asarray(pos), F, (4, 4, 4),
                               interpret=True, precision="hi")


def test_bf16_mode_close():
    vol, pos, heads = _rand_case(6, B=8)
    patch = (4, 4, 4)
    ref, ok_ref, F = _oracle(vol, pos, heads, patch)
    got, ok = rotated_patches_pallas(vol, jnp.asarray(pos), F, patch,
                                     compute_dtype="bfloat16",
                                     interpret=True)
    m = np.asarray(ok_ref)
    assert m.any()
    d = float(jnp.max(jnp.abs(got[m] - ref[m])))
    assert d < 3e-2, d


def _ff_model(patch, seed=7, scale=0.02, bias=(0.1, 0.35, 0.25)):
    import elektronn2_tpu.neuromancer as nm
    rng = np.random.RandomState(seed)
    nm.model_manager.reset(seed=3)
    inp = nm.Input([1, 1, *patch], "b,f,z,x,y", name="x")
    step = nm.Perceptron(inp, 3, activation_func="lin", flatten=True,
                         name="step")
    m = nm.model_manager.getmodel("ff_rot_kernel")
    m.designate_nodes(input_node=inp, prediction_node=step)
    m.params["step"]["w"] = jnp.asarray(
        rng.randn(int(np.prod(patch)), 3) * scale, jnp.float32)
    m.params["step"]["b"] = jnp.asarray(bias, jnp.float32)
    return m


def test_device_tracer_rotated_kernel_path_matches_oracle():
    """DeviceTracer(rotate_to_heading=True, use_pallas_rot=True) ==
    the XLA-gather rollout, end-to-end (interpret mode on CPU)."""
    patch = (4, 4, 4)
    m = _ff_model(patch)
    rng = np.random.RandomState(11)
    vol = rng.rand(1, 16, 32, 256).astype(np.float32)
    K = 6
    ref = DeviceTracer(m, vol, max_steps=K, rotate_to_heading=True,
                       use_pallas_rot=False)
    ker = DeviceTracer(m, vol, max_steps=K, rotate_to_heading=True,
                       use_pallas_rot=True)
    assert ker._rot_kernel and not ref._rot_kernel
    seeds = rng.uniform([6, 10, 120], [10, 22, 136],
                        (6, 3)).astype(np.float32)
    t_ref = ref.trace_batch(seeds)
    t_ker = ker.trace_batch(seeds)
    for i in range(len(seeds)):
        assert len(t_ref[i].coords) == len(t_ker[i].coords), i
        np.testing.assert_allclose(t_ker[i].coords, t_ref[i].coords,
                                   atol=5e-3, err_msg=f"seed {i}")


def test_device_tracer_rotated_kernel_pool_path():
    """Pool rollout (respawn masking) through the rotated kernel =="""
    patch = (4, 4, 4)
    m = _ff_model(patch, seed=13, bias=(0.5, 0.2, -0.1))
    rng = np.random.RandomState(12)
    vol = rng.rand(1, 16, 32, 256).astype(np.float32)
    K = 5
    ref = DeviceTracer(m, vol, max_steps=K, rotate_to_heading=True,
                       use_pallas_rot=False)
    ker = DeviceTracer(m, vol, max_steps=K, rotate_to_heading=True,
                       use_pallas_rot=True)
    seeds = rng.uniform([6, 10, 120], [10, 22, 136],
                        (4, 3)).astype(np.float32)
    tr_ref, st_ref = ref.trace_pool(seeds, batch_size=2)
    tr_ker, st_ker = ker.trace_pool(seeds, batch_size=2)
    assert st_ref["consumed"] == st_ker["consumed"]
    for i in range(len(seeds)):
        assert len(tr_ref[i].coords) == len(tr_ker[i].coords), i
        np.testing.assert_allclose(tr_ker[i].coords, tr_ref[i].coords,
                                   atol=5e-3, err_msg=f"pool seed {i}")


def test_auto_gate_off_on_cpu_and_ineligible():
    patch = (4, 4, 4)
    m = _ff_model(patch, seed=17)
    vol = np.random.RandomState(1).rand(1, 16, 32, 256).astype(np.float32)
    dt = DeviceTracer(m, vol, max_steps=3, rotate_to_heading=True)
    assert dt._rot_kernel is False          # CPU -> auto off
    # non-rotated tracer never uses the rotated kernel
    dt2 = DeviceTracer(m, vol, max_steps=3)
    assert dt2._rot_kernel is False
