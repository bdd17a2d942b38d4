"""The reference import surface (``elektronn2.*``) must resolve to this
framework's modules — same objects, not copies (singleton safety)."""

import numpy as np


def test_shim_module_identity():
    import elektronn2
    from elektronn2 import neuromancer
    import elektronn2.neuromancer.node_basic as nb
    import elektronn2_tpu.neuromancer as real
    assert neuromancer is real
    assert nb is real.node_basic
    # canonical identity preserved (pickling/logging paths)
    assert real.node_basic.__name__ == "elektronn2_tpu.neuromancer.node_basic"


def test_shim_reference_style_config():
    from elektronn2.neuromancer import (Input, Conv, Softmax,
                                        model_manager)
    from elektronn2.utils import cnncalculator
    model_manager.reset(seed=1)
    inp = Input([1, 1, 16, 16], "b,f,x,y", name="raw")
    c = Conv(inp, 4, 3, 2)
    p = Softmax(Conv(c, 2, 1, 1, activation_func="lin"))
    m = model_manager.getmodel()
    m.designate_nodes(input_node=inp, prediction_node=p)
    out = np.asarray(m.predict(
        np.random.RandomState(0).rand(1, 1, 16, 16).astype(np.float32)))
    assert out.shape == (1, 2, 7, 7) and np.isfinite(out).all()
    assert cnncalculator([3], [2], desired_patch_size=16, ndim=1) is not None


def test_shim_missing_submodule_raises():
    import pytest
    with pytest.raises(ImportError):
        import elektronn2.does_not_exist  # noqa: F401
