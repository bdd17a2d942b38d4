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


REFERENCE_STYLE_CONFIG = '''\
# A reference-style experiment config: imports ONLY elektronn2.* —
# what an ELEKTRONN2 user's existing config file looks like.
import numpy as np

save_name = "refstyle"
batch_size = 2
n_steps = 4
history_freq = 0
save_freq = 0
n_workers = 0
optimiser = "SGD"
optimiser_params = {"lr": 5e-3}
data_class = "BatchCreatorImage"
_rng = np.random.RandomState(0)
data_init_kwargs = {
    "input_data": [_rng.rand(1, 20, 28, 28).astype(np.float32)],
    "target_data": [(_rng.rand(20, 28, 28) > 0.5).astype(np.int16)],
}
schedules = {"lr": {"dec": 0.98}}


def create_model():
    from elektronn2.neuromancer import (Input, Conv, Softmax,
                                        MultinoulliNLL, AggregateLoss,
                                        Errors, model_manager)
    model_manager.reset(seed=2)
    inp = Input([batch_size, 1, 8, 12, 12], "b,f,z,x,y", name="raw")
    c1 = Conv(inp, 6, (1, 3, 3), (1, 2, 2))
    c2 = Conv(c1, 8, (3, 3, 3), (1, 1, 1))
    logits = Conv(c2, 2, (1, 1, 1), (1, 1, 1), activation_func="lin")
    probs = Softmax(logits)
    tgt = Input([batch_size, *probs.shape.spatial_shape], "b,z,x,y",
                dtype="int32", name="target")
    nll = MultinoulliNLL(probs, tgt, target_is_sparse=True)
    loss = AggregateLoss(nll)
    err = Errors(probs, tgt, target_is_sparse=True)
    model = model_manager.getmodel("refstyle")
    model.designate_nodes(input_node=inp, target_node=tgt, loss_node=loss,
                          prediction_node=probs, error_node=err)
    return model
'''


def test_shim_reference_config_file_end_to_end(tmp_path):
    """VERDICT r1 #8: an experiment config written in PURE reference style
    (elektronn2.* imports only) execs, builds, and trains end-to-end
    through the ExperimentConfig + Trainer surface."""
    from elektronn2.config import ExperimentConfig
    from elektronn2.training.trainer import Trainer
    cfg_path = tmp_path / "refstyle_config.py"
    cfg_path.write_text(REFERENCE_STYLE_CONFIG)
    exp = ExperimentConfig.from_file(
        str(cfg_path), override={"save_path": str(tmp_path)})
    tr = Trainer(exp)
    hist = tr.run()
    assert tr.step == 4
    losses = [row[2] for row in hist.timeline]
    assert np.isfinite(losses).all()
    # the saved model reloads through the elektronn2.* surface too
    from elektronn2.neuromancer.model import modelload
    m2 = modelload(str(tmp_path / "refstyle-LAST.mdl"))
    assert m2.param_count == tr.model.param_count


def test_shim_missing_submodule_raises():
    import pytest
    with pytest.raises(ImportError):
        import elektronn2.does_not_exist  # noqa: F401


def test_gpu_compat_shim():
    """Reference-style device-selection startup code runs unchanged:
    from elektronn2.utils import gpu; gpu.initgpu('auto')."""
    from elektronn2.utils import gpu
    dev = gpu.initgpu("auto")          # CPU backend under tests
    assert dev is not None and dev.platform == "cpu"
    assert gpu.get_free_gpu() == -1    # no accelerator in the test env
    assert gpu.initgpu("none") is None
    # explicit index in an accelerator-less env degrades to the host
    # device (the out-of-range guard only applies when accelerators
    # exist)
    assert gpu.initgpu(0).platform == "cpu"


def test_reference_deep_module_paths():
    """Reference-style deep imports through the compat shim: the module
    names user code imported in the reference resolve to the live
    implementations (same objects, not copies)."""
    from elektronn2.neuromancer.computations import (conv, fragmentpool,
                                                     fragments2dense,
                                                     upsampling, softmax)
    from elektronn2.utils.utils_basic import (h5save, unique_rows,
                                              pretty_string_time)
    from elektronn2.malis.malis_utils import (mknhood3d, seg_to_affgraph,
                                              compute_V_rand_N2)
    from elektronn2.malis.malisop import malis_weights

    import importlib
    _conv_mod = importlib.import_module("elektronn2_tpu.ops.conv")
    _basic_mod = importlib.import_module("elektronn2_tpu.utils.basic")
    _malis_mod = importlib.import_module("elektronn2_tpu.malis")
    assert conv is _conv_mod.conv
    assert upsampling is _conv_mod.unpooling      # reference alias
    assert h5save is _basic_mod.h5save
    assert unique_rows is _basic_mod.unique_rows
    assert mknhood3d is _malis_mod.mknhood3d
    assert malis_weights is _malis_mod.malis_weights
    assert callable(fragmentpool) and callable(fragments2dense)
    assert callable(softmax) and callable(seg_to_affgraph)
    assert callable(compute_V_rand_N2) and callable(pretty_string_time)


SURFACE = {
    "elektronn2.neuromancer": [
        "Input", "Input_like", "Conv", "UpConv", "Crop", "Concat", "Pool",
        "Perceptron", "Dot", "GRU", "LSTM", "FragmentsToDense",
        "FaithlessMerge", "GaussianRV", "ScanN", "SkelLoss", "SkelPrior",
        "SkelGetBatch", "MultinoulliNLL", "BinaryNLL", "GaussianNLL",
        "SquaredLoss", "AbsLoss", "AggregateLoss", "Softmax", "Errors",
        "MalisNLL", "ApplyFunc", "ValueNode", "MultMerge",
        "InitialState_like", "GenericInput", "FromTensor", "split",
        "model_manager"],
    "elektronn2.neuromancer.model": [
        "Model", "modelload", "rebuild_model", "simple_cnn",
        "params_from_model_file", "kernel_lists"],
    "elektronn2.neuromancer.optimiser": [
        "SGD", "Adam", "AdaGrad", "AdaDelta", "Optimiser"],
    "elektronn2.neuromancer.graphutils": [
        "TaggedShape", "make_func", "as_floatX", "floatX"],
    "elektronn2.neuromancer.variables": [
        "VariableParam", "VariableWeight", "ConstantParam"],
    "elektronn2.data.cnndata": ["BatchCreatorImage", "GridData",
                                "AgentData"],
    "elektronn2.data.transformations": [
        "warp_slice", "get_tracing_slice", "map_coordinates_nearest",
        "map_coordinates_linear", "WarpingOOBError"],
    "elektronn2.data.image": ["greyAugment", "ids2barriers",
                              "smearbarriers", "center_cubes"],
    "elektronn2.data.knossos_array": ["KnossosArray", "KnossosArrayMulti"],
    "elektronn2.data.skeleton": ["SkeletonMFK", "Trace", "trace_to_kzip"],
    "elektronn2.data.tracing_utils": ["Tracer", "CubeShape",
                                      "ShotgunRegistry"],
    "elektronn2.data.traindata": ["Data"],
    "elektronn2.training.trainer": ["Trainer", "TracingTrainer",
                                    "TracingTrainerRNN"],
    "elektronn2.training.parallelisation": ["BackgroundProc", "SharedQ",
                                            "SharedMem"],
    "elektronn2.training.trainutils": ["HistoryTracker", "Schedule",
                                       "user_input", "pretty_string_time"],
    "elektronn2.malis": ["malis_weights"],
    "elektronn2.malis.malis_utils": ["seg_to_affgraph", "mknhood3d",
                                     "bmap_to_affgraph"],
    "elektronn2.utils": ["h5save", "h5load", "picklesave", "pickleload",
                         "timeit", "cache", "AccumulationArray",
                         "DynamicKDT"],
    "elektronn2.utils.cnncalculator": [
        "cnncalculator", "get_cloesest_valid_patch_size",
        "get_valid_patch_sizes"],
    "elektronn2.utils.plotting": ["scroll_plot", "embedfilters", "sma",
                                  "add_timeticks", "plot_hist"],
    "elektronn2.utils.locking": ["FileLock"],
    "elektronn2.utils.gpu": ["initgpu", "get_free_gpu"],
    "elektronn2.config": ["config"],
}


def test_reference_public_surface_complete():
    """Locks the reference's public import surface (SURVEY.md section 3
    symbol anchors) through the compat shim: every module path and symbol
    a reference user imports must resolve. New gaps fail here instead of
    at a user's import site."""
    import importlib
    missing = []
    for mod, syms in SURFACE.items():
        try:
            m = importlib.import_module(mod)
        except Exception as e:      # noqa: BLE001 - collect, report all
            missing.append(f"{mod}: import failed ({e})")
            continue
        missing += [f"{mod}.{s}" for s in syms if not hasattr(m, s)]
    assert not missing, f"reference surface gaps: {missing}"


def test_cnncalculator_callable_after_submodule_import():
    """Importing the ``...utils.cnncalculator`` *module* (as the surface
    lock above does) rebinds the package attribute from the re-exported
    function to the module; the module is made callable so both import
    forms keep working in any order (regression: r2 s17)."""
    import importlib
    importlib.import_module("elektronn2.utils.cnncalculator")
    from elektronn2_tpu.utils import cnncalculator as maybe_mod
    calc = maybe_mod([3, 3], [2, 2], desired_patch_size=21, mfp=True, ndim=1)
    assert calc.input == 21
    from elektronn2.utils import cnncalculator as alias_side
    assert alias_side([3], [2], desired_patch_size=16, ndim=1).input == 16
