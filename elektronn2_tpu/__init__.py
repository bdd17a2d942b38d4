"""elektronn2_tpu — a TPU-native rebuild of ELEKTRONN2.

3D/2D convolutional neural networks for volumetric electron-microscopy data
(neurite segmentation, synapse detection, recurrent neurite tracing), built
on JAX/XLA/Pallas instead of Theano/CUDA.

Public surfaces kept from the reference (see SURVEY.md):
  * neuromancer node specs (declarative graph construction, replayable)
  * config-file training loop (exec'd Python experiment files)
  * Predictor interface (``model.predict_dense`` with MFP)

Everything underneath is re-designed TPU-first: pure-functional params,
jitted train steps, XLA convolutions, Pallas augmentation kernels, and
``jax.sharding`` meshes instead of host multiprocessing.

Reference citation convention in docstrings: ``elektronn2/<path>.py::Symbol``
(upstream ELEKTRONN/ELEKTRONN2 tree; line numbers unavailable — the reference
mount was empty at build time, see SURVEY.md §0).
"""

__version__ = "0.1.0"

from elektronn2_tpu.log import logger  # noqa: F401  (configures logging on import)
