"""buffer_tpu: a TPU-native (JAX/XLA/Pallas) point-cloud registration
framework with the capabilities of BUFFER (CVPR 2023).

Layering (see SURVEY.md for the reference map):

* :mod:`buffer_tpu.config`   — typed configs + dataset presets
* :mod:`buffer_tpu.core`     — SE(3)/rotation/grid math
* :mod:`buffer_tpu.ops`      — device ops: neighbors, FPS, subsampling, normals
* :mod:`buffer_tpu.nn`       — Vector-Neuron + cylindrical conv stacks
* :mod:`buffer_tpu.models`   — EFCNN, DetNet, MiniSpinNet, CostVolume, composite
* :mod:`buffer_tpu.pipeline` — pyramid build, matching, voting, RANSAC, refine
* :mod:`buffer_tpu.data`     — datasets, PLY I/O, host preprocessing
* :mod:`buffer_tpu.train`    — losses, stage trainer, checkpoints
* :mod:`buffer_tpu.eval`     — registration-recall metrics and harnesses
* :mod:`buffer_tpu.compat`   — reference .pth -> pytree weight conversion
"""

from buffer_tpu.config import Config, make_cfg, tiny_cfg  # noqa: F401

__version__ = "0.1.0"
