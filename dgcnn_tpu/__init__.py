"""dgcnn_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
QasimKhan5x/dgcnn.pytorch.

A ground-up rebuild, not a port: point clouds are channels-last ``(B, N, C)``
(TPU lane-friendly), EdgeConv is a fused gather/reduce that never materializes
the ``(B, 2C, N, k)`` edge tensor the reference builds
(reference: models/dgcnn.py:15-44), the HOG branch's CPU LAPACK SVD round-trip
(reference: models/model_partseg.py:36-47) is replaced by an on-device
closed-form 3x3 eigendecomposition, and DDP/NCCL (main_partseg_dist.py) is
replaced by jax.sharding over a device mesh.

Subpackages:
  ops       core point-cloud kernels (knn, graph features, edge conv, HOG)
  models    flax.linen model zoo (DGCNN cls/partseg/semseg, fusion Net, transformers)
  data      datasets, loaders, augmentations, S3DIS ETL
  train     loss, metrics, optimizers/schedules, train/eval engines, checkpointing
  parallel  device mesh + sharded train steps (data parallel, cross-replica BN)
  convert   torch checkpoint -> JAX parameter conversion
  utils     logging, visualization writers
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("DGCNN_TPU_JAX_PLATFORM"):
    # Child-process platform selection: this host's axon TPU plugin IGNORES
    # the standard JAX_PLATFORMS env var, so subprocess tools that must pin
    # a backend (e.g. tools/real_data_parity.py --platform cpu under the
    # CPU test suite) export this instead; the config route is the one
    # that sticks.  No-op once jax backends are initialized.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms",
                           _os.environ["DGCNN_TPU_JAX_PLATFORM"])
    except RuntimeError:
        pass  # backends already initialized — the caller picked first
