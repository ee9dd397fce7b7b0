"""Test configuration: force CPU backend with 8 virtual devices.

Mirrors SURVEY.md §4's "fake backend" strategy: multi-device sharding paths are
tested on a virtual CPU mesh (xla_force_host_platform_device_count) so no TPU
pod is needed.  Must run before jax is imported anywhere.
"""
import os
import sys

# The axon TPU plugin ignores the JAX_PLATFORMS env var; platform selection
# must go through jax.config (see below).
os.environ["JAX_PLATFORMS"] = "cpu"

# Repo root on sys.path so `import dgcnn_tpu` works without installation.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Persistent compilation cache: XLA compiles take minutes on a 1-core host.
from dgcnn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

# jax >= 0.5 ignores --xla_force_host_platform_device_count, and this
# environment's axon plugin ignores JAX_PLATFORMS — the config route is the
# one that sticks: CPU backend with 8 virtual devices.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def has_reference():
    return os.path.isdir(REFERENCE_DIR)


def has_torch():
    try:
        import torch  # noqa: F401
        return True
    except Exception:
        return False


requires_reference = pytest.mark.skipif(
    not (has_reference() and has_torch()),
    reason="reference repo or torch unavailable",
)
