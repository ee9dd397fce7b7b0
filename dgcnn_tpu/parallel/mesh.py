"""Device mesh construction (SURVEY.md §2.2: replaces torchrun/NCCL rendezvous
— main_partseg_dist.py:464-492 — with jax.sharding over all visible chips)."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices.

    The reference's parallelism is pure data parallel (SURVEY.md §2.3); the
    models are <10M params so replication is the right layout and all
    collectives (grad psum, BN pmean) ride ICI.
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def distributed_init() -> None:
    """Multi-host entry: one process per host, all local chips visible
    (replaces the reference's env-var rendezvous, main_partseg_dist.py:481-486).
    No-op on a single host."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
