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


def make_mesh_2d(devices: Optional[Sequence] = None, dp: int = 1,
                 sp: int = 1, data_axis: str = DATA_AXIS,
                 point_axis: str = "point") -> Mesh:
    """A 2-D (data x point) mesh for combined batch + point-axis sharding
    (parallel.point_sharded's ``batch_axis=`` form).  ``dp * sp`` must
    equal the device count; the point axis is the MINOR (fast, contiguous
    ICI) dimension so the per-graph all-gathers stay on nearest
    neighbours."""
    import jax

    if devices is None:
        devices = jax.devices()
    if dp * sp != len(devices):
        raise ValueError(f"dp({dp}) * sp({sp}) != {len(devices)} devices")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, (data_axis, point_axis))


def mesh_if_divisible(devices: Sequence, batch_size: int,
                      io=None, what: str = "device pipeline") -> Optional[Mesh]:
    """The CLIs' shared mesh rule: a 1-D mesh over ``devices`` when the
    device count divides the batch size (the same condition
    build_data_parallel_call encodes), else None.  With multiple devices
    and a non-divisible batch, prints a notice through ``io`` so the
    single-device fallback is never silent."""
    if len(devices) > 1 and batch_size % len(devices) == 0:
        return make_mesh(devices)
    if len(devices) > 1 and io is not None:
        io.cprint(
            f"{what}: batch size {batch_size} does not divide over "
            f"{len(devices)} devices — running on ONE device"
        )
    return None


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def distributed_init() -> None:
    """Multi-host entry: one process per host, all local chips visible
    (replaces the reference's env-var rendezvous via MASTER_ADDR/RANK,
    main_partseg_dist.py:481-486).  No-op unless a coordinator address is
    set.  Rendezvous env vars:
      JAX_COORDINATOR_ADDRESS (or COORDINATOR_ADDRESS)  host:port
      JAX_NUM_PROCESSES / JAX_PROCESS_ID                world size / rank
    (process count/id may be omitted on platforms jax can auto-detect)."""
    import os

    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if not addr:
        return
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(nproc) if nproc is not None else None,
        process_id=int(pid) if pid is not None else None,
    )
