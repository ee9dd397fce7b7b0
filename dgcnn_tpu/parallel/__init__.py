from dgcnn_tpu.parallel.data_parallel import (
    jit_data_parallel,
    make_shard_map_seg_train_step,
)
from dgcnn_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    distributed_init,
    make_mesh,
    replicated,
)

__all__ = [
    "jit_data_parallel",
    "make_shard_map_seg_train_step",
    "DATA_AXIS",
    "batch_sharding",
    "distributed_init",
    "make_mesh",
    "replicated",
]
