from dgcnn_tpu.parallel.data_parallel import (
    jit_data_parallel,
    make_shard_map_seg_train_step,
)
from dgcnn_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    distributed_init,
    make_mesh,
    make_mesh_2d,
    mesh_if_divisible,
    replicated,
)
from dgcnn_tpu.parallel.point_sharded import (
    point_sharded_apply,
    sharded_edge_conv_fused,
    sharded_gather_neighbors,
    sharded_knn,
)

__all__ = [
    "jit_data_parallel",
    "make_shard_map_seg_train_step",
    "DATA_AXIS",
    "batch_sharding",
    "distributed_init",
    "make_mesh",
    "make_mesh_2d",
    "mesh_if_divisible",
    "replicated",
    "point_sharded_apply",
    "sharded_edge_conv_fused",
    "sharded_gather_neighbors",
    "sharded_knn",
]
