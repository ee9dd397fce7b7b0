from dgcnn_tpu.convert.torch_import import (
    convert_dgcnn_backbone,
    convert_dgcnn_cls,
    convert_dgcnn_partseg,
    convert_dgcnn_semseg,
    convert_mlp_head,
    convert_net,
    convert_pointnet,
    convert_torch_mha,
    convert_torch_transformer,
    load_torch_checkpoint,
    strip_prefix,
)

__all__ = [
    "convert_dgcnn_backbone",
    "convert_dgcnn_cls",
    "convert_dgcnn_partseg",
    "convert_dgcnn_semseg",
    "convert_mlp_head",
    "convert_net",
    "convert_pointnet",
    "convert_torch_mha",
    "convert_torch_transformer",
    "load_torch_checkpoint",
    "strip_prefix",
]
