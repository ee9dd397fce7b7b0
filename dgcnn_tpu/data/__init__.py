from dgcnn_tpu.data import augment, synthetic
from dgcnn_tpu.data.datasets import (
    ModelNet40,
    S3DIS,
    ShapeNetPart,
    ShapeNetPartAugmented,
    data_root,
    load_color_partseg,
    load_color_semseg,
    load_data_cls,
    load_data_partseg,
    load_data_semseg,
)
from dgcnn_tpu.data.loader import Batch, NumpyLoader, device_prefetch
from dgcnn_tpu.data.pipeline import PipelineLoader, make_loader

__all__ = [
    "PipelineLoader",
    "make_loader",
    "augment",
    "synthetic",
    "ModelNet40",
    "S3DIS",
    "ShapeNetPart",
    "ShapeNetPartAugmented",
    "data_root",
    "load_color_partseg",
    "load_color_semseg",
    "load_data_cls",
    "load_data_partseg",
    "load_data_semseg",
    "Batch",
    "NumpyLoader",
    "device_prefetch",
]
