"""Model zoo (SURVEY.md §2 components #3, #4, #6-#11, #35)."""
from dgcnn_tpu.models.attention import (
    MultiHeadedAttention,
    MultiHeadVectorAttention,
    VectorAttention,
    scaled_dot_attention,
)
from dgcnn_tpu.models.dgcnn import (
    DGCNN,
    DGCNNCls,
    DGCNNPartSeg,
    DGCNNSemSeg,
    PointNet,
    PositionEmbedding,
    TransformNet,
)
from dgcnn_tpu.models.model_partseg import MLPHead, Net
from dgcnn_tpu.models.prototypes import (
    CrossModalMultiHeadAttention,
    OffsetAttention,
    PointTransformerLayer,
)
from dgcnn_tpu.models.nn_layers import BatchNorm, ConvBN, DenseBNReLU, EdgeConv
from dgcnn_tpu.models.torch_transformer import (
    TorchMultiheadAttention,
    TorchTransformer,
)
from dgcnn_tpu.models.transformer import Transformer

__all__ = [
    "MultiHeadedAttention",
    "MultiHeadVectorAttention",
    "VectorAttention",
    "scaled_dot_attention",
    "DGCNN",
    "DGCNNCls",
    "DGCNNPartSeg",
    "DGCNNSemSeg",
    "PointNet",
    "PositionEmbedding",
    "TransformNet",
    "MLPHead",
    "Net",
    "BatchNorm",
    "ConvBN",
    "DenseBNReLU",
    "EdgeConv",
    "TorchMultiheadAttention",
    "TorchTransformer",
    "Transformer",
    "CrossModalMultiHeadAttention",
    "OffsetAttention",
    "PointTransformerLayer",
]
