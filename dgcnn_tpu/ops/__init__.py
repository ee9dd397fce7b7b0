"""Core point-cloud ops (SURVEY.md §2 components #1, #2, #5).

Pure-JAX implementations here; the Pallas fused knn kernel lives in
``dgcnn_tpu.ops.pallas_knn`` and is selected automatically on TPU via
``knn_backend``.
"""
from dgcnn_tpu.ops.edge_conv import (
    edge_conv_batch_stats,
    edge_conv_fused,
    edge_conv_naive,
    edge_linear,
    fold_bn,
)
from dgcnn_tpu.ops.eig3 import eigvals3x3_sym_desc, principal_eigvec3x3_sym
from dgcnn_tpu.ops.graph import edge_features, gather_neighbors, get_graph_feature
from dgcnn_tpu.ops.hog import compute_hog, principal_gradients
from dgcnn_tpu.ops.knn import knn, knn_with_dists, pairwise_neg_sqdist

__all__ = [
    "edge_conv_batch_stats",
    "edge_conv_fused",
    "edge_conv_naive",
    "edge_linear",
    "fold_bn",
    "eigvals3x3_sym_desc",
    "principal_eigvec3x3_sym",
    "edge_features",
    "gather_neighbors",
    "get_graph_feature",
    "compute_hog",
    "principal_gradients",
    "knn",
    "knn_with_dists",
    "pairwise_neg_sqdist",
]
