"""Torch twins of the restored canonical models (SURVEY.md §2 #35).

The fork's ``main_cls.py:25`` / ``main_semseg.py:20`` import ``model.py``
modules that do not exist in the repository — the canonical AnTao97
``DGCNN_cls`` / ``DGCNN_semseg`` architectures.  We restored them in flax
(models/dgcnn.py) and wrote both-way converters keyed to the published
``.t7`` state-dict layout (convert/torch_import.py / torch_export.py).

These torch modules are the *verification twins* for those restorations:
they carry exactly the published checkpoint key layout (``conv{i}.0`` /
``conv{i}.1`` Sequentials, ``linear1``/``bn6``/``bn7`` heads), so an
``export_dgcnn_*`` state dict strict-loads into them, and their forward
semantics mirror the flax restorations op for op — kNN by the reference's
``-|x_i - x_j|^2`` score (reference models/dgcnn.py:6-12), edge features
in the fork's ``[neighbour, centre]`` concat order (reference
models/dgcnn.py:42), LeakyReLU(0.2) everywhere, max-over-k EdgeConv
reduction.  tools/trained_canonical_parity.py gates trained flax weights
through them (VERDICT r4 next-step #6); tests/test_torch_canonical.py
pins the wiring at tiny shapes.

torch is an optional dependency — import this module lazily.
"""
from __future__ import annotations

import torch
import torch.nn as nn


def knn_indices(x: torch.Tensor, k: int) -> torch.Tensor:
    """(B, C, N) -> (B, N, k) neighbour indices by largest -squared-distance
    (torch.topk tie order, which the exact Pallas path reproduces —
    tests/test_ops_knn_graph.py)."""
    inner = torch.matmul(x.transpose(2, 1), x)          # (B, N, N)
    sq = (x ** 2).sum(dim=1)                            # (B, N)
    score = 2 * inner - sq.unsqueeze(1) - sq.unsqueeze(2)
    return score.topk(k=k, dim=-1)[1]


def edge_features(x: torch.Tensor, k: int,
                  graph: torch.Tensor | None = None) -> torch.Tensor:
    """(B, C, N) -> (B, 2C, N, k) edge tensor, concat [neighbour, centre]
    (the fork's get_graph_feature layout).  ``graph`` optionally supplies
    the coordinates the kNN is built over (semseg stage 1 uses channels
    6:9 while the features keep all 9)."""
    b, c, n = x.shape
    idx = knn_indices(x if graph is None else graph, k)   # (B, N, k)
    pts = x.transpose(2, 1)                               # (B, N, C)
    nbr = torch.gather(
        pts.unsqueeze(1).expand(b, n, n, c), 2,
        idx.unsqueeze(-1).expand(b, n, k, c))             # (B, N, k, C)
    ctr = pts.unsqueeze(2).expand(b, n, k, c)
    return torch.cat((nbr, ctr), dim=3).permute(0, 3, 1, 2).contiguous()


def _conv2d_block(cin: int, cout: int) -> nn.Sequential:
    return nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False),
                         nn.BatchNorm2d(cout), nn.LeakyReLU(0.2))


def _conv1d_block(cin: int, cout: int) -> nn.Sequential:
    return nn.Sequential(nn.Conv1d(cin, cout, 1, bias=False),
                         nn.BatchNorm1d(cout), nn.LeakyReLU(0.2))


class DGCNNClsTorch(nn.Module):
    """Twin of models/dgcnn.py::DGCNNCls (canonical DGCNN_cls layout:
    convert_dgcnn_cls / export_dgcnn_cls key schema)."""

    def __init__(self, emb_dims: int = 1024, k: int = 20,
                 output_channels: int = 40, dropout: float = 0.5):
        super().__init__()
        self.k = k
        self.conv1 = _conv2d_block(6, 64)
        self.conv2 = _conv2d_block(128, 64)
        self.conv3 = _conv2d_block(128, 128)
        self.conv4 = _conv2d_block(256, 256)
        self.conv5 = _conv1d_block(512, emb_dims)
        self.linear1 = nn.Linear(2 * emb_dims, 512, bias=False)
        self.bn6 = nn.BatchNorm1d(512)
        self.dp1 = nn.Dropout(dropout)
        self.linear2 = nn.Linear(512, 256)
        self.bn7 = nn.BatchNorm1d(256)
        self.dp2 = nn.Dropout(dropout)
        self.linear3 = nn.Linear(256, output_channels)

    def forward(self, x: torch.Tensor) -> torch.Tensor:   # x: (B, 3, N)
        x1 = self.conv1(edge_features(x, self.k)).max(dim=-1)[0]
        x2 = self.conv2(edge_features(x1, self.k)).max(dim=-1)[0]
        x3 = self.conv3(edge_features(x2, self.k)).max(dim=-1)[0]
        x4 = self.conv4(edge_features(x3, self.k)).max(dim=-1)[0]
        h = self.conv5(torch.cat((x1, x2, x3, x4), dim=1))  # (B, emb, N)
        pooled = torch.cat((h.max(dim=-1)[0], h.mean(dim=-1)), dim=1)
        h = nn.functional.leaky_relu(self.bn6(self.linear1(pooled)), 0.2)
        h = self.dp1(h)
        h = nn.functional.leaky_relu(self.bn7(self.linear2(h)), 0.2)
        h = self.dp2(h)
        return self.linear3(h)


class DGCNNSemSegTorch(nn.Module):
    """Twin of models/dgcnn.py::DGCNNSemSeg (canonical DGCNN_semseg layout:
    convert_dgcnn_semseg / export_dgcnn_semseg key schema).  Stage 1 builds
    the graph over the normalized room coordinates (input channels 6:9)
    while the edge features keep all 9 channels."""

    def __init__(self, emb_dims: int = 1024, k: int = 20,
                 num_classes: int = 13, dropout: float = 0.5):
        super().__init__()
        self.k = k
        self.conv1 = _conv2d_block(18, 64)
        self.conv2 = _conv2d_block(64, 64)
        self.conv3 = _conv2d_block(128, 64)
        self.conv4 = _conv2d_block(64, 64)
        self.conv5 = _conv2d_block(128, 64)
        self.conv6 = _conv1d_block(192, emb_dims)
        self.conv7 = _conv1d_block(emb_dims + 192, 512)
        self.conv8 = _conv1d_block(512, 256)
        self.dp1 = nn.Dropout(dropout)
        self.conv9 = nn.Conv1d(256, num_classes, 1, bias=False)

    def forward(self, x: torch.Tensor) -> torch.Tensor:   # x: (B, 9, N)
        n = x.shape[2]
        e = edge_features(x, self.k, graph=x[:, 6:9])
        x1 = self.conv2(self.conv1(e)).max(dim=-1)[0]
        x2 = self.conv4(self.conv3(edge_features(x1, self.k))).max(dim=-1)[0]
        x3 = self.conv5(edge_features(x2, self.k)).max(dim=-1)[0]
        cat = torch.cat((x1, x2, x3), dim=1)               # (B, 192, N)
        g = self.conv6(cat).max(dim=-1, keepdim=True)[0]
        h = torch.cat((g.expand(-1, -1, n), cat), dim=1)
        h = self.conv8(self.conv7(h))
        return self.conv9(self.dp1(h))
