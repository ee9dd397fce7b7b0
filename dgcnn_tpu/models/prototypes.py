"""Notebook prototype layers (reference test.ipynb cells 28-29, 35-36) —
model-zoo extras completing SURVEY.md §2 #33.

These never graduated into the reference repo proper (they are prototyping
artifacts of the fork's research), but are ported so a user of the
reference notebook finds them here: the cross-modal multi-head attention
(cell 35), the offset attention block fusing gradient and graph features
(cell 36), and the Hengshuang-style Point Transformer layer (cells 28-29).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgcnn_tpu.models.nn_layers import BatchNorm
from dgcnn_tpu.ops.knn import knn
from dgcnn_tpu.ops.graph import gather_neighbors


class CrossModalMultiHeadAttention(nn.Module):
    """test.ipynb cell 35: queries projected from the gradient features
    (d_grads), keys/values from the graph features (d_graph); output
    projected back to d_graph.  The reference L1-normalizes the attention
    AFTER softmax (a mathematical no-op kept for fidelity) and applies
    dropout to the weights."""

    d_graph: int
    d_grads: int
    d_k: int
    num_heads: int
    d_v: Optional[int] = None
    dropout: float = 0.1

    @nn.compact
    def __call__(self, queries: jax.Array, keys: jax.Array,
                 values: jax.Array, train: bool = False) -> jax.Array:
        h, dk = self.num_heads, self.d_k
        dv = self.d_k if self.d_v is None else self.d_v
        b, nq, _ = queries.shape
        nk = keys.shape[1]
        q = nn.Dense(h * dk, name="fc_q")(queries).reshape(b, nq, h, dk)
        k = nn.Dense(h * dk, name="fc_k")(keys).reshape(b, nk, h, dk)
        v = nn.Dense(h * dv, name="fc_v")(values).reshape(b, nk, h, dv)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(dk, q.dtype))
        att = jax.nn.softmax(att, axis=-1)
        att = att / jnp.maximum(
            jnp.sum(jnp.abs(att), axis=-1, keepdims=True), 1e-12)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, nq, h * dv)
        return nn.Dense(self.d_graph, name="fc_o")(out)


class OffsetAttention(nn.Module):
    """test.ipynb cell 36: PCT-style offset attention between gradient
    queries and graph keys/values — ``LBR(attn(grads, graph, graph) -
    graph)`` with a Conv1d+BN+ReLU output block."""

    in_channels_graph: int
    in_channels_grads: int
    mid_channels: int = 64
    out_channels: Optional[int] = None
    num_heads: int = 8
    dropout: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, grads: jax.Array, graph: jax.Array,
                 train: bool = False) -> jax.Array:
        out_c = (self.in_channels_graph if self.out_channels is None
                 else self.out_channels)
        attn = CrossModalMultiHeadAttention(
            d_graph=self.in_channels_graph, d_grads=self.in_channels_grads,
            d_k=self.mid_channels, num_heads=self.num_heads,
            dropout=self.dropout, name="attention",
        )(grads, graph, graph, train)
        y = attn - graph  # the "offset"
        y = nn.Dense(out_c, use_bias=False, name="lbr_conv")(y)
        y = BatchNorm(axis_name=self.axis_name, name="lbr_bn")(y, train)
        return nn.relu(y)


class PointTransformerLayer(nn.Module):
    """test.ipynb cells 28-29 (Hengshuang Point Transformer layer): kNN in
    xyz space, subtraction vector attention with a learned relative-position
    encoding, softmax + L1-normalize over the k axis, residual output."""

    d_points: int = 256
    d_model: int = 64
    k: int = 16

    @nn.compact
    def __call__(self, xyz: jax.Array, features: jax.Array) -> jax.Array:
        idx = knn(xyz, self.k)                              # (B, N, k)
        knn_xyz = gather_neighbors(xyz, idx)                # (B, N, k, 3)
        pre = features
        x = nn.Dense(self.d_model, name="fc1")(features)
        q = nn.Dense(self.d_model, use_bias=False, name="w_qs")(x)
        k_ = gather_neighbors(
            nn.Dense(self.d_model, use_bias=False, name="w_ks")(x), idx)
        v = gather_neighbors(
            nn.Dense(self.d_model, use_bias=False, name="w_vs")(x), idx)

        rel = xyz[:, :, None] - knn_xyz                     # (B, N, k, 3)
        pos = nn.Dense(self.d_model, name="fc_delta_0")(rel)
        pos = nn.Dense(self.d_model, name="fc_delta_1")(nn.relu(pos))

        attn = q[:, :, None] - k_ + pos
        attn = nn.Dense(self.d_model, name="fc_gamma_0")(attn)
        attn = nn.Dense(self.d_model, name="fc_gamma_1")(nn.relu(attn))
        attn = jax.nn.softmax(attn, axis=-2)                # over k
        attn = attn / jnp.maximum(
            jnp.sum(jnp.abs(attn), axis=-2, keepdims=True), 1e-12)
        res = jnp.einsum("bnkf,bnkf->bnf", attn, v + pos)
        return nn.Dense(self.d_points, name="fc2")(res) + pre
