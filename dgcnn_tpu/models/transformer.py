"""The fork's custom transformer (reference models/transformer.py): an
annotated-transformer EncoderDecoder whose norms are **BatchNorm1d** (not
LayerNorm — reference transformer.py:44, 61, 79) and whose attention is
``VectorAttention`` over kNN neighbourhoods of the point cloud.

Reference quirks preserved:
  - ``SublayerConnection`` adds the *normed* input to the sublayer output
    (x = norm(x); x + dropout(sublayer(x)) — transformer.py:82-86), i.e. the
    residual stream is re-normalized every sublayer.
  - The feed-forward uses LeakyReLU(0.1) then BatchNorm then Dropout
    (transformer.py:124-138).
  - The top-level ``Transformer`` runs the same EncoderDecoder twice with
    swapped src/tgt, sharing weights (transformer.py:171-175), returning
    (src_embedding, tgt_embedding).
"""
from __future__ import annotations

from typing import Optional

from flax import linen as nn

from dgcnn_tpu.models.attention import VectorAttention
from dgcnn_tpu.models.nn_layers import BatchNorm, leaky_relu


class SublayerConnection(nn.Module):
    dropout: float
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, sublayer, train: bool = False):
        x = BatchNorm(axis_name=self.axis_name, name="norm")(x, train)
        return x + nn.Dropout(self.dropout, deterministic=not train)(sublayer(x))


class PositionwiseFeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.d_ff, name="w_1")(x)
        x = leaky_relu(x, 0.1)
        x = BatchNorm(axis_name=self.axis_name, name="norm")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.d_model, name="w_2")(x)


class EncoderLayer(nn.Module):
    emb_dim: int
    d_qkv: int
    k: int
    ff_dims: int
    dropout: float
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, pointcloud, train: bool = False):
        attn = VectorAttention(
            self.emb_dim, self.d_qkv, self.k, name="self_attn"
        )
        ff = PositionwiseFeedForward(
            self.emb_dim, self.ff_dims, self.dropout, self.axis_name, name="ff"
        )
        x = SublayerConnection(self.dropout, self.axis_name, name="sub0")(
            x, lambda y: attn(y, y, y, pointcloud, train), train
        )
        return SublayerConnection(self.dropout, self.axis_name, name="sub1")(
            x, lambda y: ff(y, train), train
        )


class DecoderLayer(nn.Module):
    emb_dim: int
    d_qkv: int
    k: int
    ff_dims: int
    dropout: float
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, memory, pointcloud, train: bool = False):
        self_attn = VectorAttention(
            self.emb_dim, self.d_qkv, self.k, name="self_attn"
        )
        src_attn = VectorAttention(
            self.emb_dim, self.d_qkv, self.k, name="src_attn"
        )
        ff = PositionwiseFeedForward(
            self.emb_dim, self.ff_dims, self.dropout, self.axis_name, name="ff"
        )
        m = memory
        x = SublayerConnection(self.dropout, self.axis_name, name="sub0")(
            x, lambda y: self_attn(y, y, y, pointcloud, train), train
        )
        x = SublayerConnection(self.dropout, self.axis_name, name="sub1")(
            x, lambda y: src_attn(y, m, m, pointcloud, train), train
        )
        return SublayerConnection(self.dropout, self.axis_name, name="sub2")(
            x, lambda y: ff(y, train), train
        )


class EncoderDecoder(nn.Module):
    emb_dim: int
    d_qkv: int
    k: int
    ff_dims: int
    n_blocks: int
    dropout: float
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, src, tgt, pointcloud, train: bool = False):
        x = src
        for i in range(self.n_blocks):
            x = EncoderLayer(
                self.emb_dim, self.d_qkv, self.k, self.ff_dims, self.dropout,
                self.axis_name, name=f"encoder_layer_{i}",
            )(x, pointcloud, train)
        memory = BatchNorm(axis_name=self.axis_name, name="encoder_norm")(x, train)
        y = tgt
        for i in range(self.n_blocks):
            y = DecoderLayer(
                self.emb_dim, self.d_qkv, self.k, self.ff_dims, self.dropout,
                self.axis_name, name=f"decoder_layer_{i}",
            )(y, memory, pointcloud, train)
        return BatchNorm(axis_name=self.axis_name, name="decoder_norm")(y, train)


class Transformer(nn.Module):
    """Top-level custom transformer (reference transformer.py:141-177).

    ``__call__(src, tgt, pointcloud)`` with channels-last (B, N, emb) inputs
    and (B, N, 3) pointcloud; returns (src_embedding, tgt_embedding) — the
    shared EncoderDecoder applied to (src, tgt) and (tgt, src) respectively,
    mirroring the reference's swapped double application.
    """

    emb_dim: int = 512
    n_blocks: int = 1
    d_qkv: int = 64
    k: int = 32
    ff_dims: int = 512
    dropout: float = 0.5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, src, tgt, pointcloud, train: bool = False):
        model = EncoderDecoder(
            self.emb_dim, self.d_qkv, self.k, self.ff_dims, self.n_blocks,
            self.dropout, self.axis_name, name="model",
        )
        tgt_embedding = model(src, tgt, pointcloud, train)
        src_embedding = model(tgt, src, pointcloud, train)
        return src_embedding, tgt_embedding
