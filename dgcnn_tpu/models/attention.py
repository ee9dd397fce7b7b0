"""Attention modules (reference models/attention.py).

* ``MultiHeadedAttention`` — annotated-transformer style MHA with four Linears
  (reference attention.py:31-71); defined in the reference but unused by the
  trained ``Net`` — kept for API parity.
* ``VectorAttention`` — Point-Transformer-style subtraction attention
  (reference attention.py:74-157).
* ``MultiHeadVectorAttention`` — multi-head variant with a grouped attn-MLP
  (reference attention.py:160-255).

Reference quirks preserved exactly (documented):
  - qk_rel subtracts *gathered* queries from gathered keys (q_j - k_j, not the
    Point-Transformer q_i - k_j) — attention.py:125-130.
  - single-head: softmax over the channel dim then L2-normalize over k
    (attention.py:145-146); multi-head: softmax over neighbours then
    L2-normalize over points (attention.py:242-243) — inconsistent in the
    reference, replicated as-is.
Reference bugs fixed (documented deviation, like ops/hog.py): the gathers at
attention.py:115-134 flatten (B, N) without the per-batch base offset and view
the (B, 3, N) pointcloud untransposed; here the gather is per-batch and the
pointcloud is true xyz rows.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgcnn_tpu.ops.graph import gather_neighbors
from dgcnn_tpu.ops.knn import knn


def scaled_dot_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    mask: Optional[jax.Array] = None,
    dropout: Optional[nn.Module] = None,
    deterministic: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Scaled dot-product attention (reference attention.py:17-28)."""
    d_k = query.shape[-1]
    scores = jnp.einsum("...qd,...kd->...qk", query, key) / jnp.sqrt(
        jnp.asarray(d_k, query.dtype)
    )
    if mask is not None:
        scores = jnp.where(mask == 0, -1e9, scores)
    p_attn = jax.nn.softmax(scores, axis=-1)
    if dropout is not None:
        p_attn = dropout(p_attn, deterministic=deterministic)
    return jnp.einsum("...qk,...kd->...qd", p_attn, value), p_attn


class MultiHeadedAttention(nn.Module):
    """Four-Linear multi-head attention (reference attention.py:31-71)."""

    h: int
    d_model: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        assert self.d_model % self.h == 0
        d_k = self.d_model // self.h
        b = query.shape[0]

        def split(x, name):
            x = nn.Dense(self.d_model, name=name)(x)
            return x.reshape(b, -1, self.h, d_k).transpose(0, 2, 1, 3)

        q = split(query, "w_q")
        k = split(key, "w_k")
        v = split(value, "w_v")
        if mask is not None:
            mask = mask[:, None]
        drop = nn.Dropout(self.dropout)
        x, _ = scaled_dot_attention(
            q, k, v, mask, dropout=drop, deterministic=not train
        )
        x = x.transpose(0, 2, 1, 3).reshape(b, -1, self.h * d_k)
        return nn.Dense(self.d_model, name="w_out")(x)


class VectorAttention(nn.Module):
    """Single-head vector (subtraction) attention over kNN neighbourhoods
    (reference attention.py:74-157)."""

    emb_dim: int
    d_qkv: int = 64
    k: int = 32
    pos_mlp_hidden_dim: int = 64
    attn_mlp_hidden_mult: int = 4

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        canonical: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        q = nn.Dense(self.d_qkv, use_bias=False, name="w_q")(query)
        k_ = nn.Dense(self.d_qkv, use_bias=False, name="w_k")(key)
        v = nn.Dense(self.d_qkv, use_bias=False, name="w_v")(value)

        idx = knn(canonical, self.k)                      # (B, N, k)
        pos_nn = gather_neighbors(canonical, idx)
        rel = pos_nn - canonical[:, :, None, :]
        pe = nn.Dense(self.pos_mlp_hidden_dim, name="pos_mlp_1")(rel)
        pe = nn.relu(pe)
        rel_pos_emb = nn.Dense(self.d_qkv, name="pos_mlp_2")(pe)

        # reference gathers q and k with the same neighbour index (q_j - k_j)
        qk_rel = gather_neighbors(q - k_, idx)
        v_g = gather_neighbors(v, idx) + rel_pos_emb

        sim = nn.Dense(self.d_qkv * self.attn_mlp_hidden_mult, name="attn_mlp_1")(
            qk_rel + rel_pos_emb
        )
        sim = nn.relu(sim)
        sim = nn.Dense(self.d_qkv, name="attn_mlp_2")(sim)

        # reference attention.py:145-146: softmax over channels, L2 over k
        attn = jax.nn.softmax(sim, axis=-1)
        norm = jnp.sqrt(jnp.sum(jnp.square(attn), axis=-2, keepdims=True))
        attn = attn / jnp.maximum(norm, 1e-12)

        agg = jnp.sum(attn * v_g, axis=2)                 # (B, N, d_qkv)
        return nn.Dense(self.emb_dim, name="to_out")(agg)


class MultiHeadVectorAttention(nn.Module):
    """Multi-head vector attention with a grouped (per-head) attention MLP
    (reference attention.py:160-255)."""

    emb_dim: int
    n_heads: int = 4
    dim_head: int = 64
    k: int = 32
    pos_mlp_hidden_dim: int = 64
    attn_mlp_hidden_mult: int = 4

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        canonical: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        h, d = self.n_heads, self.dim_head
        inner = h * d
        b, n = query.shape[0], query.shape[1]

        q = nn.Dense(inner, use_bias=False, name="w_q")(query)
        k_ = nn.Dense(inner, use_bias=False, name="w_k")(key)
        v = nn.Dense(inner, use_bias=False, name="w_v")(value)

        idx = knn(canonical, self.k)
        pos_nn = gather_neighbors(canonical, idx)
        rel = pos_nn - canonical[:, :, None, :]
        pe = nn.Dense(self.pos_mlp_hidden_dim, name="pos_mlp_1")(rel)
        pe = nn.relu(pe)
        rel_pos_emb = nn.Dense(inner, name="pos_mlp_2")(pe)  # (B, N, k, h*d)

        qk_rel = gather_neighbors(q - k_, idx)               # (B, N, k, h*d)
        v_g = gather_neighbors(v, idx) + rel_pos_emb

        # grouped conv == block-diagonal per-head dense (reference :189-193)
        x = (qk_rel + rel_pos_emb).reshape(b, n, self.k, h, d)
        w1 = self.param(
            "attn_mlp_1",
            nn.initializers.lecun_normal(),
            (h, d, d * self.attn_mlp_hidden_mult),
        )
        b1 = self.param(
            "attn_mlp_1_bias",
            nn.initializers.zeros,
            (h, d * self.attn_mlp_hidden_mult),
        )
        x = nn.relu(jnp.einsum("bnkhd,hde->bnkhe", x, w1) + b1)
        w2 = self.param(
            "attn_mlp_2",
            nn.initializers.lecun_normal(),
            (h, d * self.attn_mlp_hidden_mult, d),
        )
        b2 = self.param("attn_mlp_2_bias", nn.initializers.zeros, (h, d))
        sim = (jnp.einsum("bnkhe,hed->bnkhd", x, w2) + b2).reshape(
            b, n, self.k, inner
        )

        # reference attention.py:242-243: softmax over neighbours, L2 over
        # the *points* axis (sim viewed as (b, h*d, i, j): dim -1 = j, -2 = i)
        attn = jax.nn.softmax(sim, axis=2)
        norm = jnp.sqrt(jnp.sum(jnp.square(attn), axis=1, keepdims=True))
        attn = attn / jnp.maximum(norm, 1e-12)

        agg = jnp.sum(attn * v_g, axis=2)                    # (B, N, h*d)
        return nn.Dense(self.emb_dim, name="to_out")(agg)
