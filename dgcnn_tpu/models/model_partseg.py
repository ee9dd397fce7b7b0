"""The fork's fusion network: DGCNN features + 3D-HOG gradient features fused
through a transformer (reference models/model_partseg.py:95-194).

``Net`` pipeline (reference :174-194):
  src_embedding = DGCNN(src)
  tgt           = HOG(src)            (on-device here; CPU SVD in the reference)
  tgt_embedding = grads_emb(tgt)      conv stack 18 -> emb/8 -> emb/4 -> emb/2 -> emb
  canonical     = pos_mlp(src)        PositionEmbedding -> conv 3 -> emb
  src', tgt'    = transformer(src_embedding+canonical, tgt_embedding+canonical)
                  applied twice with swapped src/tgt (shared weights)
  scores        = MultiheadAttention(query=tgt', key=src', value=src')
  logits        = MLPHead(category_one_hot, scores)

``use_custom_attention`` swaps the torch-style transformer for the fork's
custom vector-attention Transformer (the reference defines the flag,
main_partseg_dist.py:530, but hardwires nn.Transformer; here it is wired).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgcnn_tpu.models.dgcnn import DGCNN, PositionEmbedding
from dgcnn_tpu.models.nn_layers import ConvBN
from dgcnn_tpu.models.torch_transformer import (
    TorchMultiheadAttention,
    TorchTransformer,
)
from dgcnn_tpu.models.transformer import Transformer
from dgcnn_tpu.ops.hog import compute_hog


class MLPHead(nn.Module):
    """Per-point segmentation head with category-one-hot conditioning
    (reference models/model_partseg.py:95-139)."""

    emb_dim: int = 512
    nclasses: int = 50
    dropout: float = 0.5
    axis_name: Optional[str] = None
    dtype: object = jnp.float32   # ConvBN compute dtype (AMP eval: bf16)

    @nn.compact
    def __call__(
        self, label_one_hot: jax.Array, attn: jax.Array, train: bool = False
    ) -> jax.Array:
        b, n, _ = attn.shape
        ax = self.axis_name
        dt = self.dtype
        lbl = ConvBN(64, axis_name=ax, name="label_conv")(
            label_one_hot[:, None, :], train
        )                                                    # (B, 1, 64)
        lbl = jnp.broadcast_to(lbl, (b, n, 64)).astype(attn.dtype)
        x = jnp.concatenate([lbl, attn], axis=-1)            # (B, N, emb+64)
        x = ConvBN(self.emb_dim // 2, axis_name=ax, dtype=dt,
                   name="fc1")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train, name="dp1")(x)
        x = ConvBN(self.emb_dim // 4, axis_name=ax, dtype=dt,
                   name="fc2")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train, name="dp2")(x)
        x = ConvBN(self.emb_dim // 8, axis_name=ax, dtype=dt,
                   name="fc3")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train, name="dp3")(x)
        # final logits in f32 (the loss/argmax consumer contract)
        return nn.Dense(self.nclasses, name="fc4")(x)        # (B, N, nclasses)


class Net(nn.Module):
    """The fork's trained model (reference models/model_partseg.py:142-194)."""

    emb_dim: int = 512
    k: int = 32
    n_heads: int = 4
    n_blocks: int = 2
    ff_dims: int = 512
    d_qkv: int = 64
    dropout: float = 0.5
    nclasses: int = 50
    use_custom_attention: bool = False
    hog_bug_compat: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, src: jax.Array, label_one_hot: jax.Array, train: bool = False
    ) -> jax.Array:
        ax = self.axis_name
        # (B, N, emb)
        src_embedding = DGCNN(self.emb_dim, self.k, axis_name=ax, name="emb_nn")(
            src, train
        )
        # AMP (the default bench paths, train AND eval): transformer stack,
        # grads_emb and MLPHead convs compute in bf16 — params stay f32,
        # BatchNorm/LayerNorm statistics and softmax run f32 — mirroring the
        # reference's fp16-autocast numerics, which the reference applies to
        # the TRAINING forward too (main_partseg_dist.py:221 wraps the train
        # step in torch.cuda.amp.autocast; bf16 needs no GradScaler).  In
        # training this halves the dense-attention prob-tensor HBM traffic
        # (flash is off under prob-dropout) and every activation round-trip
        # in the fwd+bwd pair.  DGCNN_TPU_PALLAS_EXACT=1 keeps everything
        # f32 (parity tests).
        import os as _os

        xf_dtype = (jnp.float32
                    if _os.environ.get("DGCNN_TPU_PALLAS_EXACT")
                    else jnp.bfloat16)

        # (B, N, 18) — on-device HOG (reference round-trips through CPU LAPACK)
        tgt = compute_hog(src, self.k, bug_compat=self.hog_bug_compat)
        h = tgt
        for i, feat in enumerate(
            [self.emb_dim // 8, self.emb_dim // 4, self.emb_dim // 2, self.emb_dim]
        ):
            h = ConvBN(feat, axis_name=ax, dtype=xf_dtype,
                       name=f"grads_emb_{i}")(h, train)
        tgt_embedding = h                                     # (B, N, emb)

        canonical_xyz = PositionEmbedding(self.k, axis_name=ax, name="pos_embed")(
            src, train
        )
        canonical = ConvBN(self.emb_dim, axis_name=ax, name="pos_conv")(
            canonical_xyz, train
        )                                                     # (B, N, emb)

        src_e = src_embedding + canonical
        tgt_e = tgt_embedding + canonical

        if self.use_custom_attention:
            src_p, tgt_p = Transformer(
                self.emb_dim, self.n_blocks, self.d_qkv, self.k,
                self.ff_dims, self.dropout, ax, name="transformer",
            )(src_e, tgt_e, src, train)
        else:
            # activations mirror the reference's *effective* behaviour (see
            # torch_transformer.py docstring: torch's layer cloning keeps the
            # requested LeakyReLU in the encoder but resets decoders to relu)
            transformer = TorchTransformer(
                d_model=self.emb_dim,
                nhead=self.n_heads,
                num_encoder_layers=self.n_blocks,
                num_decoder_layers=self.n_blocks,
                dim_feedforward=self.ff_dims,
                dropout=self.dropout,
                encoder_activation="leaky_relu",
                decoder_activation="relu",
                dtype=xf_dtype,
                name="transformer",
            )
            # the reference calls the SAME transformer twice with swapped
            # (src, tgt) (model_partseg.py:187-188) — weight-shared, so both
            # passes stack on the batch axis and run as ONE pipeline:
            # dec(tgt2, enc(src2)) over src2=[src_e;tgt_e], tgt2=[tgt_e;src_e]
            # computes [T(src_e,tgt_e); T(tgt_e,src_e)] exactly, halving the
            # kernel-launch count (and drawing fresh dropout masks per half,
            # like torch — two flax calls would reuse the per-path rng)
            both = transformer(
                jnp.concatenate([src_e, tgt_e], axis=0),
                jnp.concatenate([tgt_e, src_e], axis=0), train)
            src_p, tgt_p = jnp.split(both, 2, axis=0)

        scores = TorchMultiheadAttention(
            self.emb_dim, self.n_heads, self.dropout, dtype=xf_dtype,
            name="attention"
        )(tgt_p, src_p, src_p, train)

        return MLPHead(
            self.emb_dim, self.nclasses, self.dropout, ax, dtype=xf_dtype,
            name="head"
        )(label_one_hot, scores, train)
