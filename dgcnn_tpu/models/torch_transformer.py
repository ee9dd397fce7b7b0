"""Faithful functional equivalent of ``torch.nn.Transformer`` /
``torch.nn.MultiheadAttention`` (the modules the fork's ``Net`` instantiates at
reference models/model_partseg.py:167-171), in channels-last flax.linen.

Semantics matched: batch_first layout, post-LayerNorm residual blocks
(norm_first=False), packed qkv input projection + output projection with bias,
dropout on attention weights and residual branches, final LayerNorm after both
encoder and decoder stacks.

Feed-forward activation quirk (verified empirically against torch): the
reference passes ``activation=nn.LeakyReLU(0.2)`` (model_partseg.py:170), but
``nn.Transformer`` clones its layers with ``copy.deepcopy`` and
``TransformerDecoderLayer``'s ``__setstate__`` resets a Module-instance
activation to ``F.relu`` while the encoder clones keep the module — so the
reference's trained model effectively ran **LeakyReLU(0.2) in the encoder and
relu in the decoder**.  ``TorchTransformer`` therefore takes per-stack
``encoder_activation`` / ``decoder_activation`` (both default "relu", the
torch default); the fusion Net passes the reference-effective combination.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgcnn_tpu.models.nn_layers import leaky_relu


def _pallas_ok(qshape, kshape) -> bool:
    import os

    if os.environ.get("DGCNN_TPU_FLASH") == "0":
        return False
    if qshape[2] % 128 or kshape[2] % 128 or qshape[3] % 128:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _use_flash(train: bool, dropout: float, qshape, kshape) -> bool:
    """Serve eval/dropout-free softmax attention with the blockwise (flash)
    library kernel: TPU backend, block-aligned lengths and head dim, not
    disabled (DGCNN_TPU_FLASH=0).  Only reached when the fused kernel's
    shape guard rejects (it is faster where supported: 8.2 vs 8.7 ms at
    B128 h2 N2048 d256, tools/ubench_attention.py).

    Off under DGCNN_TPU_PALLAS_EXACT=1: exact mode must take the dense XLA
    fallback (reference nn.MultiheadAttention semantics op for op,
    reference models/model_partseg.py:190-191).  This check was missing in
    r4 and routed exact-mode TRAINING through the flash kernel, whose f32
    backward OOMs scoped VMEM at 1024 blocks (BENCH_r04 rc=1)."""
    import os

    if os.environ.get("DGCNN_TPU_PALLAS_EXACT"):
        return False
    return not (train and dropout > 0.0) and _pallas_ok(qshape, kshape)


# cap the live (b, h, q_chunk, nk) f32 score slab of the chunked dense
# fallback; 512 MB keeps chip-scale exact eval (stacked B64 fusion Net:
# 4.3 GB full scores) to 16 sequential chunks while leaving tiny CPU-test
# shapes on the single-pass (nc == 1) path, bit-identical to the
# pre-chunking code.
_DENSE_CHUNK_BYTES = 512 * 1024 * 1024


def _dense_q_chunks(qshape, kshape) -> int:
    """Number of query chunks for the dense XLA fallback: smallest power
    of two dividing nq whose per-chunk f32 score slab fits the cap (1 =
    no chunking)."""
    b, h, nq, _ = qshape
    nk = kshape[2]
    if not all(isinstance(x, int) for x in (b, h, nq, nk)):
        # shape-polymorphic export (dgcnn_tpu/export.py): the byte bound
        # is undecidable on symbolic dims — keep the single-pass path
        return 1
    full = 4 * b * h * nq * nk
    nc = 1
    while full // nc > _DENSE_CHUNK_BYTES and nq % (nc * 2) == 0:
        nc *= 2
    return nc


def _use_fused(train: bool, dropout: float, qshape, kshape) -> bool:
    """Serve softmax attention with the fused whole-KV-resident kernel
    (ops/pallas_attention.py): the (B, h, N, N) prob/mask tensors never
    touch HBM in fwd OR bwd — including TRAINING with prob-dropout, drawn
    from the on-core PRNG (no other path avoids materializing the mask).
    Off under DGCNN_TPU_PALLAS_EXACT=1 — exact mode keeps the dense XLA
    fallback (reference softmax+dropout+matmul semantics, op for op)."""
    import os

    from dgcnn_tpu.ops import pallas_attention

    if os.environ.get("DGCNN_TPU_PALLAS_EXACT"):
        return False
    if os.environ.get("DGCNN_TPU_FUSED_ATTN") == "0":  # experiments
        return False
    return _pallas_ok(qshape, kshape) and pallas_attention.supported(
        qshape, kshape)


class TorchMultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention(batch_first=True) equivalent: packed
    in-projection (3E x E weight + 3E bias) and out-projection with bias.

    ``dtype`` is the COMPUTE dtype (params stay f32): bf16 on the AMP eval
    path mirrors the reference's fp16-autocast numerics and doubles MXU
    rate / halves activation HBM; softmax runs in f32 either way (the
    flash kernel normalizes in f32 internally; the XLA fallback upcasts).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        e, h = self.embed_dim, self.num_heads
        assert e % h == 0
        d = e // h
        b, nq, _ = query.shape

        w_in = self.param(
            "in_proj_weight",
            nn.initializers.xavier_uniform(),
            (3 * e, e),
        )
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        dt = self.dtype
        w_in = w_in.astype(dt)
        b_in = b_in.astype(dt)
        query, key, value = (x.astype(dt) for x in (query, key, value))
        # Tried and rejected (r3): packing the shared-input projections
        # into one E->3E (self-attn) / E->2E (cross-attn) matmul measured
        # 19% SLOWER at the fusion-Net stack shape (90.9 -> 108.4 ms,
        # tools/ubench_partseg_parts.py --part xform) — slicing the packed
        # output forces a relayout that costs more than the saved input
        # re-reads.  Three separate dots also keep per-column bit parity
        # trivially.
        q = query @ w_in[:e].T + b_in[:e]
        k = key @ w_in[e : 2 * e].T + b_in[e : 2 * e]
        v = value @ w_in[2 * e :].T + b_in[2 * e :]

        def heads(x):
            return x.reshape(b, -1, h, d).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        if _use_fused(train, self.dropout, q.shape, k.shape):
            # fused whole-KV-resident attention; in training the prob-
            # dropout mask is drawn by the on-core PRNG inside the kernel
            # (ops/pallas_attention.py): probs and mask stay in VMEM; the
            # custom VJP regenerates the mask from the seed instead of
            # saving (B, h, N, N) tensors for the backward.  One fresh
            # int32 seed per call from the module's dropout stream (a
            # different Bernoulli stream than nn.Dropout's — same
            # distribution, documented deviation).
            from dgcnn_tpu.ops.pallas_attention import fused_attention

            rate = self.dropout if train else 0.0
            seed = (jax.random.randint(
                self.make_rng("dropout"), (1,), 0,
                jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
                if rate > 0.0 else None)
            out = fused_attention(
                q, k, v, sm_scale=1.0 / float(d) ** 0.5,
                dropout_rate=rate, seed=seed)
        elif _use_flash(train, self.dropout, q.shape, k.shape):
            # blockwise (flash) attention: the (B, h, Nq, Nk) score/prob
            # tensors never leave VMEM — exact softmax attention with
            # online normalization (identical math, fp-level differences).
            # Block sizes matter: the library default (128) is 2x SLOWER
            # than XLA's dense attention at this shape; 1024 blocks are
            # 2.1x FASTER (B64 h2 N2048 d256: XLA 10.6 ms, flash-128
            # 21.4 ms, flash-1024 4.95 ms).  f32 inputs double every VMEM
            # slab, so cap blocks at 512 there (1024 OOMs the scoped-VMEM
            # limit in flash_mha_bwd_dq: 22.3M > 18M) — the tuned 1024 is
            # for the bf16 AMP path.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes,
                flash_attention,
            )

            cap = 1024 if q.dtype == jnp.bfloat16 else 512

            def blk(n):
                return max(b for b in (1024, 512, 256, 128)
                           if n % b == 0 and b <= cap)

            bq, bk = blk(q.shape[2]), blk(k.shape[2])
            bs = BlockSizes(
                block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
                block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk,
                block_q_dq=bq,
            )
            out = flash_attention(q, k, v, sm_scale=1.0 / float(d) ** 0.5,
                                  block_sizes=bs)
        else:
            # EXACT/XLA dense fallback (reference nn.MultiheadAttention
            # semantics op for op, reference models/model_partseg.py:190).
            # At chip scale the (b, h, nq, nk) f32 score/prob tensors are
            # huge — (128, 2, 2048, 2048) = 4.3 GB EACH at the fusion
            # Net's stacked batch-64 eval — and OOM the 16 GB HBM (the
            # r5 exact-eval drift child died RESOURCE_EXHAUSTED here), so
            # the dropout-free case streams query chunks through a
            # lax.map: per-row math is identical (softmax still reduces
            # over the FULL key axis) and jax.checkpoint keeps the
            # backward from stacking per-chunk probs as scan residuals.
            # With live prob-dropout the unchunked path is kept: one
            # whole-tensor mask draw, reference dropout semantics.
            nc = _dense_q_chunks(q.shape, k.shape)
            if nc == 1 or (train and self.dropout > 0.0):
                scores = jnp.einsum(
                    "bhqd,bhkd->bhqk", q, k,
                    preferred_element_type=jnp.float32) / jnp.sqrt(
                    jnp.asarray(d, jnp.float32)
                )
                attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
                attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
                out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            else:
                scale = jnp.sqrt(jnp.asarray(d, jnp.float32))

                @jax.checkpoint
                def _one_chunk(qi):
                    s = jnp.einsum(
                        "bhqd,bhkd->bhqk", qi, k,
                        preferred_element_type=jnp.float32) / scale
                    a = jax.nn.softmax(s, axis=-1).astype(qi.dtype)
                    return jnp.einsum("bhqk,bhkd->bhqd", a, v)

                qc = q.reshape(b, h, nc, nq // nc, d).transpose(
                    2, 0, 1, 3, 4)
                out = jax.lax.map(_one_chunk, qc)
                out = out.transpose(1, 2, 0, 3, 4).reshape(b, h, nq, d)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, e)
        return nn.Dense(e, name="out_proj", dtype=self.dtype)(out)


class _FeedForward(nn.Module):
    d_model: int
    dim_feedforward: int
    dropout: float
    activation: str = "relu"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(self.dim_feedforward, name="linear1",
                     dtype=self.dtype)(x)
        if self.activation == "relu":
            x = nn.relu(x)
        elif self.activation == "leaky_relu":
            x = leaky_relu(x, 0.2)
        else:
            raise ValueError(self.activation)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.d_model, name="linear2",
                        dtype=self.dtype)(x)


class TorchTransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        sa = TorchMultiheadAttention(
            self.d_model, self.nhead, self.dropout, dtype=self.dtype,
            name="self_attn"
        )(x, x, x, train)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            x + nn.Dropout(self.dropout, deterministic=not train)(sa)
        )
        ff = _FeedForward(
            self.d_model, self.dim_feedforward, self.dropout,
            self.activation, dtype=self.dtype, name="ff"
        )(x, train)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(
            x + nn.Dropout(self.dropout, deterministic=not train)(ff)
        )


class TorchTransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, memory: jax.Array, train: bool = False
    ) -> jax.Array:
        sa = TorchMultiheadAttention(
            self.d_model, self.nhead, self.dropout, dtype=self.dtype,
            name="self_attn"
        )(x, x, x, train)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            x + nn.Dropout(self.dropout, deterministic=not train)(sa)
        )
        ca = TorchMultiheadAttention(
            self.d_model, self.nhead, self.dropout, dtype=self.dtype,
            name="multihead_attn"
        )(x, memory, memory, train)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(
            x + nn.Dropout(self.dropout, deterministic=not train)(ca)
        )
        ff = _FeedForward(
            self.d_model, self.dim_feedforward, self.dropout,
            self.activation, dtype=self.dtype, name="ff"
        )(x, train)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(
            x + nn.Dropout(self.dropout, deterministic=not train)(ff)
        )


class TorchTransformer(nn.Module):
    """torch.nn.Transformer equivalent (encoder-decoder, post-norm, final
    LayerNorms), matching the fork's instantiation
    (reference model_partseg.py:167-170)."""

    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    encoder_activation: str = "relu"
    decoder_activation: str = "relu"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self, src: jax.Array, tgt: jax.Array, train: bool = False
    ) -> jax.Array:
        mem = src
        for i in range(self.num_encoder_layers):
            mem = TorchTransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                self.encoder_activation,
                dtype=self.dtype,
                name=f"encoder_layer_{i}",
            )(mem, train)
        mem = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="encoder_norm")(mem)
        out = tgt
        for i in range(self.num_decoder_layers):
            out = TorchTransformerDecoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                self.decoder_activation,
                dtype=self.dtype,
                name=f"decoder_layer_{i}",
            )(out, mem, train)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")(out)
