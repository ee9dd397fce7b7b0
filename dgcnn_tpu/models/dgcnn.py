"""DGCNN model family, channels-last flax.linen.

* ``DGCNN`` — the fork's 4-block backbone (reference models/dgcnn.py:47-103).
* ``DGCNNCls`` / ``PointNet`` / ``DGCNNPartSeg`` / ``DGCNNSemSeg`` /
  ``TransformNet`` — the canonical architectures whose imports dangle in the
  fork (SURVEY.md §2 #35; main_cls.py:25, main_semseg.py:20) — restored from
  the README descriptions (README.md:10, 236) and test.ipynb cells 8-9.

Every EdgeConv recomputes the kNN graph in feature space (the "dynamic" graph)
and runs through the fused gather/reduce kernels in ops/edge_conv.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgcnn_tpu.models.nn_layers import (
    BatchNorm,
    ConvBN,
    DenseBNReLU,
    EdgeConv,
    leaky_relu,
)
from dgcnn_tpu.ops.knn import knn, use_pallas
from dgcnn_tpu.ops.pool import global_max, global_mean


def _edge_block2(ec, cb, x, graph, k, train, slope=0.2, eps=1e-5):
    """Two-conv EdgeConv stage: conv1(edge) -> BN -> LReLU -> conv2 -> BN ->
    LReLU -> max over k (the upstream partseg/semseg block shape).  On TPU the
    per-edge tensors never exist: eval runs one fused Pallas kernel
    (ops/pallas_knn.fused_knn_edge2); training runs the extraction kernel for
    idx + BN1 statistics (knn_edge_reduce) followed by the index-driven
    edge2_reduce kernel for BN2 statistics and the max/min reduction, with a
    Pallas custom VJP."""
    from dgcnn_tpu.ops.knn import use_pallas

    if (not train) and use_pallas(graph.shape[1]):
        from dgcnn_tpu.ops.edge_conv import _project, fold_bn
        from dgcnn_tpu.ops.pallas_knn import fused_knn_edge2

        w_nbr, w_ctr, g1, be1, m1, v1 = ec(x, return_params=True)
        dummy = jnp.zeros((1, w_nbr.shape[1]), jnp.float32)
        k2, g2, be2, m2, v2 = cb(dummy, return_params=True)
        s1, t1 = fold_bn(g1, be1, m1, v1, eps)
        s2, t2 = fold_bn(g2, be2, m2, v2, eps)
        a1 = _project(x, w_nbr)
        b1 = _project(x, w_ctr)
        from dgcnn_tpu.ops.pallas_banded import (
            banded_applicable,
            banded_knn_edge2,
            fast_extract_band,
        )

        band = fast_extract_band()
        if banded_applicable(graph.shape[1], band):
            # gated approximate fast path (--fast_extract): candidates
            # pruned to a PC1-sorted band; accept only while the semseg
            # drift gate (tools/parity_drift.py) stays >= 99.5%
            return banded_knn_edge2(graph, a1, b1, s1, t1, k2, s2, t2, k,
                                    band, slope)
        return fused_knn_edge2(graph, a1, b1, s1, t1, k2, s2, t2, k, slope)
    if train and use_pallas(graph.shape[1]):
        from dgcnn_tpu.ops.edge_conv import _project
        from dgcnn_tpu.ops.pallas_knn import edge2_reduce, knn_edge_reduce

        w_nbr, w_ctr, _, _, _, _ = ec(x, return_params=True)
        dummy = jnp.zeros((1, w_nbr.shape[1]), jnp.float32)
        w2, _, _, _, _ = cb(dummy, return_params=True)
        a1 = _project(x, w_nbr)
        b1 = _project(x, w_ctr)
        idx, _, _, asum1, asumsq1 = knn_edge_reduce(graph, a1, k)
        # BN1 statistics of the virtual per-edge conv1 output, in closed form
        mean1 = jnp.mean(asum1, axis=(0, 1)) / k + jnp.mean(b1, axis=(0, 1))
        e_ag2 = jnp.mean(asumsq1, axis=(0, 1)) / k
        e_ab = jnp.mean(asum1 / k * b1, axis=(0, 1))
        e_b2 = jnp.mean(jnp.square(b1), axis=(0, 1))
        var1 = jnp.maximum(
            e_ag2 + 2 * e_ab + e_b2 - jnp.square(mean1), 0.0)
        count = x.shape[0] * x.shape[1] * k
        s1, t1 = ec(x, push_stats=(mean1, var1, count))
        mx2, mn2, sm2, sq2 = edge2_reduce(a1, b1, s1, t1, w2, idx, k, slope)
        mean2 = jnp.mean(sm2, axis=(0, 1)) / k
        var2 = jnp.maximum(
            jnp.mean(sq2, axis=(0, 1)) / k - jnp.square(mean2), 0.0)
        s2, t2 = cb(dummy, push_stats=(mean2, var2, count))
        # max over k of lrelu(s2*z2+t2) == lrelu(s2*(s2>0 ? max : min) + t2)
        sel2 = jnp.where(s2 > 0, mx2, mn2)
        return leaky_relu(sel2 * s2 + t2, slope)
    h = ec(x, knn(graph, k), train)
    h = cb(h, train)
    return jnp.max(h, axis=2)


def _fused_embed_pool(cb, xs, train, with_mean, slope=0.2, eps=1e-5):
    """The embedding conv + global pool, fused on TPU eval: conv -> folded
    BN -> LeakyReLU -> max (+ mean) over N in one kernel consuming the
    stage outputs directly (ops/pallas_pool.py) — neither their concat nor
    the (B, N, emb) activation round-trips HBM.  Returns the (B, rows, emb)
    pooled rows, or None when the fused path cannot serve this call
    (training, pallas off, or VMEM-exceeding shapes)."""
    import os as _os

    from dgcnn_tpu.ops.edge_conv import fold_bn
    from dgcnn_tpu.ops.pallas_pool import conv_pool_supported, fused_conv_pool

    n = xs[0].shape[1]
    width = sum(x.shape[-1] for x in xs)
    if train or not (use_pallas(n)
                     and conv_pool_supported(n, width, cb.features)):
        return None
    kc, gc, bec, mc, vc = cb(
        jnp.zeros((1, 1, width), jnp.float32), return_params=True)
    sc, tc = fold_bn(gc, bec, mc, vc, eps)
    cdt = (jnp.float32 if _os.environ.get("DGCNN_TPU_PALLAS_EXACT")
           else jnp.bfloat16)
    return fused_conv_pool(tuple(xs), kc, sc, tc, slope, compute_dtype=cdt,
                           with_mean=with_mean)


def _embed_max_pool(cb, cat, train, keepdims=False):
    """Embedding conv -> BN -> LeakyReLU -> global max over N (the
    partseg/semseg ``conv6`` + pool, reference model.py DGCNN_partseg /
    DGCNN_semseg)."""
    pm = _fused_embed_pool(cb, (cat,), train, with_mean=False)
    if pm is not None:
        return pm if keepdims else pm[:, 0]
    g = cb(cat, train)
    return global_max(g, keepdims=keepdims)


class DGCNN(nn.Module):
    """The fork's backbone: EdgeConv 6->64->64->128->256, concat -> conv5 to
    ``emb_dims`` per point (reference models/dgcnn.py:47-103).

    Input (B, N, 3) -> output (B, N, emb_dims).
    """

    emb_dims: int = 512
    k: int = 32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ax = self.axis_name
        kk = self.k
        x1 = EdgeConv(64, axis_name=ax, name="conv1")(x, train=train, graph=x, k=kk)
        x2 = EdgeConv(64, axis_name=ax, name="conv2")(x1, train=train, graph=x1, k=kk)
        x3 = EdgeConv(128, axis_name=ax, name="conv3")(x2, train=train, graph=x2, k=kk)
        x4 = EdgeConv(256, axis_name=ax, name="conv4")(x3, train=train, graph=x3, k=kk)
        cat = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # (B, N, 512)
        return ConvBN(self.emb_dims, axis_name=ax, name="conv5")(cat, train)


class TransformNet(nn.Module):
    """Spatial transformer predicting a 3x3 alignment matrix
    (test.ipynb cell 8 / upstream Transform_Net; shared trunk with the fork's
    PositionEmbedding, reference models/layers.py:8-39).

    Input: per-edge features (B, N, k, 6) of the xyz graph — or pass
    ``x``/``k`` (raw points) to let the net build its own graph, which on
    TPU eval fuses the first two convs + max-over-k into one kNN kernel
    (``conv(concat(x_j, x_i))`` factorizes into row slices of the conv1
    kernel — the (B, N, k, 6/64/128) per-edge tensors never exist) and the
    conv3 + global-max into the fused embed-pool.  Output: (B, 3, 3).
    Final layer init: weight 0, bias identity (reference layers.py:38-39).
    """

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, edge_feat: Optional[jax.Array] = None,
                 train: bool = False, *, x: Optional[jax.Array] = None,
                 k: Optional[int] = None) -> jax.Array:
        ax = self.axis_name
        cb1 = ConvBN(64, axis_name=ax, name="conv1")
        cb2 = ConvBN(128, axis_name=ax, name="conv2")
        if edge_feat is None:
            assert x is not None and k is not None, (
                "TransformNet needs edge_feat or (x, k)")
            if (not train) and use_pallas(x.shape[1]):
                from dgcnn_tpu.ops.edge_conv import _project, fold_bn
                from dgcnn_tpu.ops.pallas_knn import fused_knn_edge2

                c = x.shape[-1]
                w1, g1, be1, m1, v1 = cb1(
                    jnp.zeros((1, 1, 2 * c), jnp.float32),
                    return_params=True)
                w2, g2, be2, m2, v2 = cb2(
                    jnp.zeros((1, 1, 64), jnp.float32), return_params=True)
                s1, t1 = fold_bn(g1, be1, m1, v1, 1e-5)
                s2, t2 = fold_bn(g2, be2, m2, v2, 1e-5)
                # edge concat order [neighbour, centre] (ops/graph.py)
                t = fused_knn_edge2(x, _project(x, w1[:c]),
                                    _project(x, w1[c:]), s1, t1, w2, s2, t2,
                                    k, 0.2)
            else:
                from dgcnn_tpu.ops.graph import get_graph_feature

                e = get_graph_feature(x, k)
                t = cb2(cb1(e, train), train)
                t = jnp.max(t, axis=2)              # max over k
        else:
            t = cb2(cb1(edge_feat, train), train)
            t = jnp.max(t, axis=2)                  # max over k -> (B, N, 128)
        t = _embed_max_pool(
            ConvBN(1024, axis_name=ax, name="conv3"), t, train)  # (B, 1024)
        t = DenseBNReLU(512, axis_name=ax, name="linear1")(t, train)
        t = DenseBNReLU(256, axis_name=ax, name="linear2")(t, train)
        t = nn.Dense(
            9,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.eye(3).reshape(9),
            name="transform",
        )(t)
        return t.reshape(t.shape[0], 3, 3)


class PositionEmbedding(nn.Module):
    """The fork's TNet-style canonicalizer (reference models/layers.py:8-74):
    TransformNet trunk, then applies the 3x3 to the cloud and returns the
    transformed xyz (B, N, 3)."""

    k: int = 32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        t = TransformNet(axis_name=self.axis_name, name="tnet")(
            None, train, x=x, k=self.k)
        return jnp.einsum(
            "bnc,bcd->bnd", x, t, precision=jax.lax.Precision.HIGHEST
        )


class DGCNNCls(nn.Module):
    """Canonical classification network (README.md:80-88 results; upstream
    model.py DGCNN_cls): EdgeConv 6->64, 128->64, 128->128, 256->256; conv5 to
    emb_dims; global max+avg pool concat; Linear 512 -> 256 -> classes."""

    emb_dims: int = 1024
    k: int = 20
    dropout: float = 0.5
    output_channels: int = 40
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ax = self.axis_name
        kk = self.k
        x1 = EdgeConv(64, axis_name=ax, name="conv1")(x, train=train, graph=x, k=kk)
        x2 = EdgeConv(64, axis_name=ax, name="conv2")(x1, train=train, graph=x1, k=kk)
        x3 = EdgeConv(128, axis_name=ax, name="conv3")(x2, train=train, graph=x2, k=kk)
        x4 = EdgeConv(256, axis_name=ax, name="conv4")(x3, train=train, graph=x3, k=kk)
        cb5 = ConvBN(self.emb_dims, axis_name=ax, name="conv5")
        pm = _fused_embed_pool(cb5, (x1, x2, x3, x4), train, with_mean=True)
        if pm is not None:
            pooled = jnp.concatenate([pm[:, 0], pm[:, 1]], axis=-1)
        else:
            cat = jnp.concatenate([x1, x2, x3, x4], axis=-1)
            h = cb5(cat, train)
            pooled = jnp.concatenate(
                [global_max(h), global_mean(h)], axis=-1
            )  # (B, 2*emb)
        h = DenseBNReLU(512, axis_name=ax, name="linear1")(pooled, train)
        h = nn.Dropout(self.dropout, deterministic=not train, name="dp1")(h)
        h = nn.Dense(256, name="linear2")(h)
        h = BatchNorm(axis_name=ax, name="bn7")(h, train)
        h = leaky_relu(h, 0.2)
        h = nn.Dropout(self.dropout, deterministic=not train, name="dp2")(h)
        return nn.Dense(self.output_channels, name="linear3")(h)


class PointNet(nn.Module):
    """Canonical PointNet baseline (upstream model.py; main_cls.py:54):
    per-point Conv 3->64->64->64->128->emb with BN+ReLU, global max pool,
    Linear 512 (BN+ReLU+Dropout) -> classes."""

    emb_dims: int = 1024
    dropout: float = 0.5
    output_channels: int = 40
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ax = self.axis_name
        for i, feat in enumerate([64, 64, 64, 128, self.emb_dims], start=1):
            x = nn.Dense(feat, use_bias=False, name=f"conv{i}")(x)
            x = BatchNorm(axis_name=ax, name=f"bn{i}")(x, train)
            x = nn.relu(x)
        x = global_max(x)                           # adaptive max pool over N
        x = nn.Dense(512, use_bias=False, name="linear1")(x)
        x = BatchNorm(axis_name=ax, name="bn6")(x, train)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train, name="dp1")(x)
        return nn.Dense(self.output_channels, name="linear2")(x)


class DGCNNPartSeg(nn.Module):
    """Canonical part-segmentation network (README.md:139-147 results;
    upstream model.py DGCNN_partseg): TransformNet alignment, three EdgeConv
    stages (two convs, two convs, one conv), 1024-d global feature + 64-d
    category label embedding, per-point MLP 256->256->128->seg classes."""

    emb_dims: int = 1024
    k: int = 40
    dropout: float = 0.5
    seg_num_all: int = 50
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, label_one_hot: jax.Array, train: bool = False
    ) -> jax.Array:
        ax = self.axis_name
        b, n, _ = x.shape
        t = TransformNet(axis_name=ax, name="transform_net")(
            None, train, x=x, k=self.k)
        x = jnp.einsum("bnc,bcd->bnd", x, t, precision=jax.lax.Precision.HIGHEST)

        x1 = _edge_block2(
            EdgeConv(64, pool=False, axis_name=ax, name="conv1"),
            ConvBN(64, axis_name=ax, name="conv2"),
            x, x, self.k, train)

        x2 = _edge_block2(
            EdgeConv(64, pool=False, axis_name=ax, name="conv3"),
            ConvBN(64, axis_name=ax, name="conv4"),
            x1, x1, self.k, train)

        x3 = EdgeConv(64, axis_name=ax, name="conv5")(x2, train=train,
                                                      graph=x2, k=self.k)

        cat = jnp.concatenate([x1, x2, x3], axis=-1)          # (B, N, 192)
        g = _embed_max_pool(
            ConvBN(self.emb_dims, axis_name=ax, name="conv6"),
            cat, train)                                       # (B, emb)

        lbl = ConvBN(64, axis_name=ax, name="conv7")(
            label_one_hot[:, None, :], train
        )[:, 0]                                               # (B, 64)
        g = jnp.concatenate([g, lbl], axis=-1)                # (B, emb+64)
        g = jnp.broadcast_to(g[:, None, :], (b, n, g.shape[-1]))

        h = jnp.concatenate([g, cat], axis=-1)                # (B, N, emb+256)
        h = ConvBN(256, axis_name=ax, name="conv8")(h, train)
        h = nn.Dropout(self.dropout, deterministic=not train, name="dp1")(h)
        h = ConvBN(256, axis_name=ax, name="conv9")(h, train)
        h = nn.Dropout(self.dropout, deterministic=not train, name="dp2")(h)
        h = ConvBN(128, axis_name=ax, name="conv10")(h, train)
        return nn.Dense(self.seg_num_all, use_bias=False, name="conv11")(h)


class DGCNNSemSeg(nn.Module):
    """Canonical semantic-segmentation network (README.md:236 description;
    upstream model.py DGCNN_semseg): 9-channel input blocks, kNN over the
    normalized-xyz channels (6:9) for the first graph, EdgeConv x3, 1024-d
    global feature, per-point MLP 512->256->13, one dropout."""

    emb_dims: int = 1024
    k: int = 20
    dropout: float = 0.5
    num_classes: int = 13
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ax = self.axis_name
        b, n, _ = x.shape
        # first graph: neighbours by normalized room coords (channels 6:9)
        x1 = _edge_block2(
            EdgeConv(64, pool=False, axis_name=ax, name="conv1"),
            ConvBN(64, axis_name=ax, name="conv2"),
            x, x[..., 6:9], self.k, train)

        x2 = _edge_block2(
            EdgeConv(64, pool=False, axis_name=ax, name="conv3"),
            ConvBN(64, axis_name=ax, name="conv4"),
            x1, x1, self.k, train)

        x3 = EdgeConv(64, axis_name=ax, name="conv5")(x2, train=train,
                                                      graph=x2, k=self.k)

        cat = jnp.concatenate([x1, x2, x3], axis=-1)          # (B, N, 192)
        g = _embed_max_pool(
            ConvBN(self.emb_dims, axis_name=ax, name="conv6"),
            cat, train, keepdims=True)                        # (B, 1, emb)
        g = jnp.broadcast_to(g, (b, n, g.shape[-1]))

        h = jnp.concatenate([g, cat], axis=-1)                # (B, N, emb+192)
        h = ConvBN(512, axis_name=ax, name="conv7")(h, train)
        h = ConvBN(256, axis_name=ax, name="conv8")(h, train)
        h = nn.Dropout(self.dropout, deterministic=not train, name="dp1")(h)
        return nn.Dense(self.num_classes, use_bias=False, name="conv9")(h)
