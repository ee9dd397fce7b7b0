"""Point-axis (sequence-parallel) sharding — SURVEY.md §2.3/§5 stretch goal.

The reference bounds N by data-side subsampling (data.py:286, 324, 375); the
O(N^2) kNN score matrix is materialized per device.  Sharding the *point*
axis lets N grow past single-chip HBM: each shard computes distances from its
local query rows to the all-gathered cloud (one ICI all-gather of the small
(B, N, C) coordinates), takes a local top-k (indices are already global
because the gather preserves axis order), and reduces neighbour features from
the all-gathered projection.  This is the natural "ring pass" analogue for
point clouds — the score matrix never exists whole on any chip.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dgcnn_tpu.parallel.mesh import DATA_AXIS
from dgcnn_tpu.ops.knn import pairwise_neg_sqdist


def sharded_knn(mesh: Mesh, k: int, axis: str = DATA_AXIS):
    """Build a knn over clouds whose point axis is sharded across ``mesh``.

    Returns fn(x) with x (B, N, C) sharded as P(None, axis); output (B, N, k)
    int32 global indices, sharded the same way.
    """

    def local(x_local):
        x_all = jax.lax.all_gather(x_local, axis, axis=1, tiled=True)
        scores = pairwise_neg_sqdist(x_local, x_all)   # (B, N/D, N)
        _, idx = jax.lax.top_k(scores, k)
        return idx.astype(jnp.int32)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None),),
        out_specs=P(None, axis, None),
        check_vma=False,
    )


def sharded_gather_neighbors(mesh: Mesh, axis: str = DATA_AXIS):
    """Gather neighbour features under point sharding: features are
    all-gathered once over ICI, then indexed locally with global indices.

    Returns fn(feat, idx): feat (B, N, C) P(None, axis), idx (B, N, k)
    P(None, axis) -> (B, N, k, C) P(None, axis)."""

    def local(feat_local, idx_local):
        feat_all = jax.lax.all_gather(feat_local, axis, axis=1, tiled=True)
        return jax.vmap(lambda f, i: f[i])(feat_all, idx_local)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None)),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )


def sharded_edge_conv_fused(mesh: Mesh, k: int, negative_slope: float = 0.2,
                            axis: str = DATA_AXIS):
    """Point-sharded fused EdgeConv (eval form): per shard, all-gather the
    graph coords and the neighbour projection, reduce locally — the
    (B, N, k, C) edge tensor exists only shard-locally and transiently.

    Returns fn(x, w_nbr, w_ctr, scale, bias) like ops.edge_conv.edge_conv_fused
    but with x sharded P(None, axis) and the graph built from x itself.
    """

    def local(x_local, w_nbr, w_ctr, scale, bias):
        from dgcnn_tpu.ops.edge_conv import _project

        x_all = jax.lax.all_gather(x_local, axis, axis=1, tiled=True)
        scores = pairwise_neg_sqdist(x_local, x_all)
        _, idx = jax.lax.top_k(scores, k)
        a_all = _project(x_all, w_nbr)                 # (B, N, Co)
        b_loc = _project(x_local, w_ctr)               # (B, N/D, Co)
        a_g = jax.vmap(lambda f, i: f[i])(a_all, idx)  # (B, N/D, k, Co)
        sel = jnp.where(scale > 0,
                        jnp.max(a_g, axis=2), jnp.min(a_g, axis=2)) + b_loc
        y = sel * scale + bias
        return jnp.where(y >= 0, y, negative_slope * y)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P(), P(), P()),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
