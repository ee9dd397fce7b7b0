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


def point_sharded_apply(apply_fn, mesh: Mesh, axis: str = DATA_AXIS,
                        out_sharded: bool = True,
                        batch_axis: str | None = None):
    """Wrap a model EVAL apply so the point axis is sharded across ``mesh``.

    ``apply_fn(variables, x)`` is written single-logical (a plain flax
    ``model.apply`` closure); inside the shard_map body the
    ``ops.pool.point_sharding`` context makes ``knn`` /
    ``gather_neighbors`` / ``global_max`` / ``global_mean`` shard-aware
    (one ICI all-gather per graph build, ``pmax``/``pmean`` for the global
    pools) — see ops/pool.py.  ``x`` is (B, N, C) with N sharded over
    ``axis``; variables are replicated.

    ``out_sharded=True`` for per-point outputs (seg logits, embeddings);
    ``False`` for per-cloud outputs (cls logits — replicated after the
    global pool).  Eval-only: BatchNorm batch stats are not point-synced.

    ``batch_axis``: name of a SECOND mesh axis to shard the batch over —
    the 2-D dp x sp layout (each device holds B/dp x N/sp points; graph
    all-gathers and global pools ride the ``axis`` submesh only, so the
    collectives stay on the short ICI dimension while dp scales
    throughput).  Requires ``mesh`` to carry both axis names.
    """
    from dgcnn_tpu.ops.pool import point_sharding

    def local(variables, x):
        with point_sharding(axis):
            return apply_fn(variables, x)

    out_spec = (P(batch_axis, axis, None) if out_sharded
                else (P() if batch_axis is None else P(batch_axis)))
    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(batch_axis, axis, None)),
        out_specs=out_spec,
        check_vma=False,
    )


def point_sharded_seg_eval(model, mesh: Mesh, axis: str = DATA_AXIS,
                           smoothing: bool = True,
                           batch_axis: str | None = None):
    """Point-sharded semseg EVAL step (cli/semseg.py --point_shard): same
    metrics contract as train.engine's eval step ({"loss", "preds"}), but
    the (B, N, 9) blocks are sharded over the point axis — each device sees
    N/D points, one ICI all-gather per dynamic graph build, pmax for the
    global feature, pmean for the per-example loss.  N must divide by the
    mesh size.

    ``batch_axis``: optional second mesh axis for the 2-D dp x sp layout —
    the batch shards over it and the masked loss mean is psum-reduced
    across it (bit-identical semantics to the 1-D form)."""
    from dgcnn_tpu.ops.pool import point_sharding
    from dgcnn_tpu.train.loss import cross_entropy_per_example, \
        masked_mean_loss

    def local(state, points, seg, mask):
        with point_sharding(axis):
            logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                points, train=False)
        per_ex = cross_entropy_per_example(logits, seg, smoothing)
        per_ex = jax.lax.pmean(per_ex, axis)  # exact: equal-size shards
        if batch_axis is None:
            loss = masked_mean_loss(per_ex, mask)
        else:  # global masked mean across the dp shards
            m = mask.astype(per_ex.dtype)
            num = jax.lax.psum(jnp.sum(per_ex * m), batch_axis)
            den = jax.lax.psum(jnp.sum(m), batch_axis)
            loss = num / jnp.maximum(den, 1.0)
        return {
            "loss": loss,
            "preds": jnp.argmax(logits, -1),
        }

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(batch_axis, axis, None), P(batch_axis, axis),
                  P(batch_axis)),
        out_specs={"loss": P(), "preds": P(batch_axis, axis)},
        check_vma=False,
    ))


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
