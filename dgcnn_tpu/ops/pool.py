"""Global point-axis pooling + the point-sharding context.

Point (sequence) parallelism — SURVEY.md §5 long-context — shards the N
axis of every (B, N, C) activation across the mesh so N can grow past
single-chip HBM.  Models stay written in single-logical form; inside
``point_sharding(axis)`` (entered by ``parallel.point_sharded_apply`` while
tracing the shard_map body) the graph ops become shard-aware:

* ``ops.knn.knn``        — all-gathers the coordinates over ICI, local rows
                           x global columns top-k (indices stay global);
* ``ops.graph.gather_neighbors`` — all-gathers the features, local gather;
* ``global_max/global_mean``     — local reduce + ``lax.pmax/pmean``;
* ``ops.knn.use_pallas``         — disabled (kernels are per-shard-local).

Eval-only: BatchNorm batch statistics are not point-synced (running stats
are replicated, so inference is exact).
"""
from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp

_POINT_AXIS: str | None = None


def point_shard_axis() -> str | None:
    """The active point-sharding mesh axis name, or None."""
    return _POINT_AXIS


@contextmanager
def point_sharding(axis: str):
    """Trace-time context: graph ops treat the N axis as sharded over
    ``axis`` (a bound shard_map/pmap axis name)."""
    global _POINT_AXIS
    prev = _POINT_AXIS
    _POINT_AXIS = axis
    try:
        yield
    finally:
        _POINT_AXIS = prev


def global_max(h: jax.Array, axis: int = 1, keepdims: bool = False):
    """Max over the (possibly point-sharded) N axis of (B, N, C)."""
    out = jnp.max(h, axis=axis, keepdims=keepdims)
    if _POINT_AXIS is not None:
        out = jax.lax.pmax(out, _POINT_AXIS)
    return out


def global_mean(h: jax.Array, axis: int = 1, keepdims: bool = False):
    """Mean over the (possibly point-sharded) N axis of (B, N, C) —
    shards are equal-sized, so the mean of shard-means is exact."""
    out = jnp.mean(h, axis=axis, keepdims=keepdims)
    if _POINT_AXIS is not None:
        out = jax.lax.pmean(out, _POINT_AXIS)
    return out
