"""k-nearest-neighbour graph construction.

Semantics follow the reference ``knn`` (reference: models/dgcnn.py:6-12): the
score is the *negative squared euclidean distance* ``2<xi,xj> - |xi|^2 - |xj|^2``
and the k highest-scoring columns per row are the neighbours, so each point's
first neighbour is itself (score 0).  The N x N score matrix is a single batched
matmul that XLA tiles onto the MXU; top-k runs on device (no host round-trip).

Layout: this framework is channels-last ``(B, N, C)`` throughout (TPU
lane-friendly); the reference is ``(B, C, N)``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_neg_sqdist(x: jax.Array, y: jax.Array | None = None) -> jax.Array:
    """Negative squared distances between rows of x and rows of y.

    Args:
      x: (B, N, C) query points.
      y: (B, M, C) database points; defaults to x.
    Returns:
      (B, N, M) scores, score[i, j] = -||x_i - y_j||^2 (up to fp error).
    """
    if y is None:
        y = x
    # Neighbour selection is precision-critical: with default (bf16-multiply)
    # matmul precision the ~0.4% distance error reorders near-ties and can
    # change neighbour *sets*; force full-f32 multiplies on the MXU.
    inner = jax.lax.dot_general(
        x, y,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    xx = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)
    yy = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=-1)
    return 2.0 * inner - xx[:, :, None] - yy[:, None, :]


def use_pallas(n: int) -> bool:
    """Whether the fused Pallas kernels should serve this shape: TPU backend,
    tile-aligned N, not explicitly disabled (DGCNN_TPU_PALLAS=0), not inside
    a point-sharding context (kernels see only the local shard)."""
    import os

    from dgcnn_tpu.ops.pool import point_shard_axis

    if point_shard_axis() is not None:
        return False
    mode = os.environ.get("DGCNN_TPU_PALLAS", "auto")
    if mode == "0":
        return False
    if n % 128 != 0:
        return False
    if mode == "1":  # force (interpret-mode on non-TPU backends; for tests)
        return True
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def knn(x: jax.Array, k: int) -> jax.Array:
    """Indices of the k nearest neighbours of every point (self included).

    Args:
      x: (B, N, C) point features — the local shard under point sharding.
    Returns:
      (B, N, k) int32 neighbour indices, nearest (self) first.  Ties broken
      by lowest index, matching torch.topk on the reference path.  Under
      ``ops.pool.point_sharding`` the indices are GLOBAL (the coordinates
      are all-gathered over the point axis; axis order is preserved).

    On TPU with tile-aligned N this dispatches to the fused Pallas extraction
    (ops/pallas_knn.py) — ~6x faster than lax.top_k's sort; neighbour sets are
    identical (fp tie order may swap, which every consumer is invariant to).
    """
    from dgcnn_tpu.ops.pool import point_shard_axis

    axis = point_shard_axis()
    if axis is not None:
        # local query rows x all-gathered columns; shard_map axis context —
        # must not be cached under the unsharded jit key
        x = jax.lax.stop_gradient(x)
        x_all = jax.lax.all_gather(x, axis, axis=1, tiled=True)
        scores = pairwise_neg_sqdist(x, x_all)
        _, idx = jax.lax.top_k(scores, k)
        return idx.astype(jnp.int32)
    return _knn_single(x, k)


@functools.partial(jax.jit, static_argnames=("k",))
def _knn_single(x: jax.Array, k: int) -> jax.Array:
    # neighbour indices carry no gradient (torch.topk semantics); the stop
    # also keeps autodiff from trying to linearize through the Pallas call
    x = jax.lax.stop_gradient(x)
    if use_pallas(x.shape[1]):
        from dgcnn_tpu.ops.pallas_knn import knn_pallas

        return knn_pallas(x, k)
    scores = pairwise_neg_sqdist(x)
    _, idx = jax.lax.top_k(scores, k)
    return idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def knn_with_dists(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Like knn() but also returns the negative squared distances."""
    scores = pairwise_neg_sqdist(x)
    neg_sqdist, idx = jax.lax.top_k(scores, k)
    return idx.astype(jnp.int32), neg_sqdist
