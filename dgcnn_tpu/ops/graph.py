"""Graph feature gathering (reference: models/dgcnn.py:15-44).

``get_graph_feature`` in the reference flattens (B, N) and gathers with a
precomputed base offset; here the gather is a per-batch ``take`` that XLA
lowers to a native gather — no index arithmetic, no flattening.

Modes mirror the reference:
  * default:    concat(neighbour_feature, centre_feature)  -> (B, N, k, 2C)
  * knn_only:   neighbour features only                    -> (B, N, k, C)
  * disp_only:  neighbour_feature - centre_feature          -> (B, N, k, C)

Note the concat order [neighbour, centre] matches reference
``torch.cat((feature, x), dim=3)`` (models/dgcnn.py:42).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dgcnn_tpu.ops.knn import knn


def gather_neighbors(feat: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather per-point neighbour features.

    Args:
      feat: (B, N, C) — the local shard under point sharding.
      idx:  (B, M, k) int indices into the (global) N axis.
    Returns:
      (B, M, k, C).

    Under ``ops.pool.point_sharding`` the features are all-gathered over
    the point axis first (one ICI pass), then indexed locally with the
    global indices ``ops.knn.knn`` produced.
    """
    from dgcnn_tpu.ops.pool import point_shard_axis

    axis = point_shard_axis()
    if axis is not None:
        feat = jax.lax.all_gather(feat, axis, axis=1, tiled=True)
    return jax.vmap(lambda f, i: f[i])(feat, idx)


def edge_features(
    feat: jax.Array,
    idx: jax.Array,
    *,
    knn_only: bool = False,
    disp_only: bool = False,
) -> jax.Array:
    """Build edge features from precomputed neighbour indices."""
    nbr = gather_neighbors(feat, idx)  # (B, N, k, C)
    if knn_only:
        return nbr
    centre = feat[:, :, None, :]
    if disp_only:
        return nbr - centre
    k = idx.shape[-1]
    centre = jnp.broadcast_to(centre, nbr.shape)
    return jnp.concatenate([nbr, centre], axis=-1)


def get_graph_feature(
    x: jax.Array,
    k: int = 20,
    *,
    knn_only: bool = False,
    disp_only: bool = False,
    idx: jax.Array | None = None,
) -> jax.Array:
    """Reference-compatible entry point: knn + edge feature build.

    Args:
      x: (B, N, C) features (channels-last; the reference is (B, C, N)).
      k: neighbourhood size.
      idx: optional precomputed (B, N, k) indices (skips the knn).
    Returns:
      (B, N, k, 2C) by default; see module docstring for modes.
    """
    if idx is None:
        idx = knn(x, k)
    return edge_features(x, idx, knn_only=knn_only, disp_only=disp_only)
