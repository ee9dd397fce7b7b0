"""3D histogram-of-oriented-gradients, fully on device.

Reimplements the reference ``compute_hog_1x1`` (models/model_partseg.py:15-92)
without its two performance sinks: the batched ``np.linalg.svd`` on host (a
device->CPU->device round-trip every step) and the Python loop over 9 bins.
The per-point principal direction comes from the closed-form 3x3
eigendecomposition of the neighbourhood covariance (ops/eig3.py); the soft
bin-voting loop becomes a one-hot einsum.

On TPU the whole pipeline is gather-free (two fused Pallas calls): the
unnormalized covariance is built from per-neighbourhood SUMS of
[x, vech(x xT)] (one ``fused_knn_reduce`` — the (B, N, k, 3) neighbourhood
tensor never exists), and because a neighbour's vote vector depends only on
that neighbour's own (gradient, magnitude), the histogram is a
per-neighbourhood SUM of per-POINT 18-vectors (``edge_sum_reduce`` over the
saved indices).  The reference recomputes the same vote for every edge and
gathers three (B, N, k, ·) tensors through memory.

Semantics mirror the reference exactly except for the eigenvector sign, which
LAPACK leaves algorithm-defined and we fix deterministically (largest-magnitude
component non-negative).  The reference's azimuth NaN when g_x == 0
(model_partseg.py:59-60) is reproduced as-is (measure-zero on real data).

Reference bugs (documented deviation, SURVEY.md §7 quirk policy):
``compute_hog_1x1`` gathers neighbourhood points via
``x.view(B*N, -1)[nn_idx]`` on a (B, 3, N) tensor *without* the transpose that
``get_graph_feature`` performs (dgcnn.py:31-33) and *without* the per-batch
``idx_base`` offset — so the gathered "points" are triples of same-axis
coordinates and batches > 0 index into batch 0.  The default here implements
the evident intent (true xyz neighbourhoods, per-batch gather); pass
``bug_compat=True`` to replicate the reference behaviour bit-for-bit
(used by the parity tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dgcnn_tpu.ops.eig3 import principal_eig3x3_sym
from dgcnn_tpu.ops.graph import gather_neighbors
from dgcnn_tpu.ops.knn import knn, use_pallas

_NUM_BINS = 9
_BIN_WIDTH = 20.0


def principal_gradients(
    x: jax.Array, idx: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Per-point principal direction and magnitude of the local neighbourhood.

    Follows the reference: SVD of the centred (k, 3) neighbourhood; the first
    right singular vector is the gradient, sqrt of the first singular value the
    magnitude (model_partseg.py:36-50: s0 = sqrt(sigma0), i.e. lambda0^(1/4) of
    the unnormalized covariance).

    Args:
      x: (B, N, 3) points.
      idx: (B, N, k) neighbour indices.
    Returns:
      gradients (B, N, 3) unit vectors; magnitudes (B, N, 1).
    """
    x_nn = gather_neighbors(x, idx)                       # (B, N, k, 3)
    centered = x_nn - jnp.mean(x_nn, axis=2, keepdims=True)
    cov = jnp.einsum(
        "bnki,bnkj->bnij", centered, centered,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    grad, lam0 = principal_eig3x3_sym(cov)
    mag = jnp.power(jnp.maximum(lam0, 0.0), 0.25)[..., None]
    return grad, mag


def _flat_gather_no_base(feat: jax.Array, idx: jax.Array) -> jax.Array:
    """Replicates the reference's base-offset-free flattened gather:
    feat.view(B*N, C)[idx.view(-1)] — all batches index into batch 0."""
    b, n, c = feat.shape
    k = idx.shape[-1]
    return feat.reshape(b * n, c)[idx.reshape(-1)].reshape(b, n, k, c)


def _vote_components(grad: jax.Array, mag: jax.Array) -> jax.Array:
    """Soft bin votes of one gradient: grad (..., 3), mag (..., 1) ->
    (..., 2, 9) votes per (zenith/azimuth channel, bin) — the reference's
    angle/binning semantics (model_partseg.py:53-89) exactly."""
    zenith = jnp.degrees(jnp.arccos(jnp.clip(grad[..., 2], -1.0, 1.0)))
    # Reference uses atan(y/x), not atan2 — quadrant folding + NaN at x=0 kept.
    azimuth = jnp.degrees(jnp.arctan(grad[..., 1] / grad[..., 0]))

    ang = jnp.stack([zenith, azimuth], axis=-1)           # (..., 2)
    ang = jnp.trunc(ang)                                  # reference .int() cast
    ang = jnp.where(ang < 0, ang + 180.0, ang)

    bins = jnp.mod(jnp.floor(ang / _BIN_WIDTH - 0.5), _NUM_BINS)
    first_centers = _BIN_WIDTH * (jnp.mod(bins + 1, _NUM_BINS) + 0.5)
    first_votes = mag * jnp.mod(first_centers - ang, 180.0) / _BIN_WIDTH
    second_centers = _BIN_WIDTH * (bins + 0.5)
    second_votes = mag * jnp.mod(ang - second_centers, 180.0) / _BIN_WIDTH

    # first vote -> bin c, second vote -> (c+1) % 9 (reference :87-89)
    oh_first = jax.nn.one_hot(bins.astype(jnp.int32), _NUM_BINS,
                              dtype=grad.dtype)
    oh_second = jax.nn.one_hot(
        jnp.mod(bins + 1, _NUM_BINS).astype(jnp.int32), _NUM_BINS,
        dtype=grad.dtype)
    return first_votes[..., None] * oh_first + second_votes[..., None] * oh_second


def _normalize_hist(hist: jax.Array) -> jax.Array:
    """L2 normalize (B, N, 9, 2) over the bin axis (per angle channel), eps
    as F.normalize; interleave as the reference's row-major reshape."""
    b, n = hist.shape[:2]
    norm = jnp.sqrt(jnp.sum(jnp.square(hist), axis=2, keepdims=True))
    hist = hist / jnp.maximum(norm, 1e-12)
    return hist.reshape(b, n, _NUM_BINS * 2)


def _compute_hog_fused(x: jax.Array, k: int) -> jax.Array:
    """Gather-free TPU path (module docstring): per-neighbourhood moment
    sums -> covariance -> per-point votes -> per-neighbourhood vote sums."""
    from dgcnn_tpu.ops.pallas_knn import edge_sum_reduce, fused_knn_sum

    # HOG is detached in the reference (computed on host numpy); the vote
    # sum kernel is non-differentiable by design.
    x = jax.lax.stop_gradient(x)
    # the moment form (sum x xT - (sum x)(sum x)T / k) cancels against the
    # coordinate MAGNITUDE, not the neighbourhood extent: center the cloud
    # first (covariance and neighbour sets are translation invariant) so
    # off-origin clouds keep f32 accuracy like the centered XLA path
    x = x - jnp.mean(x, axis=1, keepdims=True)
    b, n, _ = x.shape
    x0, x1, x2 = x[..., 0], x[..., 1], x[..., 2]
    moments = jnp.stack(
        [x0, x1, x2, x0 * x0, x1 * x1, x2 * x2, x0 * x1, x0 * x2, x1 * x2],
        axis=-1)                                          # (B, N, 9)
    # exact f32 scores + 3-way-split sums (covariance cancellation) via the
    # sum-only kernel: ONE multi-hot matmul replaces the k selection passes
    # (31.9 -> see tools/ubench_partseg_parts.py).  Extraction is packed v2
    # on the AMP path (torch tie order on bit-equal scores, near-tie flips
    # within the score computation's own f32 noise — _pack_keys) and v1
    # member-exact under DGCNN_TPU_PALLAS_EXACT.
    idx, msum = fused_knn_sum(x, moments, k)
    s = msum[..., 0:3]                                    # sum of x
    q = msum[..., 3:9]       # sums of [x0^2, x1^2, x2^2, x0x1, x0x2, x1x2]
    # unnormalized covariance: sum x xT - (sum x)(sum x)^T / k
    o = s[..., :, None] * s[..., None, :] / k             # (B, N, 3, 3)
    cov = jnp.stack([
        jnp.stack([q[..., 0], q[..., 3], q[..., 4]], axis=-1),
        jnp.stack([q[..., 3], q[..., 1], q[..., 5]], axis=-1),
        jnp.stack([q[..., 4], q[..., 5], q[..., 2]], axis=-1),
    ], axis=-2) - o
    grad, lam0 = principal_eig3x3_sym(cov)
    mag = jnp.power(jnp.maximum(lam0, 0.0), 0.25)[..., None]

    votes = _vote_components(grad, mag)                   # (B, N, 2, 9)
    # flatten as [bin, channel] so the summed histogram reshapes directly
    vflat = jnp.transpose(votes, (0, 1, 3, 2)).reshape(b, n, _NUM_BINS * 2)
    # a degenerate neighbourhood gives azimuth atan(0/0) = NaN (reference
    # quirk, kept local by its gather); the multi-hot matmul would spread
    # that NaN to EVERY point's sum (0 * NaN = NaN), so the fused path
    # zeroes non-finite votes instead — the degenerate point simply
    # contributes nothing (documented deviation; the XLA path keeps the
    # reference's local-NaN behaviour)
    vflat = jnp.where(jnp.isfinite(vflat), vflat, 0.0)
    hist = edge_sum_reduce(vflat, idx, k)                 # (B, N, 18)
    return _normalize_hist(hist.reshape(b, n, _NUM_BINS, 2))


@functools.partial(jax.jit, static_argnames=("k", "bug_compat"))
def compute_hog(x: jax.Array, k: int, *, bug_compat: bool = False) -> jax.Array:
    """Histogram of oriented gradients with cell size 1 (every point).

    Args:
      x: (B, N, 3) point cloud (channels-last; reference takes (B, 3, N)).
      k: neighbourhood size.
      bug_compat: replicate the reference's gather bugs (see module docstring).
    Returns:
      (B, N, 18) L2-normalized histograms: 9 bins x (zenith, azimuth) channels,
      interleaved as the reference's (B, N, 9, 2) row-major reshape.
    """
    b, n, _ = x.shape
    if not bug_compat and use_pallas(n):
        return _compute_hog_fused(x, k)
    idx = knn(x, k)
    if bug_compat:
        # reference model_partseg.py:26-30: view on the untransposed (B, 3, N)
        # tensor + no idx_base — rows are same-axis coordinate triples.
        rows = jnp.transpose(x, (0, 2, 1)).reshape(b * n, 3)
        x_nn = rows[idx.reshape(-1)].reshape(b, n, k, 3)
        centered = x_nn - jnp.mean(x_nn, axis=2, keepdims=True)
        cov = jnp.einsum(
            "bnki,bnkj->bnij", centered, centered,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        grad, lam0 = principal_eig3x3_sym(cov)
        mag = jnp.power(jnp.maximum(lam0, 0.0), 0.25)[..., None]
        grad_nn = _flat_gather_no_base(grad, idx)
        mag_nn = _flat_gather_no_base(mag, idx)
    else:
        grad, mag = principal_gradients(x, idx)
        grad_nn = gather_neighbors(grad, idx)             # (B, N, k, 3)
        mag_nn = gather_neighbors(mag, idx)               # (B, N, k, 1)

    votes = _vote_components(grad_nn, mag_nn)             # (B, N, k, 2, 9)
    hist = jnp.transpose(jnp.sum(votes, axis=2), (0, 1, 3, 2))  # (B,N,9,2)
    return _normalize_hist(hist)