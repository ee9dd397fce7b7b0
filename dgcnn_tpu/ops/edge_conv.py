"""Fused EdgeConv primitives.

The reference EdgeConv (models/dgcnn.py:80-103) materializes a
``(B, 2C, N, k)`` edge tensor, runs a dense 1x1 conv over it, then BN +
LeakyReLU + max over k.  On TPU we exploit the factorization

    conv1x1(concat(x_j, x_i)) = x_j @ W_nbr + x_i @ W_ctr

so the conv becomes two small (N, C) @ (C, Co) matmuls on the MXU followed by a
gather — cutting conv FLOPs by a factor of k and never building the 2C concat.

Further, BatchNorm statistics of the *virtual* edge tensor
``z[b,i,j,c] = a[b, idx[b,i,j], c] + bx[b,i,c]`` are computed in closed form
from gathered reductions of ``a`` (mean/var below), and because an affine map
followed by max over k satisfies

    max_j (s*z + t) = s * (s > 0 ? max_j z : min_j z) + t
    max_j leaky_relu(y) = leaky_relu(max_j y)          (monotone)

the whole BN + LeakyReLU + max pipeline reduces to gathered max/min of ``a``.

All functions take channels-last inputs and weights of shape (C, Co), where for
a reference Conv2d weight W (Co, 2C, 1, 1): W_nbr = W[:, :C].T, W_ctr = W[:, C:].T
(concat order [neighbour, centre], reference models/dgcnn.py:42).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dgcnn_tpu.ops.graph import gather_neighbors


def _project(x: jax.Array, w: jax.Array) -> jax.Array:
    """(B, N, C) @ (C, Co) in f32 accumulation on the MXU (bf16 AMP
    features take the weight down to bf16 — lax.dot_general requires
    matching operand dtypes)."""
    if x.dtype == jnp.bfloat16:
        w = w.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        x, w,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def edge_linear(
    x: jax.Array, idx: jax.Array, w_nbr: jax.Array, w_ctr: jax.Array
) -> jax.Array:
    """Per-edge pre-activation without building the concat edge tensor.

    Equivalent to conv1x1(concat(gather(x, idx), x)) in the reference.

    Returns: (B, N, k, Co).
    """
    a = _project(x, w_nbr)
    b = _project(x, w_ctr)
    return gather_neighbors(a, idx) + b[:, :, None, :]


def edge_conv_batch_stats(
    x: jax.Array, idx: jax.Array, w_nbr: jax.Array, w_ctr: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Per-channel (mean, biased var) of the virtual edge tensor over (B, N, k).

    Matches BatchNorm2d training statistics of the reference edge conv without
    materializing (B, N, k, Co): cross moments factor through per-point sums of
    the gathered neighbour projection.
    """
    a = _project(x, w_nbr)          # (B, N, Co)
    b = _project(x, w_ctr)          # (B, N, Co)
    a_g = gather_neighbors(a, idx)  # (B, N, k, Co)

    mean_ag = jnp.mean(a_g, axis=(0, 1, 2))
    mean_b = jnp.mean(b, axis=(0, 1))
    mean = mean_ag + mean_b

    e_ag2 = jnp.mean(jnp.square(a_g), axis=(0, 1, 2))
    e_b2 = jnp.mean(jnp.square(b), axis=(0, 1))
    # E[a_g * b] over (B,N,k): b is constant in k -> mean over k of a_g, times b.
    e_ab = jnp.mean(jnp.mean(a_g, axis=2) * b, axis=(0, 1))
    var = e_ag2 + 2.0 * e_ab + e_b2 - jnp.square(mean)
    return mean, jnp.maximum(var, 0.0)


def edge_conv_fused(
    x: jax.Array,
    idx: jax.Array,
    w_nbr: jax.Array,
    w_ctr: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    negative_slope: float = 0.2,
) -> jax.Array:
    """Fused conv + affine(BN) + LeakyReLU + max-over-k.

    ``scale``/``bias`` are the folded BatchNorm affine (gamma/sqrt(var+eps),
    beta - mean*that) — computed from batch stats in training or running stats
    in eval.  Output: (B, N, Co).
    """
    a = _project(x, w_nbr)
    b = _project(x, w_ctr)
    a_g = gather_neighbors(a, idx)
    a_max = jnp.max(a_g, axis=2)
    a_min = jnp.min(a_g, axis=2)
    # max over k of s*z + t, with z = a_g + b:
    sel = jnp.where(scale > 0, a_max, a_min) + b
    y = sel * scale + bias
    return jnp.where(y >= 0, y, negative_slope * y)


def edge_conv_naive(
    x: jax.Array,
    idx: jax.Array,
    w_nbr: jax.Array,
    w_ctr: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    negative_slope: float = 0.2,
) -> jax.Array:
    """Reference-shaped implementation (materializes edges) for testing."""
    z = edge_linear(x, idx, w_nbr, w_ctr)
    y = z * scale + bias
    y = jnp.where(y >= 0, y, negative_slope * y)
    return jnp.max(y, axis=2)


def fold_bn(
    gamma: jax.Array, beta: jax.Array, mean: jax.Array, var: jax.Array, eps: float
) -> tuple[jax.Array, jax.Array]:
    """Fold BatchNorm parameters into a per-channel affine (scale, bias)."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return scale, beta - mean * scale
