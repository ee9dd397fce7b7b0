"""Fused Pallas kNN kernels — the hot loop of every DGCNN forward
(SURVEY.md §3.5 #1-#2; BASELINE.json north-star).

Why XLA's path is slow here: ``lax.top_k`` sorts each N-row (~20 ms for
(64, 1024, 1024) on v5e) and the neighbour gather scatters 300+ MB of edge
features through HBM (~8 ms).  This kernel computes, per batch item, the
score tile on the MXU and then extracts the k nearest neighbours by
**iterative masked argmax in VMEM** — and instead of gathering rows by index,
it selects each neighbour's projected features with a one-hot (TILE_N, N) x
(N, Co) **matmul**, accumulating the EdgeConv reductions (max/min/sum) on the
fly.  The (B, N, k, C) edge tensor never exists anywhere, and the only HBM
traffic is x, a in and (idx, reductions) out.

Numerics: scores are computed in f32 (full-precision MXU) so neighbour sets
match the XLA/torch reference exactly (ties broken by lowest index, like
torch.topk).  The selection matmuls run in the requested ``select_dtype``
(bf16 by default on TPU — exact for the 0/1 one-hot operand, feature values
rounded to bf16; use f32 for bit-level parity).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

TILE_N = 128


def _supported(n: int) -> bool:
    return n % TILE_N == 0


def _extract_loop(scores, k, n, payload_fn):
    """Shared iterative top-k extraction.

    scores: (TILE_N, N) f32.  payload_fn(onehot_f32, t) consumes the one-hot
    selection of iteration t.  Returns the (TILE_N, k) int32 indices.
    """
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    idx_cols = []
    for t in range(k):
        m = jnp.max(scores, axis=1, keepdims=True)
        is_max = scores == m
        # lowest index among ties — torch.topk ordering
        jsel = jnp.min(jnp.where(is_max, col, n), axis=1, keepdims=True)
        onehot = (col == jsel).astype(jnp.float32)
        payload_fn(onehot, t)
        idx_cols.append(jsel)
        scores = jnp.where(col == jsel, -jnp.inf, scores)
    return jnp.concatenate(idx_cols, axis=1).astype(jnp.int32)


def _scores(xq, xall):
    inner = jax.lax.dot_general(
        xq, xall,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    qq = jnp.sum(jnp.square(xq.astype(jnp.float32)), axis=1, keepdims=True)
    aa = jnp.sum(jnp.square(xall.astype(jnp.float32)), axis=1, keepdims=True)
    return 2.0 * inner - qq - aa.T


def _knn_reduce_kernel(k, select_dtype, q_ref, x_ref, a_ref,
                       idx_ref, amax_ref, amin_ref, asum_ref):
    n = x_ref.shape[1]
    co = a_ref.shape[2]
    tile = q_ref.shape[1]
    scores = _scores(q_ref[0], x_ref[0])
    a = a_ref[0].astype(select_dtype)

    amax = jnp.full((tile, co), -jnp.inf, jnp.float32)
    amin = jnp.full((tile, co), jnp.inf, jnp.float32)
    asum = jnp.zeros((tile, co), jnp.float32)

    sel_state = {"amax": amax, "amin": amin, "asum": asum}

    def payload(onehot, t):
        sel = jax.lax.dot_general(
            onehot.astype(select_dtype), a,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sel_state["amax"] = jnp.maximum(sel_state["amax"], sel)
        sel_state["amin"] = jnp.minimum(sel_state["amin"], sel)
        sel_state["asum"] = sel_state["asum"] + sel

    idx = _extract_loop(scores, k, n, payload)
    idx_ref[0] = idx
    amax_ref[0] = sel_state["amax"]
    amin_ref[0] = sel_state["amin"]
    asum_ref[0] = sel_state["asum"]


@functools.partial(
    jax.jit, static_argnames=("k", "select_dtype", "interpret")
)
def fused_knn_reduce(
    x: jax.Array,
    a: jax.Array,
    k: int,
    *,
    select_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Fused kNN + neighbour-feature reductions.

    Args:
      x: (B, N, C) points/features defining the graph.
      a: (B, N, Co) projected features to reduce over each neighbourhood
         (EdgeConv's ``x @ w_nbr``).
    Returns:
      idx  (B, N, k) int32 neighbour indices (self first, torch tie order),
      amax (B, N, Co) max  over the k neighbours of a,
      amin (B, N, Co) min  over the k neighbours of a,
      asum (B, N, Co) sum  over the k neighbours of a.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    co = a.shape[2]
    assert _supported(n), f"N={n} must be a multiple of {TILE_N}"
    grid = (b, n // TILE_N)

    kernel = functools.partial(_knn_reduce_kernel, k, select_dtype)
    out_shape = (
        jax.ShapeDtypeStruct((b, n, k), jnp.int32),
        jax.ShapeDtypeStruct((b, n, co), jnp.float32),
        jax.ShapeDtypeStruct((b, n, co), jnp.float32),
        jax.ShapeDtypeStruct((b, n, co), jnp.float32),
    )
    flops_sel = 2 * b * n * k * co + 2 * b * n * n * c
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_N, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, co), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_N, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, co), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, co), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, co), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_sel,
            bytes_accessed=4 * (b * n * c + b * n * co * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, a)


def _knn_only_kernel(k, q_ref, x_ref, idx_ref):
    n = x_ref.shape[1]
    scores = _scores(q_ref[0], x_ref[0])
    idx_ref[0] = _extract_loop(scores, k, n, lambda onehot, t: None)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_pallas(x: jax.Array, k: int, *, interpret: bool = False) -> jax.Array:
    """Drop-in for ops.knn.knn backed by the fused Pallas extraction."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    assert _supported(n), f"N={n} must be a multiple of {TILE_N}"
    kernel = functools.partial(_knn_only_kernel, k)
    return pl.pallas_call(
        kernel,
        grid=(b, n // TILE_N),
        in_specs=[
            pl.BlockSpec((1, TILE_N, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_N, k), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, k), jnp.int32),
        interpret=interpret,
    )(x, x)
