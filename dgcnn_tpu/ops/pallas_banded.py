"""Banded (approximate) fused EdgeConv stages — the gated semseg fast path.

The exact extraction loop is VPU-floor-bound at N=4096: one integer
max-reduce over all N candidate columns per winner (ops/pallas_knn.py,
PERF.md "Measured ceilings" — 2.08 ms/winner-iteration, 77% of each semseg
stage).  The only remaining lever is candidate PRUNING: restrict each
query's candidates to a spatially coherent subset so every per-winner pass
touches ``band`` columns instead of N.

Scheme (opt-in via ``DGCNN_TPU_FAST_EXTRACT=<band>`` or the semseg CLI's
``--fast_extract``):

  1. order the points by their projection onto the leading principal
     component of the stage's graph features (8 power iterations on the
     (C, C) covariance — all XLA, O(N C^2));
  2. for each query tile of the sorted order, score only a contiguous
     window of ``band`` sorted candidates centred on the tile (window
     clamped at the edges).  True kNN neighbours are close in any
     locality-preserving order, so the top-k of the window is almost
     always the true top-k — tools/parity_drift.py --model semseg
     (argmax agreement >= 99.5%) is the acceptance instrument;
  3. run the UNCHANGED fused kernels (ops/pallas_knn._edge_conv1_kernel /
     _knn_edge2_kernel) with the window as the candidate block: the
     banded candidate tensors are laid out (B*T, band, C) so each grid
     program (bi, ti) block-loads its own window;
  4. un-sort the stage output back to input order (EdgeConv is
     permutation-equivariant, so sorting is exact; ONLY the windowing
     approximates).

Reference hot loop being beaten: /root/reference/models/dgcnn.py:6-12 at
N=4096 (S3DIS blocks, main_semseg.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.ops.pallas_knn import (
    TILE_N,
    _auto_interpret,
    _edge_conv1_kernel,
    _knn_edge2_kernel,
    _pick_tile,
    _train_exact,
)


def fast_extract_band() -> int:
    """Trace-time opt-in: candidate band width (0 = off).  Values are
    rounded up to a multiple of TILE_N by the callers."""
    try:
        return int(os.environ.get("DGCNN_TPU_FAST_EXTRACT", "0"))
    except ValueError:
        return 0


def banded_applicable(n: int, band: int) -> bool:
    return 0 < band < n and n % TILE_N == 0 and band % TILE_N == 0


def pc1_key(g: jax.Array) -> jax.Array:
    """(B, N, C) -> (B, N) projection onto the leading principal component
    (covariance power iteration; sign-indeterminate, which is fine — any
    locality-preserving order works)."""
    gf = g.astype(jnp.float32)
    gc = gf - jnp.mean(gf, axis=1, keepdims=True)
    cov = jnp.einsum("bnc,bnd->bcd", gc, gc,
                     precision=jax.lax.Precision.HIGHEST)
    v = jnp.ones((g.shape[0], g.shape[2]), jnp.float32)
    for _ in range(8):
        v = jnp.einsum("bcd,bd->bc", cov, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return jnp.einsum("bnc,bc->bn", gc, v)


def band_starts(n: int, tile: int, band: int) -> np.ndarray:
    """Static per-tile window starts: centred on the tile, clamped."""
    ti = np.arange(n // tile)
    centers = ti * tile + tile // 2
    return np.clip(centers - band // 2, 0, n - band).astype(np.int32)


def _sort_by(order: jax.Array, arr: jax.Array) -> jax.Array:
    return jnp.take_along_axis(arr, order[..., None], axis=1)


def _build_banded(arr_sorted: jax.Array, starts: np.ndarray,
                  band: int) -> jax.Array:
    """(B, N, C) sorted -> (B*T, band, C) per-tile candidate windows."""
    b, _, c = arr_sorted.shape
    idx = jnp.asarray(starts)[:, None] + jnp.arange(band)[None, :]  # (T, band)
    win = jnp.take(arr_sorted, idx.reshape(-1), axis=1)             # (B, T*band, C)
    return win.reshape(b * starts.shape[0], band, c)


def _sorted_order(graph: jax.Array) -> tuple[jax.Array, jax.Array]:
    key = pc1_key(graph)
    order = jnp.argsort(key, axis=1)
    inv = jnp.argsort(order, axis=1)
    return order, inv


@functools.partial(jax.jit, static_argnames=("k", "band", "slope",
                                             "select_dtype", "interpret"))
def banded_edge_conv_eval(graph, x, w_nbr, w_ctr, scale, bias, k: int,
                          band: int, slope: float = 0.2, *,
                          select_dtype=jnp.bfloat16,
                          interpret: bool | None = None):
    """fused_edge_conv_eval with candidates pruned to a PC1-sorted band.
    Same signature plus ``band``; output order matches the input order."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, cg = graph.shape
    cin = x.shape[2]
    co = w_nbr.shape[1]
    assert band % TILE_N == 0, f"band={band} must be a multiple of {TILE_N}"
    tile = min(_pick_tile(n), band)
    while n % tile:
        tile -= TILE_N
    starts = band_starts(n, tile, band)
    t_tiles = n // tile

    order, inv = _sorted_order(graph)
    gs = _sort_by(order, graph)
    xs = _sort_by(order, x)   # == gs when x is graph (XLA CSEs the dup)
    gband = _build_banded(gs, starts, band)
    xband = _build_banded(xs, starts, band)

    aff = jnp.stack([scale, bias]).astype(jnp.float32)
    kernel = functools.partial(_edge_conv1_kernel, k, slope, select_dtype)
    out_sorted = pl.pallas_call(
        kernel,
        grid=(b, t_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, cg), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band, cg),
                         lambda bi, ti: (bi * t_tiles + ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band, cin),
                         lambda bi, ti: (bi * t_tiles + ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, cin), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, co), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, co), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, co), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, co), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, n, co),
            jnp.float32 if select_dtype == jnp.float32 else jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(gs, gband, xband, xs, w_nbr, w_ctr, aff)
    return _sort_by(inv, out_sorted)


@functools.partial(jax.jit, static_argnames=("k", "band", "slope",
                                             "interpret"))
def banded_knn_edge2(graph, a1, b1, s1, t1, w2, s2, t2, k: int, band: int,
                     slope: float = 0.2, interpret: bool | None = None):
    """fused_knn_edge2 with candidates pruned to a PC1-sorted band."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, cg = graph.shape
    c1 = a1.shape[2]
    c2 = w2.shape[1]
    assert band % TILE_N == 0, f"band={band} must be a multiple of {TILE_N}"
    tile = min(_pick_tile(n), band)
    while n % tile:
        tile -= TILE_N
    starts = band_starts(n, tile, band)
    t_tiles = n // tile

    order, inv = _sorted_order(graph)
    gs = _sort_by(order, graph)
    a1s = _sort_by(order, a1)
    b1s = _sort_by(order, b1)
    gband = _build_banded(gs, starts, band)
    a1band = _build_banded(a1s, starts, band)

    cw = max(c1, c2)
    aff = jnp.zeros((4, cw), jnp.float32)
    aff = aff.at[0, :c1].set(s1).at[1, :c1].set(t1)
    aff = aff.at[2, :c2].set(s2).at[3, :c2].set(t2)

    kernel = functools.partial(_knn_edge2_kernel, k, slope)
    out_sorted = pl.pallas_call(
        kernel,
        grid=(b, t_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, cg), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band, cg),
                         lambda bi, ti: (bi * t_tiles + ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band, c1),
                         lambda bi, ti: (bi * t_tiles + ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c1), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, c2), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, cw), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c2), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, n, c2),
            jnp.float32 if _train_exact() else jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(gs, gband, a1band, b1s, w2, aff)
    return _sort_by(inv, out_sorted)
