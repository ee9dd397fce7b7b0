"""Banded fast-extract stages (ops/pallas_banded.py): with the band covering
all N candidates the result must EQUAL the full fused kernels (sorting is a
pure permutation; EdgeConv is permutation-equivariant), and a half-width
band on spatially smooth data must still find almost every true neighbour.
Runs in Pallas interpret mode on CPU like tests/test_pallas_knn.py."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgcnn_tpu.ops import pallas_banded as pb
from dgcnn_tpu.ops.pallas_knn import fused_edge_conv_eval, fused_knn_edge2

B, N, K = 2, 256, 4


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


def _cloud(rng, noise=0.1):
    # smooth spatial data (a curve + noise) so PC1-sorted locality holds
    t = np.sort(rng.rand(B, N), axis=1)
    pts = np.stack([t, np.sin(3 * t), noise * rng.randn(B, N)], -1)
    return jnp.asarray(pts.astype(np.float32))


def test_band_equals_full_edge_conv(rng):
    g = _cloud(rng)
    w_nbr = jnp.asarray(rng.randn(3, 8).astype(np.float32)) * 0.2
    w_ctr = jnp.asarray(rng.randn(3, 8).astype(np.float32)) * 0.2
    s = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    t = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
    full = fused_edge_conv_eval(g, g, w_nbr, w_ctr, s, t, K,
                                select_dtype=jnp.float32)
    banded = pb.banded_edge_conv_eval(g, g, w_nbr, w_ctr, s, t, K, band=N,
                                      select_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(full),
                               atol=1e-5)


def test_band_equals_full_edge2(rng):
    g = _cloud(rng)
    a1 = jnp.asarray(rng.randn(B, N, 8).astype(np.float32)) * 0.2
    b1 = jnp.asarray(rng.randn(B, N, 8).astype(np.float32)) * 0.2
    s1 = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    t1 = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(8, 8).astype(np.float32)) * 0.3
    s2 = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    t2 = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
    full = fused_knn_edge2(g, a1, b1, s1, t1, w2, s2, t2, K)
    banded = pb.banded_knn_edge2(g, a1, b1, s1, t1, w2, s2, t2, K, band=N)
    np.testing.assert_allclose(
        np.asarray(banded).astype(np.float32),
        np.asarray(full).astype(np.float32), atol=1e-2)


def test_half_band_high_recall(rng):
    """band = N/2 on smooth data: outputs match the full kernel on nearly
    every point (the windows contain the true kNN for almost all queries)."""
    g = _cloud(rng, noise=0.02)
    w_nbr = jnp.asarray(rng.randn(3, 8).astype(np.float32)) * 0.2
    w_ctr = jnp.asarray(rng.randn(3, 8).astype(np.float32)) * 0.2
    s = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    t = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
    full = np.asarray(fused_edge_conv_eval(
        g, g, w_nbr, w_ctr, s, t, K, select_dtype=jnp.float32))
    banded = np.asarray(pb.banded_edge_conv_eval(
        g, g, w_nbr, w_ctr, s, t, K, band=N // 2,
        select_dtype=jnp.float32))
    row_match = np.all(np.abs(banded - full) < 1e-5, axis=-1)  # (B, N)
    assert row_match.mean() > 0.95


def test_helpers():
    starts = pb.band_starts(4096, 512, 1024)
    assert starts.shape == (8,)
    assert starts.min() == 0 and starts.max() == 4096 - 1024
    # windows always cover their own tile
    for ti, st in enumerate(starts):
        assert st <= ti * 512 and st + 1024 >= (ti + 1) * 512
    key = pb.pc1_key(jnp.asarray(np.random.RandomState(1)
                                 .randn(2, 64, 3).astype(np.float32)))
    assert key.shape == (2, 64) and bool(jnp.all(jnp.isfinite(key)))
