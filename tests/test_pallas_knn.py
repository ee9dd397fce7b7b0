"""Fused Pallas kernel tests (interpret mode on CPU — bit-exact vs XLA path;
the real-TPU compile/perf path is exercised by bench.py and the driver)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgcnn_tpu.ops import gather_neighbors, pairwise_neg_sqdist
from dgcnn_tpu.ops.pallas_knn import fused_knn_reduce, knn_pallas


def _xla_knn(x, k):
    scores = pairwise_neg_sqdist(x)
    return jax.lax.top_k(scores, k)[1].astype(jnp.int32)


def test_knn_pallas_matches_xla_interpret():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 256, 8).astype(np.float32))
    ref = np.asarray(_xla_knn(x, 7))
    got = np.asarray(knn_pallas(x, 7, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_fused_reduce_matches_gather_interpret():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 128, 16).astype(np.float32))
    a = jnp.asarray(rng.randn(2, 128, 32).astype(np.float32))
    k = 6
    idx, amax, amin, asum = fused_knn_reduce(
        x, a, k, select_dtype=jnp.float32, interpret=True
    )
    ref_idx = np.asarray(_xla_knn(x, k))
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    ag = np.asarray(gather_neighbors(a, jnp.asarray(ref_idx)))
    np.testing.assert_allclose(np.asarray(amax), ag.max(2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(amin), ag.min(2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(asum), ag.sum(2), atol=1e-5)


def test_fused_reduce_graph_differs_from_features():
    """DGCNNSemSeg's first block: graph from channels 6:9, features all 9."""
    rng = np.random.RandomState(2)
    g = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32))
    a = jnp.asarray(rng.randn(1, 128, 16).astype(np.float32))
    idx, amax, _, _ = fused_knn_reduce(
        g, a, 4, select_dtype=jnp.float32, interpret=True
    )
    ref_idx = np.asarray(_xla_knn(g, 4))
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    ag = np.asarray(gather_neighbors(a, jnp.asarray(ref_idx)))
    np.testing.assert_allclose(np.asarray(amax), ag.max(2), atol=1e-6)


def test_unaligned_n_rejected():
    x = jnp.zeros((1, 100, 3))
    with pytest.raises(AssertionError):
        knn_pallas(x, 4, interpret=True)


def test_pallas_backward_matches_xla_with_ties():
    """edge_reduce_bwd (the no-gather Pallas backward) == the XLA
    gather-recompute backward, including even tie-splitting of max/min
    cotangents (jax.lax.reduce_max/min VJP convention) on duplicated
    neighbours with duplicated values."""
    from dgcnn_tpu.ops.pallas_knn import (
        _ker_bwd_xla,
        edge_reduce_bwd,
        fused_knn_reduce,
    )

    rng = np.random.RandomState(3)
    k = 6
    xn = rng.randn(2, 128, 4).astype(np.float32)
    xn[:, 30] = xn[:, 10]  # duplicate points -> exact distance ties
    x = jnp.asarray(xn)
    an = rng.randn(2, 128, 8).astype(np.float32)
    an[:, 30] = an[:, 10]  # tied VALUES too -> max/min grad splits
    a = jnp.asarray(an)

    out = fused_knn_reduce(x, a, k, select_dtype=jnp.float32,
                           with_sumsq=True, interpret=True)
    idx, amax, amin = out[0], out[1], out[2]
    cts = tuple(jnp.asarray(rng.randn(*o.shape).astype(np.float32))
                for o in out)
    da_xla = _ker_bwd_xla(a, idx, cts)
    da_pl = edge_reduce_bwd(idx, a, amax, amin, cts[1], cts[2], cts[3],
                            cts[4], k, interpret=True)
    np.testing.assert_allclose(np.asarray(da_pl), np.asarray(da_xla),
                               rtol=1e-5, atol=1e-5)


def test_tie_parity_exact_v1():
    """The exact (v1) extraction on tie-heavy clouds (every point duplicated
    4x -> distance ties in every row) matches lax.top_k's lowest-index tie
    order.  f32 select_dtype pins the exact path (HIGHEST scores + v1);
    the bf16 default runs the packed v2 loop (tests/test_pallas_v2.py)."""
    rng = np.random.RandomState(5)
    xn = rng.randn(1, 128, 4).astype(np.float32)
    xn[0, 32:64] = xn[0, 0:32]
    xn[0, 64:96] = xn[0, 0:32]
    xn[0, 96:128] = xn[0, 0:32]
    x = jnp.asarray(xn)
    a = jnp.asarray(rng.randn(1, 128, 8).astype(np.float32))
    k = 5
    idx, amax, amin, asum = fused_knn_reduce(
        x, a, k, select_dtype=jnp.float32, interpret=True)
    ref_idx = np.asarray(_xla_knn(x, k))
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    ag = np.asarray(gather_neighbors(a, jnp.asarray(ref_idx)))
    np.testing.assert_allclose(np.asarray(amax), ag.max(2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(amin), ag.min(2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(asum), ag.sum(2), atol=1e-5)


def _eval_stage_ref(x, w_nbr, w_ctr, scale, bias, k, slope=0.2):
    """XLA reference of one eval EdgeConv stage (gather formulation)."""
    idx = _xla_knn(x, k)
    a = jnp.einsum("bnc,cd->bnd", x, w_nbr)
    b = jnp.einsum("bnc,cd->bnd", x, w_ctr)
    ag = gather_neighbors(a, idx)  # (B, N, k, Co)
    z = (ag + b[:, :, None, :]) * scale + bias
    return jnp.max(jnp.where(z >= 0, z, slope * z), axis=2)


@pytest.mark.parametrize("variant", ["v1", "v3"])
def test_eval_stage_variants_match_xla_tie_free(variant, monkeypatch):
    """Tie-free clouds: v3 (fast class-walk) == v1 == XLA gather reference
    for the fused eval stage (v3's cnt==1 divide is an IEEE no-op)."""
    from dgcnn_tpu.ops.pallas_knn import fused_edge_conv_eval

    monkeypatch.setenv("DGCNN_TPU_EXTRACT", variant)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 256, 16).astype(np.float32))
    wn = jnp.asarray(rng.randn(16, 24).astype(np.float32))
    wc = jnp.asarray(rng.randn(16, 24).astype(np.float32))
    sc = jnp.asarray((rng.rand(24) + 0.5).astype(np.float32))
    bi = jnp.asarray(rng.randn(24).astype(np.float32))
    # __wrapped__: bypass the jit cache (the variant is read at trace time)
    got = fused_edge_conv_eval.__wrapped__(
        x, x, wn, wc, sc, bi, 7, select_dtype=jnp.float32, interpret=True)
    ref = _eval_stage_ref(x, wn, wc, sc, bi, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_eval_stage_v3_duplicate_points_exact(monkeypatch):
    """Duplicated points under v3: tied members share features, so the
    class-average equals the member value and the class-walk output matches
    the XLA reference computed over the top-k *distinct* neighbours — the
    documented v3 neighbourhood semantics."""
    from dgcnn_tpu.ops.pallas_knn import fused_edge_conv_eval

    monkeypatch.setenv("DGCNN_TPU_EXTRACT", "v3")
    rng = np.random.RandomState(7)
    xn = rng.randn(1, 128, 8).astype(np.float32)
    xn[0, 64:] = xn[0, :64]  # every point duplicated once
    x = jnp.asarray(xn)
    wn = jnp.asarray(rng.randn(8, 12).astype(np.float32))
    wc = jnp.asarray(rng.randn(8, 12).astype(np.float32))
    sc = jnp.asarray((rng.rand(12) + 0.5).astype(np.float32))
    bi = jnp.asarray(rng.randn(12).astype(np.float32))
    k = 5
    got = fused_edge_conv_eval.__wrapped__(
        x, x, wn, wc, sc, bi, k, select_dtype=jnp.float32, interpret=True)
    # reference over the deduplicated cloud: top-k classes == top-k distinct
    # neighbours (each duplicated pair is one class with identical features)
    ref = _eval_stage_ref(x[:, :64], wn, wc, sc, bi, k)
    np.testing.assert_allclose(np.asarray(got[:, :64]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[:, 64:]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_knn_edge_reduce_xw_matches_projected(monkeypatch):
    """Select-x training form == projecting first, outputs and gradients
    (exact mode: the selection commutes with the linear map bitwise)."""
    monkeypatch.setenv("DGCNN_TPU_PALLAS_EXACT", "1")
    from dgcnn_tpu.ops.pallas_knn import knn_edge_reduce, knn_edge_reduce_xw

    rng = np.random.RandomState(8)
    xg = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    x = jnp.asarray(rng.randn(2, 128, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(16, 24).astype(np.float32) * 0.3)
    k = 6

    with jax.default_matmul_precision("float32"):
        ref = knn_edge_reduce(xg, x @ w, k)
        got = knn_edge_reduce_xw(xg, x, w, k)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-5, atol=1e-6)

        def loss_ref(x_, w_):
            out = knn_edge_reduce(xg, x_ @ w_, k)
            return sum(jnp.sum(jnp.square(o)) for o in out[1:])

        def loss_xw(x_, w_):
            out = knn_edge_reduce_xw(xg, x_, w_, k)
            return sum(jnp.sum(jnp.square(o)) for o in out[1:])

        gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        gx = jax.grad(loss_xw, argnums=(0, 1))(x, w)
    # grads chain through different contraction orders (dw einsum vs
    # autodiff of x @ w) — fp accumulation noise on large sums
    for a, b_ in zip(gr, gx):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-4, atol=1e-3)
