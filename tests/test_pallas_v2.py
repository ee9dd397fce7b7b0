"""Packed single-reduce (v2) extraction tests (ops/pallas_knn._pack_keys).

v2 is the AMP/training default for index-emitting kernels and the semseg
eval pin: one integer max-reduce per iteration (v3's cost) WITH a
per-member index stream, torch.topk tie order on bit-equal scores.
Each test uses shapes distinct from other tests: the extraction variant is
read at trace time, so reusing a (shape, static-args) signature across
different env settings would hit a stale jit cache.
"""
import numpy as np

import jax
import jax.numpy as jnp

from dgcnn_tpu.ops import gather_neighbors, pairwise_neg_sqdist
from dgcnn_tpu.ops.pallas_knn import fused_knn_reduce


def _xla_knn(x, k):
    return jax.lax.top_k(pairwise_neg_sqdist(x), k)[1].astype(jnp.int32)


def test_v2_integer_grid_duplicates_exact():
    """Integer-coordinate clouds: squared distances are exact integers, so
    quantization is lossless and v2 must reproduce lax.top_k/torch.topk
    indices BIT-EXACTLY — including lowest-index order among the exact ties
    created by duplicated points (the S3DIS case the semseg CLI pins v2
    for)."""
    rng = np.random.RandomState(10)
    xi = rng.randint(0, 12, size=(2, 384, 4)).astype(np.float32)
    xi[:, 100:160] = xi[:, 0:60]  # duplicated points -> exact score ties
    x = jnp.asarray(xi)
    a = jnp.asarray(rng.randn(2, 384, 16).astype(np.float32))
    k = 9
    # bf16 select_dtype = the AMP default path = v2 extraction
    idx, amax, amin, asum = fused_knn_reduce(
        x, a, k, select_dtype=jnp.bfloat16, interpret=True)
    ref_idx = np.asarray(_xla_knn(x, k))
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    # reductions select bf16-rounded feature values (AMP contract)
    a16 = jnp.asarray(a).astype(jnp.bfloat16).astype(jnp.float32)
    ag = np.asarray(gather_neighbors(a16, jnp.asarray(ref_idx)))
    np.testing.assert_allclose(np.asarray(amax), ag.max(2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(amin), ag.min(2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(asum), ag.sum(2), rtol=1e-6,
                               atol=1e-5)


def test_v2_random_clouds_match_topk():
    """Generic random f32 clouds: v2's fixed-point quantization sits within
    ~2x of the score computation's own f32 rounding noise, so neighbour
    indices should agree with exact top-k everywhere except vanishingly
    rare near-ties (none at this size/seed — asserted exact)."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(3, 256, 8).astype(np.float32))
    a = jnp.asarray(rng.randn(3, 256, 24).astype(np.float32))
    idx = np.asarray(fused_knn_reduce(
        x, a, 11, select_dtype=jnp.bfloat16, interpret=True)[0])
    ref = np.asarray(_xla_knn(x, 11))
    assert (idx == ref).mean() > 0.999


def test_eval_stage_v2_exact_scores_matches_xla(monkeypatch):
    """DGCNN_TPU_EXTRACT=v2 on the fused eval stage with f32 selection:
    output matches the XLA gather reference (v2 with exact scores differs
    from v1 only on sub-quantization near-ties, absent here)."""
    from dgcnn_tpu.ops.pallas_knn import fused_edge_conv_eval

    monkeypatch.setenv("DGCNN_TPU_EXTRACT", "v2")
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(2, 384, 12).astype(np.float32))
    wn = jnp.asarray(rng.randn(12, 20).astype(np.float32))
    wc = jnp.asarray(rng.randn(12, 20).astype(np.float32))
    sc = jnp.asarray((rng.rand(20) + 0.5).astype(np.float32))
    bi = jnp.asarray(rng.randn(20).astype(np.float32))
    k = 8
    got = fused_edge_conv_eval.__wrapped__(
        x, x, wn, wc, sc, bi, k, select_dtype=jnp.float32, interpret=True)
    idx = _xla_knn(x, k)
    aa = jnp.einsum("bnc,cd->bnd", x, wn)
    bb = jnp.einsum("bnc,cd->bnd", x, wc)
    ag = gather_neighbors(aa, idx)
    z = (ag + bb[:, :, None, :]) * sc + bi
    ref = jnp.max(jnp.where(z >= 0, z, 0.2 * z), axis=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_edge2_v2_duplicates_match_xla(monkeypatch):
    """The two-conv eval kernel under v2 with duplicate-heavy clouds (the
    semseg CLI's pinned configuration) matches the XLA gather reference
    computed over torch-order neighbour indices — the member-by-member
    semantics v3's class-walk cannot provide."""
    from dgcnn_tpu.ops.edge_conv import _project
    from dgcnn_tpu.ops.pallas_knn import fused_knn_edge2

    monkeypatch.setenv("DGCNN_TPU_EXTRACT", "v2")
    monkeypatch.setenv("DGCNN_TPU_PALLAS_EXACT", "1")  # exact scores
    rng = np.random.RandomState(13)
    xi = rng.randint(0, 9, size=(1, 256, 6)).astype(np.float32)
    xi[0, 64:128] = xi[0, 0:64]  # duplicates -> ties in every row
    x = jnp.asarray(xi)
    w1n = jnp.asarray(rng.randn(6, 14).astype(np.float32))
    w1c = jnp.asarray(rng.randn(6, 14).astype(np.float32))
    s1 = jnp.asarray((rng.rand(14) + 0.5).astype(np.float32))
    t1 = jnp.asarray(rng.randn(14).astype(np.float32))
    w2 = jnp.asarray(rng.randn(14, 10).astype(np.float32))
    s2 = jnp.asarray((rng.rand(10) + 0.5).astype(np.float32))
    t2 = jnp.asarray(rng.randn(10).astype(np.float32))
    k = 7
    with jax.default_matmul_precision("float32"):
        got = fused_knn_edge2.__wrapped__(
            x, _project(x, w1n), _project(x, w1c), s1, t1, w2, s2, t2, k,
            interpret=True)
        idx = _xla_knn(x, k)
        ag = gather_neighbors(_project(x, w1n), idx)
        z1 = (ag + _project(x, w1c)[:, :, None, :]) * s1 + t1
        h1 = jnp.where(z1 >= 0, z1, 0.2 * z1)
        z2 = jnp.einsum("bnkc,cd->bnkd", h1, w2) * s2 + t2
        ref = jnp.max(jnp.where(z2 >= 0, z2, 0.2 * z2), axis=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_train_default_amp_close_to_exact(monkeypatch):
    """Training default (bf16x3 scores + v2 + bf16 selection — the
    reference trains under fp16 autocast, main_partseg_dist.py:221) stays
    numerically close to the exact mode: same neighbour sets on this data,
    values within bf16 rounding."""
    from dgcnn_tpu.ops.pallas_knn import knn_edge_reduce

    rng = np.random.RandomState(14)
    xg = jnp.asarray(rng.randn(2, 640, 3).astype(np.float32))
    a = jnp.asarray(rng.randn(2, 640, 18).astype(np.float32))
    k = 5

    def loss(a_):
        out = knn_edge_reduce(xg, a_, k)
        return sum(jnp.sum(jnp.square(o)) for o in out[1:])

    monkeypatch.setenv("DGCNN_TPU_PALLAS_EXACT", "1")
    with jax.default_matmul_precision("float32"):
        l_exact, g_exact = jax.value_and_grad(loss)(a)
    monkeypatch.delenv("DGCNN_TPU_PALLAS_EXACT")
    l_amp, g_amp = jax.value_and_grad(loss)(a)
    np.testing.assert_allclose(float(l_amp), float(l_exact), rtol=2e-2)
    # AMP scores can flip a handful of near-tie neighbours (torch's fp16
    # autocast training has the same property), which reroutes max/min
    # cotangents at those entries — check agreement in aggregate
    ga, ge = np.asarray(g_amp), np.asarray(g_exact)
    close = np.isclose(ga, ge, rtol=5e-2, atol=5e-2)
    assert close.mean() > 0.99, f"grad agreement {close.mean():.4f}"
    rel = np.linalg.norm(ga - ge) / np.linalg.norm(ge)
    assert rel < 0.05, f"grad relative L2 drift {rel:.4f}"


def test_pack_keys_degenerate_all_tied():
    """A fully degenerate cloud (all points identical -> all scores zero)
    walks columns in index order — torch's order for an all-tied row."""
    x = jnp.ones((1, 128, 3), jnp.float32)
    a = jnp.asarray(np.random.RandomState(15).randn(1, 128, 8)
                    .astype(np.float32))
    idx = np.asarray(fused_knn_reduce(
        x, a, 4, select_dtype=jnp.bfloat16, interpret=True)[0])
    expect = np.broadcast_to(np.arange(4, dtype=np.int32), (1, 128, 4))
    np.testing.assert_array_equal(idx, expect)


def test_fused_knn_sum_matches_reduce():
    """The sum-only kernel (one multi-hot matmul) returns the same idx and
    f32-exact sums as fused_knn_reduce's per-iteration selection path."""
    from dgcnn_tpu.ops.pallas_knn import fused_knn_sum

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 384, 3).astype(np.float32))
    a = jnp.asarray(rng.randn(2, 384, 9).astype(np.float32))
    k = 12
    idx0, _, _, s0 = fused_knn_reduce(
        x, a, k, select_dtype=jnp.float32, extract="v2", interpret=True)
    idx1, s1 = fused_knn_sum(x, a, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx0), np.asarray(idx1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=1e-5, atol=1e-5)


def test_pack_keys_rowmin_no_sentinel_collision():
    """Regression: the row-minimum score could quantize one step past -lim
    (f32 rounding of score*scale), and -(lim+1)*2^b for the LAST column
    packs to exactly INT32_MIN — the masked-rewrite sentinel.  The clamp
    keeps every real key strictly above the sentinel, so multi-hot
    consumers (keys == sentinel) see exactly k members per row."""
    from dgcnn_tpu.ops.pallas_knn import _pack_keys, _scores

    jax.config.update("jax_platforms", "cpu")
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 256, 3).astype(np.float32))
    x = x - jnp.mean(x, axis=1, keepdims=True)
    with jax.default_matmul_precision("float32"):
        scores = _scores(x[0], x[0], exact=True)
    keys = np.asarray(_pack_keys(scores, 256))
    assert (keys > np.iinfo(np.int32).min).all()
