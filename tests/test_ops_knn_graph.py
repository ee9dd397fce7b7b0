"""Golden tests for knn / graph features vs the torch reference (read-only).

Reference semantics: /root/reference/models/dgcnn.py:6-44.  Our layout is
channels-last (B, N, C); the reference is (B, C, N) — tests transpose at the
boundary.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from dgcnn_tpu.ops import (
    edge_conv_batch_stats,
    edge_conv_fused,
    edge_conv_naive,
    edge_linear,
    fold_bn,
    get_graph_feature,
    knn,
)
from tests.conftest import requires_reference


def _ref_modules():
    import sys
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models import dgcnn as ref_dgcnn
    return ref_dgcnn


def test_knn_self_first():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 3).astype(np.float32)
    idx = np.asarray(knn(jnp.asarray(x), 8))
    assert idx.shape == (2, 64, 8)
    # each point's nearest neighbour is itself (distance exactly 0)
    np.testing.assert_array_equal(idx[:, :, 0], np.arange(64)[None, :].repeat(2, 0))


def test_knn_matches_bruteforce():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 50, 6).astype(np.float32)
    k = 7
    idx = np.asarray(knn(jnp.asarray(x), k))
    for b in range(3):
        d = ((x[b][:, None, :] - x[b][None, :, :]) ** 2).sum(-1)
        expect = np.argsort(d, axis=1, kind="stable")[:, :k]
        # compare distance sets (ties may reorder indices)
        got_d = np.take_along_axis(d, idx[b], axis=1)
        want_d = np.take_along_axis(d, expect, axis=1)
        np.testing.assert_allclose(np.sort(got_d, -1), np.sort(want_d, -1), atol=1e-4)


@requires_reference
def test_knn_matches_reference():
    import torch
    ref = _ref_modules()
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 100).astype(np.float32)  # reference layout (B, C, N)
    k = 10
    ref_idx = ref.knn(torch.from_numpy(x), k).numpy()
    our_idx = np.asarray(knn(jnp.asarray(x.transpose(0, 2, 1)), k))
    np.testing.assert_array_equal(our_idx, ref_idx)


@requires_reference
@pytest.mark.parametrize("mode", ["default", "knn_only", "disp_only"])
def test_get_graph_feature_matches_reference(mode):
    import torch
    ref = _ref_modules()
    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 60).astype(np.float32)  # (B, C, N)
    k = 6
    kwargs = dict(knn_only=(mode == "knn_only"), disp_only=(mode == "disp_only"))
    ref_out = ref.get_graph_feature(torch.from_numpy(x), k=k, **kwargs).numpy()
    ours = np.asarray(get_graph_feature(jnp.asarray(x.transpose(0, 2, 1)), k=k, **kwargs))
    if mode == "knn_only":
        # reference returns (B, N, k, C) in this mode
        np.testing.assert_allclose(ours, ref_out, atol=1e-5)
    else:
        # reference returns (B, C', N, k); ours is (B, N, k, C')
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref_out, atol=1e-5)


def test_edge_conv_fused_matches_naive():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 40, 16).astype(np.float32))
    w_nbr = jnp.asarray(rng.randn(16, 32).astype(np.float32) * 0.1)
    w_ctr = jnp.asarray(rng.randn(16, 32).astype(np.float32) * 0.1)
    # include negative scales to exercise the max/min sign trick
    scale = jnp.asarray(rng.randn(32).astype(np.float32))
    bias = jnp.asarray(rng.randn(32).astype(np.float32))
    idx = knn(x, 8)
    fused = edge_conv_fused(x, idx, w_nbr, w_ctr, scale, bias, 0.2)
    naive = edge_conv_naive(x, idx, w_nbr, w_ctr, scale, bias, 0.2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive), atol=1e-4)


def test_edge_conv_batch_stats_match_materialized():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(3, 30, 8).astype(np.float32))
    w_nbr = jnp.asarray(rng.randn(8, 12).astype(np.float32) * 0.3)
    w_ctr = jnp.asarray(rng.randn(8, 12).astype(np.float32) * 0.3)
    idx = knn(x, 5)
    mean, var = edge_conv_batch_stats(x, idx, w_nbr, w_ctr)
    z = np.asarray(edge_linear(x, idx, w_nbr, w_ctr))  # (B, N, k, Co)
    np.testing.assert_allclose(np.asarray(mean), z.mean((0, 1, 2)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(var), z.var((0, 1, 2)), atol=1e-4)


@requires_reference
def test_edge_conv_matches_reference_conv_bn_lrelu_max():
    """Full EdgeConv block parity: conv2d(1x1) + BN(eval) + LeakyReLU + max-k."""
    import torch
    ref = _ref_modules()
    rng = np.random.RandomState(6)
    b, c, n, co, k = 2, 6, 50, 16, 9
    x = rng.randn(b, c, n).astype(np.float32)
    w = (rng.randn(co, 2 * c, 1, 1) * 0.2).astype(np.float32)
    gamma = rng.rand(co).astype(np.float32) + 0.5
    beta = rng.randn(co).astype(np.float32)
    rmean = rng.randn(co).astype(np.float32) * 0.1
    rvar = rng.rand(co).astype(np.float32) + 0.5

    conv = torch.nn.Conv2d(2 * c, co, 1, bias=False)
    conv.weight.data = torch.from_numpy(w)
    bn = torch.nn.BatchNorm2d(co).eval()
    bn.weight.data = torch.from_numpy(gamma)
    bn.bias.data = torch.from_numpy(beta)
    bn.running_mean.data = torch.from_numpy(rmean)
    bn.running_var.data = torch.from_numpy(rvar)
    with torch.no_grad():
        edge = ref.get_graph_feature(torch.from_numpy(x), k=k)  # (B, 2C, N, k)
        ref_out = torch.nn.functional.leaky_relu(bn(conv(edge)), 0.2).max(-1)[0]

    import jax

    xj = jnp.asarray(x.transpose(0, 2, 1))
    idx = knn(xj, k)
    w2 = w[:, :, 0, 0]  # (Co, 2C)
    scale, bias = fold_bn(
        jnp.asarray(gamma), jnp.asarray(beta), jnp.asarray(rmean),
        jnp.asarray(rvar), 1e-5,
    )
    # this environment defaults matmuls to bf16 multiplies (TPU-style); pin
    # f32 for the parity comparison — the op honours the jax-wide default
    with jax.default_matmul_precision("float32"):
        ours = edge_conv_fused(
            xj, idx, jnp.asarray(w2[:, :c].T), jnp.asarray(w2[:, c:].T),
            scale, bias, 0.2,
        )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 2, 1), ref_out.numpy(), atol=1e-4
    )
