"""Fused whole-KV-resident attention kernel (ops/pallas_attention.py).

CPU (interpret-mode) coverage: the dropout-free math — forward and all
three input gradients — pinned against dense XLA attention, in f32 and
bf16.  The in-kernel PRNG path (dropout_rate > 0) cannot run on CPU
(pltpu.prng_* interprets to zeros); its oracle test — dense XLA attention
given the kernel's own materialized mask must reproduce the fused output
and gradients — runs on the real chip via tools/attention_check.py
(results recorded in CLAUDE.md / PERF.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.ops.pallas_attention import (
    _pick_tile_q,
    fused_attention,
    supported,
)


def _dense(q, k, v, scale):
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


def _rand(rng, shape, dtype):
    return jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)


@pytest.mark.parametrize("nq,nk", [(256, 256), (384, 256)])
def test_forward_matches_dense_f32(nq, nk):
    rng = np.random.RandomState(0)
    b, h, d = 2, 2, 128
    q = _rand(rng, (b, h, nq, d), jnp.float32)
    k = _rand(rng, (b, h, nk, d), jnp.float32)
    v = _rand(rng, (b, h, nk, d), jnp.float32)
    scale = 1.0 / d**0.5
    with jax.default_matmul_precision("float32"):
        out = fused_attention(q, k, v, sm_scale=scale)
        ref = _dense(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_grads_match_dense_f32():
    rng = np.random.RandomState(1)
    b, h, n, d = 2, 2, 256, 128
    q = _rand(rng, (b, h, n, d), jnp.float32)
    k = _rand(rng, (b, h, n, d), jnp.float32)
    v = _rand(rng, (b, h, n, d), jnp.float32)
    do = _rand(rng, (b, h, n, d), jnp.float32)
    scale = 1.0 / d**0.5
    with jax.default_matmul_precision("float32"):
        gref = jax.vjp(lambda *a: _dense(*a, scale), q, k, v)[1](do)
        gfa = jax.vjp(
            lambda *a: fused_attention(*a, sm_scale=scale), q, k, v
        )[1](do)
    for name, a, b_ in zip("qkv", gref, gfa):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-6,
            err_msg=f"d{name} mismatch")


def test_bf16_matches_dense_bf16():
    """The AMP path: bf16 inputs, f32 softmax, bf16 prob matmul."""
    rng = np.random.RandomState(2)
    b, h, n, d = 2, 2, 256, 128
    q = _rand(rng, (b, h, n, d), jnp.bfloat16)
    k = _rand(rng, (b, h, n, d), jnp.bfloat16)
    v = _rand(rng, (b, h, n, d), jnp.bfloat16)
    scale = 1.0 / d**0.5
    out = fused_attention(q, k, v, sm_scale=scale)
    ref = _dense(q, k, v, scale)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2)


def test_grad_flows_through_net_params():
    """End-to-end: a scalar loss over fused attention differentiates
    w.r.t. upstream projections (the custom VJP wires into autodiff)."""
    rng = np.random.RandomState(3)
    b, h, n, d = 1, 2, 128, 128
    x = _rand(rng, (b, n, h * d), jnp.float32)
    w = _rand(rng, (h * d, h * d), jnp.float32) / (h * d) ** 0.5

    def loss(w_):
        qkv = (x @ w_).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        out = fused_attention(qkv, qkv, qkv, sm_scale=1.0 / d**0.5)
        return jnp.sum(out**2)

    g = jax.grad(loss)(w)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.max(jnp.abs(g))) > 0


def test_seed_required_for_dropout():
    q = jnp.zeros((1, 1, 128, 128), jnp.float32)
    with pytest.raises(ValueError):
        fused_attention(q, q, q, sm_scale=1.0, dropout_rate=0.5)


def test_supported_shapes():
    assert supported((24, 2, 2048, 256), (24, 2, 2048, 256))
    assert not supported((24, 2, 2048, 192), (24, 2, 2048, 192))  # d%128
    assert not supported((24, 2, 2000, 256), (24, 2, 2000, 256))  # nk%128
    # huge Nk: no tile fits the VMEM budget
    assert not supported((1, 1, 128, 256), (1, 1, 1 << 17, 256))
    assert _pick_tile_q(2048, 2048, 256) in (256, 512, 1024)


def test_dispatch_gating(monkeypatch):
    """_use_fused: off under EXACT, off on the CPU backend."""
    from dgcnn_tpu.models.torch_transformer import _use_fused

    qs = ks = (2, 2, 2048, 256)
    monkeypatch.delenv("DGCNN_TPU_PALLAS_EXACT", raising=False)
    # CPU backend in tests -> False regardless
    assert not _use_fused(True, 0.5, qs, ks)
    assert not _use_fused(False, 0.5, qs, ks)
    assert not _use_fused(True, 0.0, qs, ks)
    monkeypatch.setenv("DGCNN_TPU_PALLAS_EXACT", "1")
    assert not _use_fused(True, 0.5, qs, ks)


def test_dense_fallback_chunking(monkeypatch):
    """The exact/XLA dense fallback streams query chunks when the score
    slab would be huge (chip-scale exact eval OOM'd 16 GB HBM otherwise):
    chunked fwd and grads must match the single-pass dense path to f32
    roundoff, and tiny shapes must stay on the unchunked (nc == 1) path."""
    from dgcnn_tpu.models import torch_transformer as tt

    assert tt._dense_q_chunks((2, 2, 64, 16), (2, 2, 64, 16)) == 1
    # the r5 OOM shape: stacked batch-64 fusion Net eval -> 16+ chunks
    assert tt._dense_q_chunks((128, 2, 2048, 256), (128, 2, 2048, 256)) >= 8

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32))
    mha = tt.TorchMultiheadAttention(32, 2, dropout=0.0)
    vs = mha.init(jax.random.PRNGKey(0), x, x, x, train=False)

    def loss(p):
        return jnp.sum(mha.apply({"params": p}, x, x, x, train=False) ** 2)

    ref = mha.apply(vs, x, x, x, train=False)
    gref = jax.grad(loss)(vs["params"])
    monkeypatch.setattr(tt, "_DENSE_CHUNK_BYTES", 1024)
    assert tt._dense_q_chunks((2, 2, 64, 16), (2, 2, 64, 16)) > 1
    out = mha.apply(vs, x, x, x, train=False)
    g = jax.grad(loss)(vs["params"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(gref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
