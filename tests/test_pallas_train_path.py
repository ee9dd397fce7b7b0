"""Fused-Pallas training path == XLA training path (outputs, BN stats, grads).

DGCNN_TPU_PALLAS=1 forces the fused EdgeConv path (interpret mode on CPU).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgcnn_tpu.models import DGCNN


@pytest.fixture
def force_pallas():
    old = os.environ.get("DGCNN_TPU_PALLAS")
    old_exact = os.environ.get("DGCNN_TPU_PALLAS_EXACT")
    os.environ["DGCNN_TPU_PALLAS"] = "1"
    # training parity at tight tolerance needs the exact f32 selection
    # (default training is bf16 AMP-style, like the reference's autocast)
    os.environ["DGCNN_TPU_PALLAS_EXACT"] = "1"
    yield
    for key, val in (("DGCNN_TPU_PALLAS", old),
                     ("DGCNN_TPU_PALLAS_EXACT", old_exact)):
        if val is None:
            os.environ.pop(key, None)
        else:
            os.environ[key] = val


def _run(model, variables, x, train):
    def loss_fn(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=train, mutable=["batch_stats"],
        )
        return jnp.sum(jnp.square(out)), updates["batch_stats"]

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    return loss, stats, grads


def test_fused_train_matches_xla(force_pallas):
    model = DGCNN(emb_dims=32, k=5)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    with jax.default_matmul_precision("float32"):
        loss_p, stats_p, grads_p = _run(model, variables, x, train=True)
        os.environ["DGCNN_TPU_PALLAS"] = "0"
        loss_x, stats_x, grads_x = _run(model, variables, x, train=True)

    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(stats_p), jax.tree.leaves(stats_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(grads_p),
               key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(grads_x),
               key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4,
            err_msg=str(pa),
        )


def test_fused_eval_matches_xla(force_pallas):
    model = DGCNN(emb_dims=32, k=5)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    os.environ["DGCNN_TPU_PALLAS_EXACT"] = "1"
    try:
        with jax.default_matmul_precision("float32"):
            out_p = model.apply(variables, x, train=False)
    finally:
        os.environ.pop("DGCNN_TPU_PALLAS_EXACT", None)
    # default (bf16 selection) path: same up to bf16 feature rounding
    with jax.default_matmul_precision("float32"):
        out_b = model.apply(variables, x, train=False)
        os.environ["DGCNN_TPU_PALLAS"] = "0"
        out_x = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=1e-4, atol=1e-5
    )
    # bf16 feature rounding can flip near-tie neighbours in the *next*
    # layer's dynamic graph, so a small fraction of elements legitimately
    # diverges — require structural agreement, not elementwise equality
    # (threshold 0.98: select-then-project rounds the raw features to bf16
    # before the in-kernel projection, AMP-style, slightly widening this)
    a_, b_ = np.asarray(out_b).ravel(), np.asarray(out_x).ravel()
    assert (np.abs(a_ - b_) < 0.05).mean() > 0.98
    assert np.corrcoef(a_, b_)[0, 1] > 0.999


def test_cls_fused_conv_pool_matches_xla(force_pallas):
    """DGCNNCls eval with the fused conv5+BN+LReLU+global-pool kernel
    (ops/pallas_pool.py) equals the XLA composition under exact settings."""
    from dgcnn_tpu.models import DGCNNCls

    model = DGCNNCls(emb_dims=32, k=5, output_channels=7)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    with jax.default_matmul_precision("float32"):
        out_p = model.apply(variables, x, train=False)
        os.environ["DGCNN_TPU_PALLAS"] = "0"
        out_x = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=2e-4, atol=2e-5
    )


def test_partseg_fused_eval_matches_xla(force_pallas):
    """DGCNNPartSeg eval (fused two-conv stages + fused embed-pool) equals
    the XLA composition under exact settings."""
    from dgcnn_tpu.models import DGCNNPartSeg

    model = DGCNNPartSeg(emb_dims=32, k=5, dropout=0.0, seg_num_all=11)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    lbl = jnp.asarray(np.eye(16, dtype=np.float32)[rng.randint(0, 16, 2)])
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, lbl,
                           train=False)
    with jax.default_matmul_precision("float32"):
        out_p = model.apply(variables, x, lbl, train=False)
        os.environ["DGCNN_TPU_PALLAS"] = "0"
        out_x = model.apply(variables, x, lbl, train=False)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=2e-4, atol=2e-5
    )


def test_fused_edge2_block_matches_xla(force_pallas):
    """The fully fused two-conv stage (partseg/semseg blocks) in eval mode
    equals the XLA composition under exact-select settings."""
    from dgcnn_tpu.models import DGCNNSemSeg

    model = DGCNNSemSeg(emb_dims=16, k=5, dropout=0.0)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 128, 9).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    os.environ["DGCNN_TPU_PALLAS_EXACT"] = "1"
    try:
        with jax.default_matmul_precision("float32"):
            out_p = model.apply(variables, x, train=False)
            os.environ["DGCNN_TPU_PALLAS"] = "0"
            out_x = model.apply(variables, x, train=False)
    finally:
        os.environ.pop("DGCNN_TPU_PALLAS_EXACT", None)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=2e-4, atol=2e-5
    )


def test_fused_edge2_train_matches_xla(force_pallas):
    """The fused two-conv TRAINING stage (knn_edge_reduce idx/BN1-stats +
    edge2_reduce BN2-stats/max-min with Pallas custom VJP) matches the XLA
    materializing path: outputs, both layers' running stats, and grads."""
    from dgcnn_tpu.models import DGCNNSemSeg

    model = DGCNNSemSeg(emb_dims=16, k=5, dropout=0.0)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 128, 9).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def run(xv):
        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xv, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return jnp.sum(jnp.square(out)), updates["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        return loss, stats, grads

    with jax.default_matmul_precision("float32"):
        loss_p, stats_p, grads_p = run(x)
        os.environ["DGCNN_TPU_PALLAS"] = "0"
        loss_x, stats_x, grads_x = run(x)

    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-4)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(stats_p),
               key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(stats_x),
               key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=str(pa))
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(grads_p),
               key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(grads_x),
               key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4,
            err_msg=str(pa),
        )


def test_fused_edge2_train_bf16_mode_close(force_pallas):
    """Default (AMP-style bf16 selection) training path stays close to the
    exact path — loose tolerance, sanity for the production configuration."""
    from dgcnn_tpu.models import DGCNNSemSeg

    model = DGCNNSemSeg(emb_dims=16, k=5, dropout=0.0)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 128, 9).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return jnp.sum(jnp.square(out))

    with jax.default_matmul_precision("float32"):
        loss_exact = float(jax.value_and_grad(loss_fn)(
            variables["params"])[0])
        os.environ.pop("DGCNN_TPU_PALLAS_EXACT", None)
        loss_bf16, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert abs(float(loss_bf16) - loss_exact) / abs(loss_exact) < 0.05
    assert all(bool(jnp.all(jnp.isfinite(g)))
               for g in jax.tree.leaves(grads))
