"""Point-axis (sequence-parallel) sharding vs unsharded reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgcnn_tpu.ops import edge_conv_fused, gather_neighbors, knn
from dgcnn_tpu.parallel import make_mesh
from dgcnn_tpu.parallel.point_sharded import (
    sharded_edge_conv_fused,
    sharded_gather_neighbors,
    sharded_knn,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_sharded_knn_matches_unsharded():
    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    ref = np.asarray(knn(x, 5))
    got = np.asarray(jax.jit(sharded_knn(mesh, 5))(x))
    np.testing.assert_array_equal(got, ref)


def test_sharded_gather_matches_unsharded():
    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(2, 64, 16).astype(np.float32))
    idx = knn(x, 5)
    ref = np.asarray(gather_neighbors(f, idx))
    got = np.asarray(jax.jit(sharded_gather_neighbors(mesh))(f, idx))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_sharded_edge_conv_matches_unsharded():
    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
    w1 = jnp.asarray(rng.randn(8, 16).astype(np.float32) * 0.3)
    w2 = jnp.asarray(rng.randn(8, 16).astype(np.float32) * 0.3)
    scale = jnp.asarray(rng.randn(16).astype(np.float32))
    bias = jnp.asarray(rng.randn(16).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(edge_conv_fused(x, knn(x, 5), w1, w2, scale, bias))
        got = np.asarray(jax.jit(sharded_edge_conv_fused(mesh, 5))(
            x, w1, w2, scale, bias))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_point_sharded_semseg_model_matches_unsharded():
    """Whole DGCNNSemSeg eval forward with the point axis sharded over an
    8-device mesh == the unsharded forward (per-point logits)."""
    from dgcnn_tpu.models import DGCNNSemSeg
    from dgcnn_tpu.parallel import point_sharded_apply

    mesh = make_mesh(jax.devices()[:8])
    model = DGCNNSemSeg(emb_dims=32, k=5, dropout=0.0)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 64, 9).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def apply_fn(v, pts):
        return model.apply(v, pts, train=False)

    with jax.default_matmul_precision("float32"):
        ref = np.asarray(apply_fn(variables, x))
        call = jax.jit(point_sharded_apply(apply_fn, mesh))
        got = np.asarray(call(variables, x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_point_sharded_cls_model_matches_unsharded():
    """DGCNNCls eval under point sharding: the global max+mean pools cross
    shards via pmax/pmean; per-cloud logits replicate exactly."""
    from dgcnn_tpu.models import DGCNNCls
    from dgcnn_tpu.parallel import point_sharded_apply

    mesh = make_mesh(jax.devices()[:8])
    model = DGCNNCls(emb_dims=32, k=5, output_channels=7)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def apply_fn(v, pts):
        return model.apply(v, pts, train=False)

    with jax.default_matmul_precision("float32"):
        ref = np.asarray(apply_fn(variables, x))
        call = jax.jit(point_sharded_apply(apply_fn, mesh, out_sharded=False))
        got = np.asarray(call(variables, x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_2d_dp_sp_mesh_matches_unsharded():
    """Combined data x point sharding (2x4 mesh): batch shards over dp,
    points over sp; semseg logits, cls logits, and the seg-eval loss all
    match the unsharded single-device computation."""
    from dgcnn_tpu.models import DGCNNCls, DGCNNSemSeg
    from dgcnn_tpu.parallel import make_mesh_2d, point_sharded_apply
    from dgcnn_tpu.parallel.point_sharded import point_sharded_seg_eval

    mesh = make_mesh_2d(jax.devices()[:8], dp=2, sp=4)
    rng = np.random.RandomState(5)

    # per-point outputs (semseg)
    seg_model = DGCNNSemSeg(emb_dims=32, k=5, dropout=0.0)
    x9 = jnp.asarray(rng.rand(4, 64, 9).astype(np.float32))
    seg_vars = seg_model.init({"params": jax.random.PRNGKey(0)}, x9,
                              train=False)

    def seg_apply(v, pts):
        return seg_model.apply(v, pts, train=False)

    with jax.default_matmul_precision("float32"):
        ref = np.asarray(seg_apply(seg_vars, x9))
        call = jax.jit(point_sharded_apply(seg_apply, mesh,
                                           axis="point",
                                           batch_axis="data"))
        got = np.asarray(call(seg_vars, x9))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # per-cloud outputs (cls), dp-sharded on the batch axis
    cls_model = DGCNNCls(emb_dims=32, k=5, output_channels=7)
    x3 = jnp.asarray(rng.randn(4, 64, 3).astype(np.float32))
    cls_vars = cls_model.init({"params": jax.random.PRNGKey(0)}, x3,
                              train=False)

    def cls_apply(v, pts):
        return cls_model.apply(v, pts, train=False)

    with jax.default_matmul_precision("float32"):
        ref = np.asarray(cls_apply(cls_vars, x3))
        call = jax.jit(point_sharded_apply(cls_apply, mesh, axis="point",
                                           out_sharded=False,
                                           batch_axis="data"))
        got = np.asarray(call(cls_vars, x3))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # full seg-eval step: masked loss reduces across the dp shards exactly
    from dgcnn_tpu.train.engine import TrainState, make_optimizer

    state = TrainState.create(
        apply_fn=seg_model.apply, params=seg_vars["params"],
        batch_stats=seg_vars["batch_stats"],
        tx=make_optimizer(use_sgd=True, schedule=lambda _: 0.0))
    seg = jnp.asarray(rng.randint(0, 13, (4, 64)).astype(np.int32))
    mask = jnp.asarray([True, True, True, False])
    ev1 = point_sharded_seg_eval(seg_model, make_mesh_2d(
        jax.devices()[:8], dp=1, sp=8, point_axis="point"), axis="point")
    ev2 = point_sharded_seg_eval(seg_model, mesh, axis="point",
                                 batch_axis="data")
    with jax.default_matmul_precision("float32"):
        out1 = {k: np.asarray(v) for k, v in ev1(state, x9, seg, mask).items()}
        out2 = {k: np.asarray(v) for k, v in ev2(state, x9, seg, mask).items()}
    np.testing.assert_allclose(out2["loss"], out1["loss"], rtol=1e-6)
    np.testing.assert_array_equal(out2["preds"], out1["preds"])
