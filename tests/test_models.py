"""Model-zoo smoke + parity tests (tiny shapes — the host is 1-core and XLA
compiles are expensive; each model gets one init+apply)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgcnn_tpu.models import (
    DGCNN,
    DGCNNCls,
    DGCNNPartSeg,
    DGCNNSemSeg,
    MLPHead,
    MultiHeadVectorAttention,
    Net,
    PointNet,
    PositionEmbedding,
    TorchTransformer,
    Transformer,
    TransformNet,
    VectorAttention,
)

B, N, K = 2, 24, 4
EMB = 32


def _init_apply(model, *args, train=False, method=None):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, *args, train=train)
    out, updates = model.apply(
        variables,
        *args,
        train=train,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    return out, variables, updates


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(B, N, 3).astype(np.float32))


def test_dgcnn_backbone_shapes(cloud):
    out, variables, _ = _init_apply(DGCNN(emb_dims=EMB, k=K), cloud)
    assert out.shape == (B, N, EMB)
    # four edge convs + conv5
    assert set(variables["params"].keys()) == {
        "conv1", "conv2", "conv3", "conv4", "conv5"
    }


def test_dgcnn_backbone_train_updates_stats(cloud):
    model = DGCNN(emb_dims=EMB, k=K)
    out, variables, updates = _init_apply(model, cloud, train=True)
    assert out.shape == (B, N, EMB)
    before = variables["batch_stats"]["conv1"]["mean"]
    after = updates["batch_stats"]["conv1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_position_embedding_identity_at_init(cloud):
    """Transform init is weight=0 bias=identity (reference layers.py:38-39), so
    an untrained PositionEmbedding must return the input unchanged."""
    out, _, _ = _init_apply(PositionEmbedding(k=K), cloud)
    np.testing.assert_allclose(np.asarray(out), np.asarray(cloud), atol=1e-5)


def test_transform_net_identity_at_init(cloud):
    from dgcnn_tpu.ops import get_graph_feature

    e = get_graph_feature(cloud, k=K)
    t, _, _ = _init_apply(TransformNet(), e)
    assert t.shape == (B, 3, 3)
    np.testing.assert_allclose(
        np.asarray(t), np.broadcast_to(np.eye(3), (B, 3, 3)), atol=1e-5
    )


def test_dgcnn_cls_shapes(cloud):
    out, _, _ = _init_apply(DGCNNCls(emb_dims=EMB, k=K, output_channels=40), cloud)
    assert out.shape == (B, 40)


def test_pointnet_shapes(cloud):
    out, _, _ = _init_apply(PointNet(emb_dims=EMB, output_channels=40), cloud)
    assert out.shape == (B, 40)


def test_dgcnn_partseg_shapes(cloud):
    lbl = jnp.asarray(np.eye(16, dtype=np.float32)[np.array([0, 3])])
    out, _, _ = _init_apply(
        DGCNNPartSeg(emb_dims=EMB, k=K, seg_num_all=50), cloud, lbl
    )
    assert out.shape == (B, N, 50)


def test_dgcnn_semseg_shapes():
    rng = np.random.RandomState(1)
    x9 = jnp.asarray(rng.rand(B, N, 9).astype(np.float32))
    out, _, _ = _init_apply(DGCNNSemSeg(emb_dims=EMB, k=K), x9)
    assert out.shape == (B, N, 13)


def test_vector_attention_shapes(cloud):
    rng = np.random.RandomState(2)
    f = jnp.asarray(rng.randn(B, N, EMB).astype(np.float32))
    out, _, _ = _init_apply(
        VectorAttention(emb_dim=EMB, d_qkv=8, k=K), f, f, f, cloud
    )
    assert out.shape == (B, N, EMB)


def test_multihead_vector_attention_shapes(cloud):
    rng = np.random.RandomState(3)
    f = jnp.asarray(rng.randn(B, N, EMB).astype(np.float32))
    out, _, _ = _init_apply(
        MultiHeadVectorAttention(emb_dim=EMB, n_heads=2, dim_head=8, k=K),
        f, f, f, cloud,
    )
    assert out.shape == (B, N, EMB)


def test_custom_transformer_shapes(cloud):
    rng = np.random.RandomState(4)
    f = jnp.asarray(rng.randn(B, N, EMB).astype(np.float32))
    g = jnp.asarray(rng.randn(B, N, EMB).astype(np.float32))
    model = Transformer(emb_dim=EMB, n_blocks=1, d_qkv=8, k=K, ff_dims=16)
    (src_e, tgt_e), _, _ = _init_apply(model, f, g, cloud)
    assert src_e.shape == (B, N, EMB) and tgt_e.shape == (B, N, EMB)


def test_fusion_net_shapes(cloud):
    lbl = jnp.asarray(np.eye(16, dtype=np.float32)[np.array([0, 3])])
    model = Net(emb_dim=EMB, k=K, n_heads=2, n_blocks=1, ff_dims=16, nclasses=50)
    out, _, _ = _init_apply(model, cloud, lbl)
    assert out.shape == (B, N, 50)


def test_fusion_net_custom_attention(cloud):
    """The wired --use_custom_attention path (vector-attention transformer)."""
    lbl = jnp.asarray(np.eye(16, dtype=np.float32)[np.array([0, 3])])
    model = Net(emb_dim=EMB, k=K, n_heads=2, n_blocks=1, ff_dims=16,
                d_qkv=8, nclasses=50, use_custom_attention=True)
    out, _, _ = _init_apply(model, cloud, lbl)
    assert out.shape == (B, N, 50)
