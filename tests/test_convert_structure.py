"""Structural conversion tests: converted state dicts must produce exactly
the parameter/batch-stats trees the flax models expect (keys AND shapes) —
this is what guarantees pretrained .t7 checkpoints drop in (SURVEY.md §7
hard-part 2) without needing the (absent) pretrained files themselves."""
import numpy as np

import jax
import jax.numpy as jnp

from dgcnn_tpu.convert import (
    convert_dgcnn_cls,
    convert_dgcnn_partseg,
    convert_dgcnn_semseg,
    convert_pointnet,
)
from dgcnn_tpu.models import DGCNNCls, DGCNNPartSeg, DGCNNSemSeg, PointNet


def _bn(sd, prefix, c):
    rng = np.random.RandomState(hash(prefix) % 2**31)
    sd[f"{prefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
    sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
    sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
    sd[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5
    sd[f"{prefix}.num_batches_tracked"] = np.int64(7)


def _conv(sd, key, co, ci, dims=2, bias=False):
    rng = np.random.RandomState(hash(key) % 2**31)
    shape = (co, ci) + (1,) * dims
    sd[f"{key}.weight"] = (rng.randn(*shape) * 0.1).astype(np.float32)
    if bias:
        sd[f"{key}.bias"] = rng.randn(co).astype(np.float32)


def _linear(sd, key, co, ci, bias=True):
    rng = np.random.RandomState(hash(key) % 2**31)
    sd[f"{key}.weight"] = (rng.randn(co, ci) * 0.1).astype(np.float32)
    if bias:
        sd[f"{key}.bias"] = rng.randn(co).astype(np.float32)


def _tree_sig(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return sorted(
        (jax.tree_util.keystr(p), tuple(np.shape(v))) for p, v in flat
    )


def _check(variables, model, *example_args):
    init = model.init({"params": jax.random.PRNGKey(0)}, *example_args,
                      train=False)
    assert _tree_sig(variables["params"]) == _tree_sig(init["params"])
    assert _tree_sig(variables["batch_stats"]) == _tree_sig(init["batch_stats"])
    # and the model actually runs with the converted variables
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        *example_args, train=False,
    )
    assert np.isfinite(np.asarray(out)).all()


def test_convert_dgcnn_cls_structure():
    """Synthesized upstream DGCNN_cls state dict (the model.cls.1024.t7
    layout) converts to exactly DGCNNCls' tree."""
    sd = {}
    _conv(sd, "conv1.0", 64, 6); _bn(sd, "conv1.1", 64)
    _conv(sd, "conv2.0", 64, 128); _bn(sd, "conv2.1", 64)
    _conv(sd, "conv3.0", 128, 128); _bn(sd, "conv3.1", 128)
    _conv(sd, "conv4.0", 256, 256); _bn(sd, "conv4.1", 256)
    _conv(sd, "conv5.0", 32, 512, dims=1); _bn(sd, "conv5.1", 32)
    _linear(sd, "linear1", 512, 64, bias=False); _bn(sd, "bn6", 512)
    _linear(sd, "linear2", 256, 512); _bn(sd, "bn7", 256)
    _linear(sd, "linear3", 40, 256)
    variables = convert_dgcnn_cls(sd)
    x = jnp.zeros((2, 32, 3))
    _check(variables, DGCNNCls(emb_dims=32, k=4, output_channels=40), x)


def test_convert_pointnet_structure():
    sd = {}
    for i, (ci, co) in enumerate(
        [(3, 64), (64, 64), (64, 64), (64, 128), (128, 32)], start=1
    ):
        _conv(sd, f"conv{i}", co, ci, dims=1)
        _bn(sd, f"bn{i}", co)
    _linear(sd, "linear1", 512, 32, bias=False); _bn(sd, "bn6", 512)
    _linear(sd, "linear2", 40, 512)
    variables = convert_pointnet(sd)
    x = jnp.zeros((2, 32, 3))
    _check(variables, PointNet(emb_dims=32, output_channels=40), x)


def test_convert_dgcnn_semseg_structure():
    sd = {}
    _conv(sd, "conv1.0", 64, 18); _bn(sd, "conv1.1", 64)
    _conv(sd, "conv2.0", 64, 64); _bn(sd, "conv2.1", 64)
    _conv(sd, "conv3.0", 64, 128); _bn(sd, "conv3.1", 64)
    _conv(sd, "conv4.0", 64, 64); _bn(sd, "conv4.1", 64)
    _conv(sd, "conv5.0", 64, 128); _bn(sd, "conv5.1", 64)
    _conv(sd, "conv6.0", 32, 192, dims=1); _bn(sd, "conv6.1", 32)
    _conv(sd, "conv7.0", 512, 224, dims=1); _bn(sd, "conv7.1", 512)
    _conv(sd, "conv8.0", 256, 512, dims=1); _bn(sd, "conv8.1", 256)
    _conv(sd, "conv9", 13, 256, dims=1)
    variables = convert_dgcnn_semseg(sd)
    x = jnp.zeros((2, 32, 9))
    _check(variables, DGCNNSemSeg(emb_dims=32, k=4), x)


def test_convert_dgcnn_partseg_structure():
    sd = {}
    # transform_net trunk
    _conv(sd, "transform_net.conv1.0", 64, 6); _bn(sd, "transform_net.conv1.1", 64)
    _conv(sd, "transform_net.conv2.0", 128, 64); _bn(sd, "transform_net.conv2.1", 128)
    _conv(sd, "transform_net.conv3.0", 1024, 128, dims=1)
    _bn(sd, "transform_net.conv3.1", 1024)
    _linear(sd, "transform_net.linear.0", 512, 1024, bias=False)
    _bn(sd, "transform_net.linear.1", 512)
    _linear(sd, "transform_net.linear.3", 256, 512, bias=False)
    _bn(sd, "transform_net.linear.4", 256)
    _linear(sd, "transform_net.transform", 9, 256)
    _conv(sd, "conv1.0", 64, 6); _bn(sd, "conv1.1", 64)
    _conv(sd, "conv2.0", 64, 64); _bn(sd, "conv2.1", 64)
    _conv(sd, "conv3.0", 64, 128); _bn(sd, "conv3.1", 64)
    _conv(sd, "conv4.0", 64, 64); _bn(sd, "conv4.1", 64)
    _conv(sd, "conv5.0", 64, 128); _bn(sd, "conv5.1", 64)
    _conv(sd, "conv6.0", 32, 192, dims=1); _bn(sd, "conv6.1", 32)
    _conv(sd, "conv7.0", 64, 16, dims=1); _bn(sd, "conv7.1", 64)
    _conv(sd, "conv8.0", 256, 32 + 64 + 192, dims=1); _bn(sd, "conv8.1", 256)
    _conv(sd, "conv9.0", 256, 256, dims=1); _bn(sd, "conv9.1", 256)
    _conv(sd, "conv10.0", 128, 256, dims=1); _bn(sd, "conv10.1", 128)
    _conv(sd, "conv11", 50, 128, dims=1)
    variables = convert_dgcnn_partseg(sd)
    x = jnp.zeros((2, 32, 3))
    lbl = jnp.zeros((2, 16))
    _check(variables, DGCNNPartSeg(emb_dims=32, k=4, seg_num_all=50), x, lbl)