"""JAX parameters -> torch checkpoint conversion (the inverse of
torch_import): train or fine-tune here, hand the weights back to the torch
ecosystem.

Each ``export_*`` mirrors the corresponding ``convert_*`` importer exactly
(same key layout, inverse tensor transforms: Dense kernels (Ci, Co) ->
Conv{1,2}d weights (Co, Ci, 1[,1]); EdgeConv w_nbr/w_ctr halves re-concat
to the (Co, 2C, 1, 1) edge conv in the reference's [neighbour, centre]
order, models/dgcnn.py:42; BN scale/bias + batch_stats -> weight/bias +
running stats with a fresh ``num_batches_tracked``).  Round-tripping
through the importer reproduces the flax tree bit-for-bit
(tests/test_convert_roundtrip.py); the fork-model exports strict-load
into the actual reference modules.

Note on the (absent) canonical AnTao97 models: upstream registers several
BatchNorms TWICE — standalone attributes (``bn1``..) aliased inside the
conv Sequentials — so its state dicts carry duplicate keys over shared
storage.  These exports emit the Sequential paths (the ones the importers
read); load them with ``strict=False`` — the shared storage means the
alias entries update along with their Sequential twins.  The fork's own
``PositionEmbedding`` aliases bn1-3 the same way; those duplicates ARE
emitted so ``Net``/``PositionEmbedding`` exports strict-load.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

Array = np.ndarray


def save_torch_checkpoint(path: str, sd: Dict[str, Array]) -> None:
    """Write an exported state dict as a torch-loadable checkpoint."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)).clone()
                for k, v in sd.items()}, path)


# ---------------------------------------------------------------- primitives


def _w(kernel: Array, dims: int) -> Array:
    """(Ci, Co) Dense kernel -> torch Linear (Co, Ci) / Conv1d (Co, Ci, 1)
    / Conv2d (Co, Ci, 1, 1) weight."""
    w = np.ascontiguousarray(np.asarray(kernel).T)
    return w.reshape(w.shape + (1,) * dims)


def _put_dense(sd, prefix: str, tree: dict, dims: int = 0) -> None:
    sd[prefix + ".weight"] = _w(tree["kernel"], dims)
    if "bias" in tree:
        sd[prefix + ".bias"] = np.asarray(tree["bias"])


def _put_bn(sd, prefix: str, params: dict, stats: dict) -> None:
    sd[prefix + ".weight"] = np.asarray(params["scale"])
    sd[prefix + ".bias"] = np.asarray(params["bias"])
    sd[prefix + ".running_mean"] = np.asarray(stats["mean"])
    sd[prefix + ".running_var"] = np.asarray(stats["var"])
    sd[prefix + ".num_batches_tracked"] = np.int64(0)


def _put_convbn(sd, conv_key: str, bn_key: str, p: dict, s: dict,
                dims: int) -> None:
    _put_dense(sd, conv_key, p["conv"], dims)
    _put_bn(sd, bn_key, p["bn"], s["bn"])


def _put_densebn(sd, lin_key: str, bn_key: str, p: dict, s: dict) -> None:
    _put_dense(sd, lin_key, p["linear"])
    _put_bn(sd, bn_key, p["bn"], s["bn"])


def _put_edgeconv(sd, conv_key: str, bn_key: str, p: dict, s: dict) -> None:
    w = np.concatenate([np.asarray(p["w_nbr"]).T, np.asarray(p["w_ctr"]).T],
                       axis=1)                       # (Co, 2C)
    sd[conv_key + ".weight"] = w.reshape(w.shape + (1, 1))
    _put_bn(sd, bn_key, {"scale": p["scale"], "bias": p["bias"]}, s)


def _put_mha(sd, prefix: str, p: dict) -> None:
    sd[prefix + ".in_proj_weight"] = np.asarray(p["in_proj_weight"])
    sd[prefix + ".in_proj_bias"] = np.asarray(p["in_proj_bias"])
    _put_dense(sd, prefix + ".out_proj", p["out_proj"])


def _put_ln(sd, prefix: str, p: dict) -> None:
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _alias(sd, src_prefix: str, dst_prefix: str) -> None:
    """Duplicate one BN's entries under an upstream alias name."""
    for suffix in (".weight", ".bias", ".running_mean", ".running_var",
                   ".num_batches_tracked"):
        sd[dst_prefix + suffix] = sd[src_prefix + suffix]


# ------------------------------------------------------------------- models


def export_dgcnn_backbone(params: dict, stats: dict,
                          prefix: str = "") -> Dict[str, Array]:
    """Fork DGCNN backbone -> reference models/dgcnn.py:47-78 state dict
    (strict-loadable into ``models.dgcnn.DGCNN``)."""
    sd: Dict[str, Array] = {}
    for name in ["conv1", "conv2", "conv3", "conv4"]:
        _put_edgeconv(sd, f"{prefix}{name}.0", f"{prefix}{name}.1",
                      params[name], stats[name])
    _put_convbn(sd, f"{prefix}conv5.0", f"{prefix}conv5.1",
                params["conv5"], stats["conv5"], dims=2)
    return sd


def export_transform_net(params: dict, stats: dict,
                         prefix: str = "") -> Dict[str, Array]:
    """PositionEmbedding trunk -> reference models/layers.py:8-39 layout,
    including the bn1-3 standalone aliases layers.py registers."""
    sd: Dict[str, Array] = {}
    for i, (name, dims) in enumerate(
            [("conv1", 2), ("conv2", 2), ("conv3", 1)], start=1):
        _put_convbn(sd, f"{prefix}{name}.0", f"{prefix}{name}.1",
                    params[name], stats[name], dims)
        _alias(sd, f"{prefix}{name}.1", f"{prefix}bn{i}")
    _put_densebn(sd, f"{prefix}linear.0", f"{prefix}linear.1",
                 params["linear1"], stats["linear1"])
    _put_densebn(sd, f"{prefix}linear.3", f"{prefix}linear.4",
                 params["linear2"], stats["linear2"])
    _put_dense(sd, f"{prefix}transform", params["transform"])
    return sd


def export_position_embedding(params: dict, stats: dict,
                              prefix: str = "") -> Dict[str, Array]:
    return export_transform_net(params["tnet"], stats["tnet"], prefix)


def export_torch_transformer(params: dict, prefix: str, n_enc: int,
                             n_dec: int) -> Dict[str, Array]:
    """TorchTransformer params -> torch.nn.Transformer state dict."""
    sd: Dict[str, Array] = {}
    for i in range(n_enc):
        lp, p = f"{prefix}encoder.layers.{i}", params[f"encoder_layer_{i}"]
        _put_mha(sd, f"{lp}.self_attn", p["self_attn"])
        _put_dense(sd, f"{lp}.linear1", p["ff"]["linear1"])
        _put_dense(sd, f"{lp}.linear2", p["ff"]["linear2"])
        _put_ln(sd, f"{lp}.norm1", p["norm1"])
        _put_ln(sd, f"{lp}.norm2", p["norm2"])
    for i in range(n_dec):
        lp, p = f"{prefix}decoder.layers.{i}", params[f"decoder_layer_{i}"]
        _put_mha(sd, f"{lp}.self_attn", p["self_attn"])
        _put_mha(sd, f"{lp}.multihead_attn", p["multihead_attn"])
        _put_dense(sd, f"{lp}.linear1", p["ff"]["linear1"])
        _put_dense(sd, f"{lp}.linear2", p["ff"]["linear2"])
        _put_ln(sd, f"{lp}.norm1", p["norm1"])
        _put_ln(sd, f"{lp}.norm2", p["norm2"])
        _put_ln(sd, f"{lp}.norm3", p["norm3"])
    _put_ln(sd, f"{prefix}encoder.norm", params["encoder_norm"])
    _put_ln(sd, f"{prefix}decoder.norm", params["decoder_norm"])
    return sd


def export_mlp_head(params: dict, stats: dict,
                    prefix: str = "head.") -> Dict[str, Array]:
    sd: Dict[str, Array] = {}
    for name, ci, bi in [("fc1", 0, 1), ("fc2", 4, 5), ("fc3", 8, 9)]:
        _put_convbn(sd, f"{prefix}nn.{ci}", f"{prefix}nn.{bi}",
                    params[name], stats[name], dims=1)
    _put_dense(sd, f"{prefix}nn.12", params["fc4"], dims=1)
    _put_convbn(sd, f"{prefix}label_conv.0", f"{prefix}label_conv.1",
                params["label_conv"], stats["label_conv"], dims=1)
    return sd


def export_net(variables: Dict[str, dict], n_blocks: int) -> Dict[str, Array]:
    """Full fusion Net -> reference models/model_partseg.py:142-194 state
    dict, strict-loadable into the reference ``Net``."""
    params, stats = variables["params"], variables["batch_stats"]
    sd = export_dgcnn_backbone(params["emb_nn"], stats["emb_nn"], "emb_nn.")
    for j, (ci, bi) in enumerate([(0, 1), (3, 4), (6, 7), (9, 10)]):
        _put_convbn(sd, f"grads_emb.{ci}", f"grads_emb.{bi}",
                    params[f"grads_emb_{j}"], stats[f"grads_emb_{j}"], dims=1)
    sd.update(export_position_embedding(
        params["pos_embed"], stats["pos_embed"], "pos_mlp.0."))
    _put_convbn(sd, "pos_mlp.1", "pos_mlp.2",
                params["pos_conv"], stats["pos_conv"], dims=1)
    sd.update(export_torch_transformer(
        params["transformer"], "transformer.", n_blocks, n_blocks))
    _put_mha(sd, "attention", params["attention"])
    sd.update(export_mlp_head(params["head"], stats["head"], "head."))
    return sd


def export_dgcnn_cls(variables: Dict[str, dict]) -> Dict[str, Array]:
    """Canonical DGCNN_cls -> the model.cls.1024.t7 layout (inverse of
    convert_dgcnn_cls; upstream's bn1-5 aliases omitted — see module
    docstring)."""
    params, stats = variables["params"], variables["batch_stats"]
    sd: Dict[str, Array] = {}
    for name in ["conv1", "conv2", "conv3", "conv4"]:
        _put_edgeconv(sd, f"{name}.0", f"{name}.1", params[name], stats[name])
    _put_convbn(sd, "conv5.0", "conv5.1", params["conv5"], stats["conv5"],
                dims=1)
    _put_densebn(sd, "linear1", "bn6", params["linear1"], stats["linear1"])
    _put_dense(sd, "linear2", params["linear2"])
    _put_bn(sd, "bn7", params["bn7"], stats["bn7"])
    _put_dense(sd, "linear3", params["linear3"])
    return sd


def export_pointnet(variables: Dict[str, dict]) -> Dict[str, Array]:
    params, stats = variables["params"], variables["batch_stats"]
    sd: Dict[str, Array] = {}
    for i in range(1, 6):
        _put_dense(sd, f"conv{i}", params[f"conv{i}"], dims=1)
        _put_bn(sd, f"bn{i}", params[f"bn{i}"], stats[f"bn{i}"])
    _put_dense(sd, "linear1", params["linear1"])
    _put_bn(sd, "bn6", params["bn6"], stats["bn6"])
    _put_dense(sd, "linear2", params["linear2"])
    return sd


def export_dgcnn_partseg(variables: Dict[str, dict]) -> Dict[str, Array]:
    params, stats = variables["params"], variables["batch_stats"]
    sd = export_transform_net(params["transform_net"], stats["transform_net"],
                              "transform_net.")
    for name in ["conv1", "conv3", "conv5"]:
        _put_edgeconv(sd, f"{name}.0", f"{name}.1", params[name], stats[name])
    for name, dims in [("conv2", 2), ("conv4", 2), ("conv6", 1), ("conv7", 1),
                       ("conv8", 1), ("conv9", 1), ("conv10", 1)]:
        _put_convbn(sd, f"{name}.0", f"{name}.1", params[name], stats[name],
                    dims)
    _put_dense(sd, "conv11", params["conv11"], dims=1)
    return sd


def export_dgcnn_semseg(variables: Dict[str, dict]) -> Dict[str, Array]:
    params, stats = variables["params"], variables["batch_stats"]
    sd: Dict[str, Array] = {}
    for name in ["conv1", "conv3", "conv5"]:
        _put_edgeconv(sd, f"{name}.0", f"{name}.1", params[name], stats[name])
    for name, dims in [("conv2", 2), ("conv4", 2), ("conv6", 1), ("conv7", 1),
                       ("conv8", 1)]:
        _put_convbn(sd, f"{name}.0", f"{name}.1", params[name], stats[name],
                    dims)
    _put_dense(sd, "conv9", params["conv9"], dims=1)
    return sd
