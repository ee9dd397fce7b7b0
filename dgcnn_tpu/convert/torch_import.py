"""Torch checkpoint -> JAX parameter conversion (SURVEY.md §5 checkpoint;
§7 layer 7).

The reference ships three checkpoint shapes (SURVEY.md §5):
  (a) bare ``state_dict`` saved from a ``DataParallel`` model (``module.``
      prefixes) — main_cls.py:152, main_semseg.py:277;
  (b) bare ``state_dict`` of the unwrapped ``Net`` — main_partseg.py:167;
  (c) dict checkpoints ``{epoch, model_state_dict, optimizer_state_dict,
      scheduler_state_dict, loss}`` — main_partseg_dist.py:364-380.

Transforms: Conv{1,2}d k=1 weights (Co, Ci, 1[,1]) -> Dense kernels (Ci, Co);
EdgeConv Conv2d weights (Co, 2C, 1, 1) split into w_nbr/w_ctr halves (concat
order [neighbour, centre], reference models/dgcnn.py:42); Linear (Co, Ci) ->
kernel transpose; BatchNorm weight/bias -> scale/bias and running stats ->
the ``batch_stats`` collection.  No torch import is needed unless reading a
torch-serialized file.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


Array = np.ndarray
SD = Mapping[str, Array]


def load_torch_checkpoint(path: str) -> Dict[str, Array]:
    """Read any of the three reference checkpoint formats into a flat
    name -> numpy dict (format (c) returns its model_state_dict)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def strip_prefix(sd: SD, prefix: str = "module.") -> Dict[str, Array]:
    """Remove DataParallel/DDP ``module.`` prefixes."""
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v for k, v in sd.items()
    }


# ---------------------------------------------------------------- primitives


def _conv_kernel(w: Array) -> Array:
    """(Co, Ci, 1[,1]) or (Co, Ci) -> (Ci, Co)."""
    w = np.asarray(w)
    w = w.reshape(w.shape[0], w.shape[1])
    return np.ascontiguousarray(w.T)


def _dense(sd: SD, prefix: str, bias: bool = True) -> Dict[str, Array]:
    out = {"kernel": _conv_kernel(sd[prefix + ".weight"])}
    if bias and prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _bn(sd: SD, prefix: str) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    params = {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }
    stats = {
        "mean": np.asarray(sd[prefix + ".running_mean"]),
        "var": np.asarray(sd[prefix + ".running_var"]),
    }
    return params, stats


def _convbn(sd: SD, conv_key: str, bn_key: str) -> Tuple[dict, dict]:
    """-> (params, batch_stats) for a ConvBN module."""
    bn_p, bn_s = _bn(sd, bn_key)
    return {"conv": _dense(sd, conv_key, bias=False), "bn": bn_p}, {"bn": bn_s}


def _densebn(sd: SD, lin_key: str, bn_key: str) -> Tuple[dict, dict]:
    bn_p, bn_s = _bn(sd, bn_key)
    return {"linear": _dense(sd, lin_key, bias=False), "bn": bn_p}, {"bn": bn_s}


def _edgeconv(sd: SD, conv_key: str, bn_key: str) -> Tuple[dict, dict]:
    """Split the (Co, 2C, 1, 1) edge conv weight into neighbour/centre halves
    and fold the BN into EdgeConv's flat parameter layout."""
    w = np.asarray(sd[conv_key + ".weight"])
    w = w.reshape(w.shape[0], w.shape[1])          # (Co, 2C)
    c = w.shape[1] // 2
    bn_p, bn_s = _bn(sd, bn_key)
    params = {
        "w_nbr": np.ascontiguousarray(w[:, :c].T),
        "w_ctr": np.ascontiguousarray(w[:, c:].T),
        "scale": bn_p["scale"],
        "bias": bn_p["bias"],
    }
    return params, bn_s


def _join(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def _mha(sd: SD, prefix: str) -> dict:
    """torch.nn.MultiheadAttention -> TorchMultiheadAttention params."""
    return {
        "in_proj_weight": np.asarray(sd[_join(prefix, "in_proj_weight")]),
        "in_proj_bias": np.asarray(sd[_join(prefix, "in_proj_bias")]),
        "out_proj": _dense(sd, _join(prefix, "out_proj")),
    }


def _ln(sd: SD, prefix: str) -> dict:
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


# ------------------------------------------------------------------- models


def convert_dgcnn_backbone(sd: SD, prefix: str = "") -> Tuple[dict, dict]:
    """Fork DGCNN backbone (reference models/dgcnn.py:47-103): conv1..conv4
    are EdgeConvs (Sequential[Conv2d, BN, LeakyReLU]), conv5 a ConvBN."""
    params, stats = {}, {}
    for name in ["conv1", "conv2", "conv3", "conv4"]:
        p, s = _edgeconv(sd, f"{prefix}{name}.0", f"{prefix}{name}.1")
        params[name], stats[name] = p, s
    p, s = _convbn(sd, f"{prefix}conv5.0", f"{prefix}conv5.1")
    params["conv5"], stats["conv5"] = p, s
    return params, stats


def convert_transform_net(sd: SD, prefix: str = "") -> Tuple[dict, dict]:
    """TransformNet / PositionEmbedding trunk (reference models/layers.py:8-39).
    Note the reference registers the BNs both standalone (bn1..bn3) and inside
    the Sequentials; we read the Sequential paths (conv1.1 etc.)."""
    params, stats = {}, {}
    for name, conv_key, bn_key in [
        ("conv1", f"{prefix}conv1.0", f"{prefix}conv1.1"),
        ("conv2", f"{prefix}conv2.0", f"{prefix}conv2.1"),
        ("conv3", f"{prefix}conv3.0", f"{prefix}conv3.1"),
    ]:
        p, s = _convbn(sd, conv_key, bn_key)
        params[name], stats[name] = p, s
    for name, lin_key, bn_key in [
        ("linear1", f"{prefix}linear.0", f"{prefix}linear.1"),
        ("linear2", f"{prefix}linear.3", f"{prefix}linear.4"),
    ]:
        p, s = _densebn(sd, lin_key, bn_key)
        params[name], stats[name] = p, s
    params["transform"] = _dense(sd, f"{prefix}transform")
    return params, stats


def convert_position_embedding(sd: SD, prefix: str = "") -> Tuple[dict, dict]:
    p, s = convert_transform_net(sd, prefix)
    return {"tnet": p}, {"tnet": s}


def convert_torch_mha(sd: SD, prefix: str) -> dict:
    return _mha(sd, prefix)


def convert_torch_transformer(
    sd: SD, prefix: str, n_enc: int, n_dec: int
) -> Tuple[dict, dict]:
    """torch.nn.Transformer -> TorchTransformer params (no batch stats)."""
    params: Dict[str, Any] = {}
    for i in range(n_enc):
        lp = f"{prefix}encoder.layers.{i}"
        params[f"encoder_layer_{i}"] = {
            "self_attn": _mha(sd, f"{lp}.self_attn"),
            "ff": {
                "linear1": _dense(sd, f"{lp}.linear1"),
                "linear2": _dense(sd, f"{lp}.linear2"),
            },
            "norm1": _ln(sd, f"{lp}.norm1"),
            "norm2": _ln(sd, f"{lp}.norm2"),
        }
    for i in range(n_dec):
        lp = f"{prefix}decoder.layers.{i}"
        params[f"decoder_layer_{i}"] = {
            "self_attn": _mha(sd, f"{lp}.self_attn"),
            "multihead_attn": _mha(sd, f"{lp}.multihead_attn"),
            "ff": {
                "linear1": _dense(sd, f"{lp}.linear1"),
                "linear2": _dense(sd, f"{lp}.linear2"),
            },
            "norm1": _ln(sd, f"{lp}.norm1"),
            "norm2": _ln(sd, f"{lp}.norm2"),
            "norm3": _ln(sd, f"{lp}.norm3"),
        }
    params["encoder_norm"] = _ln(sd, f"{prefix}encoder.norm")
    params["decoder_norm"] = _ln(sd, f"{prefix}decoder.norm")
    return params, {}


def convert_mlp_head(sd: SD, prefix: str = "head.") -> Tuple[dict, dict]:
    """MLPHead (reference models/model_partseg.py:95-139): Sequential indices
    nn.{0,1} nn.{4,5} nn.{8,9} nn.12 + label_conv.{0,1}."""
    params, stats = {}, {}
    for name, ci, bi in [("fc1", 0, 1), ("fc2", 4, 5), ("fc3", 8, 9)]:
        p, s = _convbn(sd, f"{prefix}nn.{ci}", f"{prefix}nn.{bi}")
        params[name], stats[name] = p, s
    params["fc4"] = _dense(sd, f"{prefix}nn.12")
    p, s = _convbn(sd, f"{prefix}label_conv.0", f"{prefix}label_conv.1")
    params["label_conv"], stats["label_conv"] = p, s
    return params, stats


def convert_net(sd: SD, n_blocks: int) -> Dict[str, dict]:
    """Full fusion Net (reference models/model_partseg.py:142-194)."""
    sd = strip_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["emb_nn"], stats["emb_nn"] = convert_dgcnn_backbone(sd, "emb_nn.")

    ge_p, ge_s = {}, {}
    for j, (ci, bi) in enumerate([(0, 1), (3, 4), (6, 7), (9, 10)]):
        p, s = _convbn(sd, f"grads_emb.{ci}", f"grads_emb.{bi}")
        ge_p[f"grads_emb_{j}"], ge_s[f"grads_emb_{j}"] = p, s
    params.update(ge_p)
    stats.update(ge_s)

    pe_p, pe_s = convert_position_embedding(sd, "pos_mlp.0.")
    params["pos_embed"], stats["pos_embed"] = pe_p, pe_s
    p, s = _convbn(sd, "pos_mlp.1", "pos_mlp.2")
    params["pos_conv"], stats["pos_conv"] = p, s

    tr_p, _ = convert_torch_transformer(sd, "transformer.", n_blocks, n_blocks)
    params["transformer"] = tr_p
    params["attention"] = _mha(sd, "attention")

    params["head"], stats["head"] = convert_mlp_head(sd, "head.")
    return {"params": params, "batch_stats": stats}


def convert_dgcnn_cls(sd: SD) -> Dict[str, dict]:
    """Canonical DGCNN_cls checkpoint (e.g. pretrained model.cls.1024.t7)."""
    sd = strip_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    # upstream names its BNs standalone (bn1..bn5) and also nests them in the
    # conv Sequentials; Sequential paths are conv{i}.1
    for name in ["conv1", "conv2", "conv3", "conv4"]:
        p, s = _edgeconv(sd, f"{name}.0", f"{name}.1")
        params[name], stats[name] = p, s
    p, s = _convbn(sd, "conv5.0", "conv5.1")
    params["conv5"], stats["conv5"] = p, s
    p, s = _densebn(sd, "linear1", "bn6")
    params["linear1"], stats["linear1"] = p, s
    params["linear2"] = _dense(sd, "linear2")
    bn7_p, bn7_s = _bn(sd, "bn7")
    params["bn7"], stats["bn7"] = bn7_p, bn7_s
    params["linear3"] = _dense(sd, "linear3")
    return {"params": params, "batch_stats": stats}


def convert_pointnet(sd: SD) -> Dict[str, dict]:
    sd = strip_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(1, 6):
        params[f"conv{i}"] = _dense(sd, f"conv{i}", bias=False)
        p, s = _bn(sd, f"bn{i}")
        params[f"bn{i}"], stats[f"bn{i}"] = p, s
    params["linear1"] = _dense(sd, "linear1", bias=False)
    p, s = _bn(sd, "bn6")
    params["bn6"], stats["bn6"] = p, s
    params["linear2"] = _dense(sd, "linear2")
    return {"params": params, "batch_stats": stats}


def convert_dgcnn_partseg(sd: SD) -> Dict[str, dict]:
    """Canonical DGCNN_partseg (pretrained model.partseg.t7 family)."""
    sd = strip_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    tp, ts = convert_transform_net(sd, "transform_net.")
    params["transform_net"], stats["transform_net"] = tp, ts
    p, s = _edgeconv(sd, "conv1.0", "conv1.1")
    params["conv1"], stats["conv1"] = p, s
    p, s = _convbn(sd, "conv2.0", "conv2.1")
    params["conv2"], stats["conv2"] = p, s
    p, s = _edgeconv(sd, "conv3.0", "conv3.1")
    params["conv3"], stats["conv3"] = p, s
    p, s = _convbn(sd, "conv4.0", "conv4.1")
    params["conv4"], stats["conv4"] = p, s
    p, s = _edgeconv(sd, "conv5.0", "conv5.1")
    params["conv5"], stats["conv5"] = p, s
    p, s = _convbn(sd, "conv6.0", "conv6.1")
    params["conv6"], stats["conv6"] = p, s
    p, s = _convbn(sd, "conv7.0", "conv7.1")
    params["conv7"], stats["conv7"] = p, s
    p, s = _convbn(sd, "conv8.0", "conv8.1")
    params["conv8"], stats["conv8"] = p, s
    p, s = _convbn(sd, "conv9.0", "conv9.1")
    params["conv9"], stats["conv9"] = p, s
    p, s = _convbn(sd, "conv10.0", "conv10.1")
    params["conv10"], stats["conv10"] = p, s
    params["conv11"] = _dense(sd, "conv11", bias=False)
    return {"params": params, "batch_stats": stats}


def convert_dgcnn_semseg(sd: SD) -> Dict[str, dict]:
    """Canonical DGCNN_semseg (pretrained model_<area>.t7 family)."""
    sd = strip_prefix(dict(sd))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    p, s = _edgeconv(sd, "conv1.0", "conv1.1")
    params["conv1"], stats["conv1"] = p, s
    p, s = _convbn(sd, "conv2.0", "conv2.1")
    params["conv2"], stats["conv2"] = p, s
    p, s = _edgeconv(sd, "conv3.0", "conv3.1")
    params["conv3"], stats["conv3"] = p, s
    p, s = _convbn(sd, "conv4.0", "conv4.1")
    params["conv4"], stats["conv4"] = p, s
    p, s = _edgeconv(sd, "conv5.0", "conv5.1")
    params["conv5"], stats["conv5"] = p, s
    p, s = _convbn(sd, "conv6.0", "conv6.1")
    params["conv6"], stats["conv6"] = p, s
    p, s = _convbn(sd, "conv7.0", "conv7.1")
    params["conv7"], stats["conv7"] = p, s
    p, s = _convbn(sd, "conv8.0", "conv8.1")
    params["conv8"], stats["conv8"] = p, s
    params["conv9"] = _dense(sd, "conv9", bias=False)
    return {"params": params, "batch_stats": stats}
