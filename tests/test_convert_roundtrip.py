"""Reverse conversion (JAX -> torch, convert/torch_export.py): exported
state dicts must round-trip bit-for-bit through the importers, and the
fork-model exports must strict-load into the ACTUAL reference modules and
reproduce our outputs — train here, deploy back to torch."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import requires_reference


class _Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _leaves(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat}


def _assert_tree_equal(got, want):
    g, w = _leaves(got), _leaves(want)
    assert sorted(g) == sorted(w)
    for k in g:
        np.testing.assert_array_equal(g[k], w[k], err_msg=k)


def test_roundtrip_canonical_models():
    """export_* -> convert_* reproduces the flax variables exactly for all
    four canonical model families."""
    from dgcnn_tpu.convert import (
        convert_dgcnn_cls,
        convert_dgcnn_partseg,
        convert_dgcnn_semseg,
        convert_pointnet,
        export_dgcnn_cls,
        export_dgcnn_partseg,
        export_dgcnn_semseg,
        export_pointnet,
    )
    from dgcnn_tpu.models import DGCNNCls, DGCNNPartSeg, DGCNNSemSeg, PointNet

    x3 = jnp.zeros((2, 32, 3))
    x9 = jnp.zeros((2, 32, 9))
    lbl = jnp.zeros((2, 16))
    cases = [
        (DGCNNCls(emb_dims=32, k=4, output_channels=40),
         export_dgcnn_cls, convert_dgcnn_cls, (x3,)),
        (PointNet(emb_dims=32, output_channels=40),
         export_pointnet, convert_pointnet, (x3,)),
        (DGCNNSemSeg(emb_dims=32, k=4),
         export_dgcnn_semseg, convert_dgcnn_semseg, (x9,)),
        (DGCNNPartSeg(emb_dims=32, k=4, seg_num_all=50),
         export_dgcnn_partseg, convert_dgcnn_partseg, (x3, lbl)),
    ]
    for model, export, convert, args in cases:
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, *args, train=False)
        sd = export({"params": variables["params"],
                     "batch_stats": variables["batch_stats"]})
        back = convert(sd)
        _assert_tree_equal(back["params"], variables["params"])
        _assert_tree_equal(back["batch_stats"], variables["batch_stats"])


def test_roundtrip_fusion_net():
    from dgcnn_tpu.convert import convert_net, export_net
    from dgcnn_tpu.models import Net

    model = Net(emb_dim=32, k=4, n_heads=2, n_blocks=1, ff_dims=16,
                d_qkv=8, nclasses=50, dropout=0.0)
    pts = jnp.zeros((2, 32, 3))
    lbl = jnp.zeros((2, 16))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pts, lbl, train=False)
    sd = export_net({"params": variables["params"],
                     "batch_stats": variables["batch_stats"]}, n_blocks=1)
    back = convert_net(sd, n_blocks=1)
    _assert_tree_equal(back["params"], variables["params"])
    _assert_tree_equal(back["batch_stats"], variables["batch_stats"])


def test_convert_cli_both_directions(tmp_path):
    """python -m dgcnn_tpu.convert.cli round-trips msgpack -> torch ->
    msgpack through the --to_torch flag."""
    from dgcnn_tpu.convert.cli import main
    from dgcnn_tpu.models import DGCNNCls
    from dgcnn_tpu.train.checkpoint import load_model, save_model

    model = DGCNNCls(emb_dims=32, k=4, output_channels=40)
    variables = model.init({"params": jax.random.PRNGKey(7)},
                           jnp.zeros((2, 32, 3)), train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    src = str(tmp_path / "m.msgpack")
    save_model(src, variables)
    pt = str(tmp_path / "m.t7")
    main([src, pt, "--model", "dgcnn_cls", "--to_torch"])
    back = str(tmp_path / "back.msgpack")
    main([pt, back, "--model", "dgcnn_cls"])
    restored = load_model(back)
    _assert_tree_equal(restored["params"], variables["params"])
    _assert_tree_equal(restored["batch_stats"], variables["batch_stats"])


@requires_reference
def test_backbone_export_strict_loads_into_reference():
    """A JAX-trained DGCNN backbone strict-loads into the reference torch
    module and reproduces our outputs — the deploy-back path."""
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    from models.dgcnn import DGCNN as RefDGCNN

    from dgcnn_tpu.convert import export_dgcnn_backbone
    from dgcnn_tpu.models import DGCNN

    model = DGCNN(emb_dims=32, k=6)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 3).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(2)},
                           jnp.asarray(x), train=False)
    sd = export_dgcnn_backbone(variables["params"], variables["batch_stats"])

    ref = RefDGCNN(_Args(emb_dim=32, k=6))
    ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=True)
    ref.eval()
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    with jax.default_matmul_precision("float32"):
        got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=2e-4)


@requires_reference
def test_net_export_strict_loads_into_reference(monkeypatch, tmp_path):
    """The full fusion Net export strict-loads into the reference Net and,
    with its hardcoded .cuda() defeated, reproduces our forward; the torch
    checkpoint file round-trips through save/load too.

    The HOG op is stubbed with ONE shared tensor on both sides: its LAPACK
    eigenvector signs are not reproducible (documented up-to-sign parity,
    tests/test_ops_hog.py masks for it), and flax-random weights — unlike
    the torch-init weights of test_net_full_parity, whose untrained
    attention is nearly insensitive to the hog branch — amplify the sign
    flips past any honest tolerance.  Everything ELSE (backbone, grads_emb,
    pos_mlp, transformer, attention, head) runs for real with the exported
    weights."""
    import sys

    monkeypatch.setenv("DGCNN_TPU_PALLAS_EXACT", "1")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch

    from dgcnn_tpu.convert import (
        export_net,
        load_torch_checkpoint,
        save_torch_checkpoint,
    )
    from dgcnn_tpu.models import Net

    model = Net(emb_dim=32, k=6, n_heads=2, n_blocks=1, ff_dims=32,
                d_qkv=8, nclasses=50, dropout=0.0)
    rng = np.random.RandomState(3)
    x = rng.randn(2, 32, 3).astype(np.float32)
    lbl = np.eye(16, dtype=np.float32)[rng.randint(0, 16, 2)]
    hog_stub = rng.rand(2, 32, 18).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(4), "dropout": jax.random.PRNGKey(5)},
        jnp.asarray(x), jnp.asarray(lbl), train=False)
    sd = export_net({"params": variables["params"],
                     "batch_stats": variables["batch_stats"]}, n_blocks=1)

    # file roundtrip through torch serialization
    path = str(tmp_path / "net_export.pt")
    save_torch_checkpoint(path, sd)
    loaded = load_torch_checkpoint(path)
    assert sorted(loaded) == sorted(sd)

    import dgcnn_tpu.models.model_partseg as ours_mp

    monkeypatch.setattr(ours_mp, "compute_hog",
                        lambda *a, **kw: jnp.asarray(hog_stub))

    orig_cuda, orig_zeros = torch.Tensor.cuda, torch.zeros
    torch.Tensor.cuda = lambda self, *a, **kw: self

    def zeros_cpu(*a, **kw):
        dev = kw.get("device")
        if dev is not None and torch.device(dev).type == "cuda":
            kw["device"] = "cpu"
        return orig_zeros(*a, **kw)

    torch.zeros = zeros_cpu
    try:
        import models.model_partseg as ref_mp

        monkeypatch.setattr(ref_mp, "compute_hog_1x1",
                            lambda *a, **kw: torch.from_numpy(hog_stub))
        ref = ref_mp.Net(_Args(emb_dim=32, k=6, n_heads=2, n_blocks=1,
                               ff_dims=32, dropout=0.0, nclasses=50))
        ref.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in sd.items()}, strict=True)
        ref.eval()
        with torch.no_grad():
            want = ref(torch.from_numpy(x.transpose(0, 2, 1)),
                       torch.from_numpy(lbl)).numpy()
    finally:
        torch.Tensor.cuda, torch.zeros = orig_cuda, orig_zeros

    with jax.default_matmul_precision("float32"):
        got = np.asarray(model.apply(
            variables, jnp.asarray(x), jnp.asarray(lbl), train=False,
            rngs={"dropout": jax.random.PRNGKey(6)}))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=5e-4)