"""Converted-weights numerical parity vs the torch reference (eval mode).

These are the real correctness gates (SURVEY.md §7 hard-part 2): random torch
models' state dicts converted to flax must produce the same outputs.
All matmuls pinned to f32 via jax.default_matmul_precision for comparison.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import requires_reference


@pytest.fixture(autouse=True)
def _seed_torch():
    """torch seeds its default generator from OS entropy, so unseeded
    reference-module weights made these parity tests FLAKY near their
    tolerances (observed: test_net_full_parity marginally exceeding 5e-4
    on some process seeds).  Pin the draw."""
    import torch

    torch.manual_seed(0)

B, N, K, EMB = 2, 32, 6, 32


class _Args:
    """Mirror of the reference argparse namespace fields the models read."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _to_jax(sd):
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


@requires_reference
def test_dgcnn_backbone_parity():
    import sys
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    from models.dgcnn import DGCNN as RefDGCNN

    from dgcnn_tpu.convert import convert_dgcnn_backbone
    from dgcnn_tpu.models import DGCNN

    targs = _Args(emb_dim=EMB, k=K)
    ref = RefDGCNN(targs).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(B, 3, N).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()          # (B, EMB, N)

    params, stats = convert_dgcnn_backbone(_to_jax(ref.state_dict()))
    model = DGCNN(emb_dims=EMB, k=K)
    with jax.default_matmul_precision("float32"):
        got = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 1)), train=False,
        )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, atol=2e-4
    )


@requires_reference
def test_position_embedding_parity():
    import sys
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    from models.layers import PositionEmbedding as RefPE

    from dgcnn_tpu.convert import convert_position_embedding
    from dgcnn_tpu.models import PositionEmbedding

    targs = _Args(emb_dim=EMB, k=K)
    ref = RefPE(targs).eval()
    # randomize the transform layer so the test is not trivially identity
    torch.nn.init.normal_(ref.transform.weight, std=0.05)
    rng = np.random.RandomState(1)
    x = rng.randn(B, 3, N).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()          # (B, 3, N)

    params, stats = convert_position_embedding(_to_jax(ref.state_dict()))
    model = PositionEmbedding(k=K)
    with jax.default_matmul_precision("float32"):
        got = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 1)), train=False,
        )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, atol=2e-4
    )


@requires_reference
def test_torch_transformer_parity():
    import torch

    from dgcnn_tpu.convert import convert_torch_transformer
    from dgcnn_tpu.models import TorchTransformer

    d_model, nhead, nlayers, ff = EMB, 4, 2, 64
    ref = torch.nn.Transformer(
        d_model=d_model, nhead=nhead, num_encoder_layers=nlayers,
        num_decoder_layers=nlayers, dim_feedforward=ff, dropout=0.0,
        activation=torch.nn.LeakyReLU(0.2), batch_first=True,
    ).eval()
    rng = np.random.RandomState(2)
    src = rng.randn(B, N, d_model).astype(np.float32)
    tgt = rng.randn(B, N, d_model).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(src), torch.from_numpy(tgt)).numpy()

    params, _ = convert_torch_transformer(
        _to_jax(ref.state_dict()), "", nlayers, nlayers)
    # torch's cloning quirk: encoder keeps LeakyReLU, decoder resets to relu
    # (see dgcnn_tpu/models/torch_transformer.py docstring)
    model = TorchTransformer(
        d_model=d_model, nhead=nhead, num_encoder_layers=nlayers,
        num_decoder_layers=nlayers, dim_feedforward=ff, dropout=0.0,
        encoder_activation="leaky_relu", decoder_activation="relu",
    )
    with jax.default_matmul_precision("float32"):
        got = model.apply(
            {"params": params}, jnp.asarray(src), jnp.asarray(tgt), train=False
        )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)


@requires_reference
def test_torch_mha_parity():
    import torch

    from dgcnn_tpu.convert import convert_torch_mha
    from dgcnn_tpu.models import TorchMultiheadAttention

    ref = torch.nn.MultiheadAttention(
        embed_dim=EMB, num_heads=4, dropout=0.0, batch_first=True
    ).eval()
    rng = np.random.RandomState(3)
    q = rng.randn(B, N, EMB).astype(np.float32)
    kv = rng.randn(B, N, EMB).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(q), torch.from_numpy(kv),
                      torch.from_numpy(kv), need_weights=False)
    params = convert_torch_mha(_to_jax(ref.state_dict()), "")
    model = TorchMultiheadAttention(EMB, 4, 0.0)
    with jax.default_matmul_precision("float32"):
        got = model.apply(
            {"params": params}, jnp.asarray(q), jnp.asarray(kv),
            jnp.asarray(kv), train=False,
        )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)


@requires_reference
def test_mlp_head_parity():
    import sys
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    from models.model_partseg import MLPHead as RefHead

    from dgcnn_tpu.convert import convert_mlp_head
    from dgcnn_tpu.models import MLPHead

    targs = _Args(emb_dim=EMB, dropout=0.0, nclasses=50)
    ref = RefHead(targs).eval()
    rng = np.random.RandomState(4)
    lbl = np.eye(16, dtype=np.float32)[rng.randint(0, 16, B)]
    attn = rng.randn(B, N, EMB).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(lbl),
                   torch.from_numpy(attn)).numpy()       # (B, 50, N)
    params, stats = convert_mlp_head(_to_jax(ref.state_dict()), "")
    model = MLPHead(emb_dim=EMB, nclasses=50, dropout=0.0)
    with jax.default_matmul_precision("float32"):
        got = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(lbl), jnp.asarray(attn), train=False,
        )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, atol=2e-4
    )


@requires_reference
def test_net_full_parity(monkeypatch):
    """The WHOLE fusion Net end-to-end vs the torch reference
    (models/model_partseg.py:142-194), converted with convert_net.
    Exact mode: the default eval path runs the transformer stack in bf16
    (AMP, mirroring the reference's autocast training — drift measured by
    tools/parity_drift.py); tight-tolerance parity needs f32.

    The reference hardcodes .cuda() inside compute_hog_1x1
    (model_partseg.py:42-47, 69-74); monkeypatching Tensor.cuda and
    torch.zeros to stay on CPU defeats that, so the composition (double
    transformer swap, HOG branch wiring, attention, head) is checked
    numerically — not just the sub-blocks.
    """
    import sys

    monkeypatch.setenv("DGCNN_TPU_PALLAS_EXACT", "1")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch

    orig_cuda, orig_zeros = torch.Tensor.cuda, torch.zeros
    torch.Tensor.cuda = lambda self, *a, **kw: self

    def zeros_cpu(*a, **kw):
        dev = kw.get("device")
        if dev is not None and torch.device(dev).type == "cuda":
            kw["device"] = "cpu"
        return orig_zeros(*a, **kw)

    torch.zeros = zeros_cpu
    try:
        from models.model_partseg import Net as RefNet

        targs = _Args(emb_dim=EMB, k=K, n_heads=2, n_blocks=1, ff_dims=32,
                      dropout=0.0, nclasses=50)
        ref = RefNet(targs).eval()
        rng = np.random.RandomState(0)
        x = rng.randn(B, 3, N).astype(np.float32)
        lbl = np.eye(16, dtype=np.float32)[rng.randint(0, 16, B)]
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(lbl)).numpy()
    finally:
        torch.Tensor.cuda, torch.zeros = orig_cuda, orig_zeros

    from dgcnn_tpu.convert import convert_net
    from dgcnn_tpu.models import Net

    variables = convert_net(_to_jax(ref.state_dict()), n_blocks=1)
    model = Net(emb_dim=EMB, k=K, n_heads=2, n_blocks=1, ff_dims=32,
                dropout=0.0, nclasses=50, hog_bug_compat=True)
    with jax.default_matmul_precision("float32"):
        got = model.apply(
            variables, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(lbl),
            train=False,
        )
    got = np.asarray(got).transpose(0, 2, 1)              # (B, nclasses, N)
    # measured max |diff| 5.4e-5 on this seed (HOG eig signs match LAPACK);
    # atol leaves headroom for BLAS build variation only
    np.testing.assert_allclose(got, want, atol=5e-4)
