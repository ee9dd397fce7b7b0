"""AOT serving export (dgcnn_tpu/export.py): StableHLO artifacts with the
weights baked in, loadable and callable without any model code."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def cls_model_and_vars():
    from dgcnn_tpu.models import DGCNNCls

    model = DGCNNCls(emb_dims=32, k=4, output_channels=40)
    pts = jnp.zeros((2, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts,
                           train=False)
    return model, variables


def test_export_roundtrip_matches_apply(cls_model_and_vars, tmp_path):
    from dgcnn_tpu.export import export_model, load_exported, save_exported

    model, variables = cls_model_and_vars
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))

    ex = export_model(model, variables, (pts,))
    path = str(tmp_path / "cls.stablehlo")
    save_exported(path, ex)

    fn = load_exported(path)
    got = np.asarray(fn(pts))
    want = np.asarray(model.apply(variables, pts, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_export_artifact_header(cls_model_and_vars, tmp_path):
    from dgcnn_tpu.export import (
        MAGIC,
        export_model,
        load_exported,
        save_exported,
    )

    model, variables = cls_model_and_vars
    ex = export_model(model, variables,
                      (jnp.zeros((2, 32, 3), jnp.float32),))
    path = str(tmp_path / "cls.bin")
    save_exported(path, ex)
    assert open(path, "rb").read(len(MAGIC)) == MAGIC

    bad = str(tmp_path / "bad.bin")
    open(bad, "wb").write(b"not an artifact")
    with pytest.raises(ValueError):
        load_exported(bad)


def test_export_batches_static_shapes(cls_model_and_vars):
    from dgcnn_tpu.export import export_batches

    model, variables = cls_model_and_vars
    exports = export_batches(
        model, variables,
        lambda b: (jnp.zeros((b, 32, 3), jnp.float32),),
        batch_sizes=[1, 4])
    assert set(exports) == {1, 4}
    rng = np.random.RandomState(1)
    for b, ex in exports.items():
        out = np.asarray(ex.call(
            jnp.asarray(rng.randn(b, 32, 3).astype(np.float32))))
        assert out.shape == (b, 40)
        # static serving shapes: the wrong batch size must be rejected
        with pytest.raises(Exception):
            ex.call(jnp.zeros((b + 1, 32, 3), jnp.float32))


def test_export_polymorphic_batch(cls_model_and_vars, tmp_path):
    """One artifact with a symbolic batch axis serves every batch size and
    matches the jitted apply at each (verified on real TPU too: the Mosaic
    kernels lower under the symbolic dim — batch is a plain loop axis)."""
    from dgcnn_tpu.export import export_model, load_exported, save_exported

    model, variables = cls_model_and_vars
    ex = export_model(model, variables,
                      (jnp.zeros((2, 32, 3), jnp.float32),),
                      polymorphic_batch=True)
    path = str(tmp_path / "cls_poly.stablehlo")
    save_exported(path, ex)
    fn = load_exported(path)

    rng = np.random.RandomState(2)
    ref = jax.jit(lambda v, p: model.apply(v, p, train=False))
    for b in (1, 3, 8):
        pts = jnp.asarray(rng.randn(b, 32, 3).astype(np.float32))
        got = np.asarray(fn(pts))
        want = np.asarray(ref(variables, pts))
        assert got.shape == (b, 40)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_partseg_net_two_inputs(tmp_path):
    """Multi-input signature (points + category one-hot) exports too."""
    from dgcnn_tpu.export import export_model, load_exported, save_exported
    from dgcnn_tpu.models import Net

    model = Net(emb_dim=32, k=4, n_heads=2, n_blocks=1, ff_dims=16,
                d_qkv=8, nclasses=50)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))
    lbl = jnp.asarray(np.eye(16, dtype=np.float32)[[3, 7]])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pts, lbl, train=False)

    ex = export_model(model, variables, (pts, lbl))
    path = str(tmp_path / "net.stablehlo")
    save_exported(path, ex)
    got = np.asarray(load_exported(path)(pts, lbl))
    # compare against the jitted apply: the exported artifact records the
    # jit lowering, whose bf16 fusion points differ from op-by-op eager
    want = np.asarray(jax.jit(
        lambda v, p, l: model.apply(v, p, l, train=False)
    )(variables, pts, lbl))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
