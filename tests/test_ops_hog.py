"""Tests for the on-device HOG op vs the reference's CPU-SVD implementation.

The reference (models/model_partseg.py:15-92) inherits LAPACK's arbitrary
singular-vector signs; we fix a deterministic convention
(largest-|component| non-negative).  Parity is therefore asserted:
  * eigenvalues / magnitudes: exact (sign-free),
  * gradients: up to sign,
  * full histograms: on points whose entire kNN neighbourhood has agreeing
    signs between LAPACK and our convention (sign affects only zenith binning).
"""
import numpy as np

import jax.numpy as jnp

from dgcnn_tpu.ops import (
    compute_hog,
    eigvals3x3_sym_desc,
    gather_neighbors,
    knn,
    principal_eigvec3x3_sym,
    principal_gradients,
)
from tests.conftest import requires_reference


def _random_cov(rng, shape):
    a = rng.randn(*shape, 3, 3).astype(np.float32)
    return a @ a.transpose(*range(len(shape)), -1, -2)


def test_eigvals_match_numpy():
    rng = np.random.RandomState(0)
    cov = _random_cov(rng, (4, 17))
    lam = np.asarray(eigvals3x3_sym_desc(jnp.asarray(cov)))
    want = np.linalg.eigvalsh(cov)[..., ::-1]
    np.testing.assert_allclose(lam, want, rtol=1e-4, atol=1e-4)


def test_principal_eigvec_matches_numpy_up_to_sign():
    rng = np.random.RandomState(1)
    cov = _random_cov(rng, (5, 11))
    v = np.asarray(principal_eigvec3x3_sym(jnp.asarray(cov)))
    w, vecs = np.linalg.eigh(cov)
    want = vecs[..., -1]  # largest eigenvalue last in eigh
    dots = np.abs(np.sum(v * want, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)
    # unit norm + deterministic sign
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    dom = np.take_along_axis(v, np.argmax(np.abs(v), -1)[..., None], -1)
    assert (dom >= 0).all()


def test_principal_gradients_magnitude_matches_svd():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 40, 3).astype(np.float32))
    idx = knn(x, 8)
    grad, mag = principal_gradients(x, idx)
    x_nn = np.asarray(gather_neighbors(x, idx))
    centered = x_nn - x_nn.mean(2, keepdims=True)
    _, s, vh = np.linalg.svd(centered, full_matrices=False)
    np.testing.assert_allclose(
        np.asarray(mag)[..., 0], np.sqrt(s[..., 0]), rtol=3e-3, atol=1e-3
    )
    dots = np.abs(np.sum(np.asarray(grad) * vh[..., 0, :], axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


def test_hog_shape_and_norm():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    h = np.asarray(compute_hog(x, 10))
    assert h.shape == (2, 64, 18)
    # L2 norm over each 9-bin channel is 1 (or 0 for empty histograms)
    hh = h.reshape(2, 64, 9, 2)
    norms = np.linalg.norm(hh, axis=2)
    assert np.all((np.abs(norms - 1) < 1e-4) | (norms < 1e-6))


@requires_reference
def test_hog_matches_reference_where_signs_agree():
    import sys
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    from models.model_partseg import compute_hog_1x1

    b, n, k = 2, 48, 8
    # knn is fp-order-sensitive at near-ties: different compilations (torch,
    # standalone XLA, fused XLA) may pick different neighbour *sets* when the
    # k-th and (k+1)-th distances are within fp error, which legitimately
    # changes the histogram.  Pick a seed whose cloud has a safe tie gap.
    for seed in range(4, 50):
        rng = np.random.RandomState(seed)
        x = rng.randn(b, n, 3).astype(np.float32)
        d = ((x[:, :, None, :].astype(np.float64)
              - x[:, None, :, :].astype(np.float64)) ** 2).sum(-1)
        ds = np.sort(d, axis=-1)
        if (ds[..., k] - ds[..., k - 1]).min() > 1e-3:
            break
    else:
        pytest.skip("no tie-free cloud found")

    ref_h = compute_hog_1x1(
        torch.from_numpy(x.transpose(0, 2, 1)), k=k, use_cpu=True
    ).numpy()

    ours_h = np.asarray(compute_hog(jnp.asarray(x), k, bug_compat=True))

    # Recompute LAPACK gradients exactly as the reference does (including its
    # untransposed-view + missing-idx_base gather, see ops/hog.py docstring) to
    # find which points' signs agree with our deterministic convention.
    idx = np.asarray(knn(jnp.asarray(x), k))
    rows = x.transpose(0, 2, 1).reshape(b * n, 3)
    x_nn = rows[idx.reshape(-1)].reshape(b, n, k, 3)
    centered = x_nn - x_nn.mean(2, keepdims=True)
    _, _, vh = np.linalg.svd(centered, full_matrices=False)
    lapack_grad = vh[..., 0, :]                              # (B, N, 3)
    dom = np.take_along_axis(
        lapack_grad, np.argmax(np.abs(lapack_grad), -1)[..., None], -1
    )[..., 0]
    sign_agrees = dom >= 0                                   # (B, N)
    # a point's histogram depends on the gradients of its whole neighbourhood
    # (gathered without batch offset -> batch 0's flags for every batch)
    flat_agree = sign_agrees.reshape(-1)
    nbr_agree = flat_agree[idx.reshape(-1)].reshape(b, n, k).all(-1)
    if nbr_agree.any():
        diff = np.abs(ours_h[nbr_agree] - ref_h[nbr_agree])
        assert diff.max() < 0.05 and np.median(diff) < 2e-3

    # The azimuth channel is invariant under g -> -g (atan(y/x)), so it must
    # match regardless of the sign convention — except where the reference's
    # own f32-LAPACK angle sits within fp error of an integer-degree
    # truncation boundary (the reference .int()-casts angles; both LAPACK and
    # our closed-form solver carry ~0.05 deg error vs ground truth, so bin
    # membership at boundaries is not reproducible by construction).  Mask
    # those rows and require tight agreement on the rest.
    from dgcnn_tpu.ops.eig3 import principal_eig3x3_sym
    cov = np.einsum("bnki,bnkj->bnij", centered, centered)
    g_ours = np.asarray(principal_eig3x3_sym(jnp.asarray(cov))[0])

    def azim(g):
        flat = g.reshape(b * n, 3)[idx.reshape(-1)].reshape(b, n, k, 3)
        return np.degrees(np.arctan(flat[..., 1] / flat[..., 0]))

    az_ref_f = azim(lapack_grad)
    az_our_f = azim(g_ours)
    # same-truncation guarantee: solver diff < distance to the nearest integer
    near_boundary = np.abs(az_ref_f - np.round(az_ref_f)) < 0.05
    diverged = np.abs(az_ref_f - az_our_f) > 0.04
    rows_ok = ~(near_boundary | diverged).any(-1)
    assert rows_ok.mean() > 0.3  # the mask must not hide everything

    ours_az = ours_h.reshape(b, n, 9, 2)[..., 1]
    ref_az = ref_h.reshape(b, n, 9, 2)[..., 1]
    np.testing.assert_allclose(ours_az[rows_ok], ref_az[rows_ok], atol=5e-3)


def test_hog_fused_matches_xla_path(monkeypatch):
    """The gather-free fused TPU path (moment sums + per-point vote sums via
    Pallas, interpret mode) == the XLA gather path.  Histogram bins are
    discrete, so away from integer-degree truncation boundaries the match is
    tight; moment-vs-centered covariance fp differences can flip a
    truncated degree at boundaries, so compare with a small tolerance and
    require near-exactness on the overwhelming majority."""
    import jax

    from dgcnn_tpu.ops.hog import compute_hog

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
    k = 12
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(compute_hog.__wrapped__(x, k))  # use_pallas False
        monkeypatch.setenv("DGCNN_TPU_PALLAS", "1")
        got = np.asarray(compute_hog.__wrapped__(x, k))
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.999, close.mean()
    np.testing.assert_allclose(got, ref, rtol=0.1, atol=0.05)


def test_hog_fused_off_origin_cloud(monkeypatch):
    """The fused moment-form covariance centers the cloud first, so a
    translated (far-from-origin) cloud keeps f32 accuracy.  Compare against
    the XLA path on the same centered input (at |x| ~ 100 the f32 distance
    resolution is ~2e-3, so kNN near-ties legitimately flip between raw and
    centered coordinates — both are fp-correct neighbour sets)."""
    import jax

    from dgcnn_tpu.ops.hog import compute_hog

    rng = np.random.RandomState(12)
    xc = rng.randn(1, 128, 3).astype(np.float32)
    x = jnp.asarray(xc + 100.0)
    x_centered = jnp.asarray(xc + 100.0 - (xc + 100.0).mean(1, keepdims=True))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(compute_hog.__wrapped__(x_centered, 8))
        monkeypatch.setenv("DGCNN_TPU_PALLAS", "1")
        got = np.asarray(compute_hog.__wrapped__(x, 8))
    close = np.isclose(got, ref, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.99, close.mean()
