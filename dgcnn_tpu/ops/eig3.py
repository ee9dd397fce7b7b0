"""Closed-form symmetric 3x3 eigendecomposition, batched, on device.

Replaces the reference's host round-trip through ``np.linalg.svd``
(reference: models/model_partseg.py:36-47, which does
``.detach().cpu().numpy()`` -> LAPACK -> ``.cuda()`` every training step).
Eigenvalues use the trigonometric (Cardano) method; the principal eigenvector
comes from the Cayley-Hamilton identity (A - l2 I)(A - l3 I) whose columns span
the l1 eigenspace.  Everything is elementwise VPU work — no loops, no host.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-20


def eigvals3x3_sym_desc(a: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric (..., 3, 3) matrices, descending.

    Returns (..., 3) with lam[..., 0] >= lam[..., 1] >= lam[..., 2].
    """
    a = a.astype(jnp.float32)
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    b = a - q[..., None, None] * jnp.eye(3, dtype=a.dtype)
    p2 = jnp.sum(jnp.square(b), axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    # r = det(B / p) / 2, guarded for p ~ 0 (isotropic matrix -> all eigs = q).
    safe_p = jnp.maximum(p, _EPS)
    c = b / safe_p[..., None, None]
    r = jnp.linalg.det(c) / 2.0
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam0 = q + 2.0 * p * jnp.cos(phi)
    lam2 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam1 = 3.0 * q - lam0 - lam2
    return jnp.stack([lam0, lam1, lam2], axis=-1)


def _cayley_eigvec(a: jax.Array, l1: jax.Array, l2: jax.Array) -> jax.Array:
    """Largest-norm column of (A - l1 I)(A - l2 I), unit-normalized (or e_z)."""
    eye = jnp.eye(3, dtype=a.dtype)
    m = (a - l1[..., None, None] * eye) @ (a - l2[..., None, None] * eye)
    col_sq = jnp.sum(jnp.square(m), axis=-2)                      # (..., 3)
    best = jnp.argmax(col_sq, axis=-1)                            # (...,)
    v = jnp.take_along_axis(m, best[..., None, None], axis=-1)[..., 0]
    norm_sq = jnp.sum(jnp.square(v), axis=-1, keepdims=True)
    fallback = jnp.zeros_like(v).at[..., 2].set(1.0)
    return jnp.where(
        norm_sq > _EPS, v * jax.lax.rsqrt(jnp.maximum(norm_sq, _EPS)), fallback
    )


def _rayleigh(a: jax.Array, v: jax.Array) -> jax.Array:
    """Rayleigh quotient v^T A v for unit v — quadratically accurate eigenvalue."""
    av = jnp.einsum("...ij,...j->...i", a, v)
    return jnp.sum(av * v, axis=-1)


def _adjugate3(m: jax.Array) -> jax.Array:
    """Adjugate of (..., 3, 3): adj(M) @ M = det(M) I."""
    c0 = jnp.cross(m[..., :, 1], m[..., :, 2])
    c1 = jnp.cross(m[..., :, 2], m[..., :, 0])
    c2 = jnp.cross(m[..., :, 0], m[..., :, 1])
    return jnp.stack([c0, c1, c2], axis=-2)  # rows = cofactor rows


def _inverse_iteration_step(a: jax.Array, v: jax.Array) -> jax.Array:
    """One shifted inverse-iteration step v <- adj(A - sigma I) v, normalized.

    With sigma the Rayleigh quotient of v, (A - sigma I) is near singular along
    the target eigendirection, so the adjugate amplifies exactly that component
    — a self-correcting polish that reaches the fp noise floor in one step.
    """
    sigma = _rayleigh(a, v)
    m = a - sigma[..., None, None] * jnp.eye(3, dtype=a.dtype)
    w = jnp.einsum("...ij,...j->...i", _adjugate3(m), v)
    # keep orientation aligned with the input estimate
    w = w * jnp.where(jnp.sum(w * v, axis=-1) < 0, -1.0, 1.0)[..., None]
    norm_sq = jnp.sum(jnp.square(w), axis=-1, keepdims=True)
    ok = norm_sq > _EPS
    w = jnp.where(ok, w * jax.lax.rsqrt(jnp.maximum(norm_sq, _EPS)), v)
    return w


def principal_eigvec3x3_sym(a: jax.Array, lam: jax.Array | None = None) -> jax.Array:
    """Unit eigenvector of the largest eigenvalue of symmetric (...,3,3) matrices.

    The trigonometric eigenvalues carry ~1e-3 relative error in f32 (det/acos
    cancellations), so the raw Cayley-Hamilton eigenvector is ~0.03-0.5 deg off;
    two shifted inverse-iteration polish steps bring it to the f32 noise floor
    (~LAPACK sgesdd accuracy) — needed because the HOG consumer truncates
    angles to integer degrees.

    Sign convention: the component with the largest magnitude is non-negative
    (LAPACK's SVD sign is algorithm-dependent; we fix a deterministic one — see
    SURVEY.md §7 hard-part 4).

    Returns (..., 3).
    """
    a = a.astype(jnp.float32)
    if lam is None:
        lam = eigvals3x3_sym_desc(a)
    v = _cayley_eigvec(a, lam[..., 1], lam[..., 2])
    v = _inverse_iteration_step(a, v)
    v = _inverse_iteration_step(a, v)
    # Deterministic sign: largest-|component| made non-negative.
    dom = jnp.take_along_axis(v, jnp.argmax(jnp.abs(v), axis=-1)[..., None], axis=-1)
    return v * jnp.where(dom[..., 0] < 0, -1.0, 1.0)[..., None]


def principal_eig3x3_sym(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Principal (eigenvector, polished eigenvalue) of symmetric (...,3,3)."""
    a32 = a.astype(jnp.float32)
    v = principal_eigvec3x3_sym(a32)
    return v, _rayleigh(a32, v)
