"""Point-cloud augmentations (reference data.py:258-276), numpy host-side with
an explicit Generator (the reference mixes torch ops onto numpy arrays — a
latent bug in ModelNet40.__getitem__, SURVEY.md §7 quirk 4 — fixed here)."""
from __future__ import annotations

import numpy as np


def translate_pointcloud(pc: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Anisotropic scale U(2/3, 3/2) + shift U(-0.2, 0.2) per axis."""
    xyz1 = rng.uniform(2.0 / 3.0, 3.0 / 2.0, size=3).astype(np.float32)
    xyz2 = rng.uniform(-0.2, 0.2, size=3).astype(np.float32)
    return (pc * xyz1 + xyz2).astype(np.float32)


def jitter_pointcloud(
    pc: np.ndarray, rng: np.random.Generator, sigma: float = 0.01,
    clip: float = 0.02,
) -> np.ndarray:
    """Clipped gaussian jitter."""
    noise = np.clip(sigma * rng.standard_normal(pc.shape), -clip, clip)
    return (pc + noise).astype(np.float32)


def rotate_pointcloud(pc: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Random rotation in the x-z plane (reference draws theta = 2*pi*randn —
    a gaussian angle, preserved as-is)."""
    theta = np.pi * 2 * rng.standard_normal()
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]], dtype=np.float32)
    pc = pc.copy()
    pc[:, [0, 2]] = pc[:, [0, 2]] @ rot
    return pc.astype(np.float32)


# ----------------------------------------------------------------- batched
# Vectorized whole-batch forms used by data.pipeline.PipelineLoader: one
# numpy pass over (B, N, C) instead of B Python calls.  Same distributions
# as the per-item forms above (different RNG draw order, so not
# sample-bitwise identical to the per-item loader — documented there).

def translate_batch(pc: np.ndarray, rng: np.random.Generator,
                    apply: np.ndarray | None = None) -> np.ndarray:
    """Per-sample anisotropic scale U(2/3,3/2) + shift U(-0.2,0.2).
    ``apply`` (B,) bool selects samples (identity elsewhere)."""
    b = pc.shape[0]
    scale = rng.uniform(2.0 / 3.0, 3.0 / 2.0, size=(b, 1, 3)).astype(np.float32)
    shift = rng.uniform(-0.2, 0.2, size=(b, 1, 3)).astype(np.float32)
    if apply is not None:
        sel = apply[:, None, None]
        scale = np.where(sel, scale, np.float32(1.0))
        shift = np.where(sel, shift, np.float32(0.0))
    return pc * scale + shift


def jitter_batch(pc: np.ndarray, rng: np.random.Generator,
                 sigma: float = 0.01, clip: float = 0.02,
                 apply: np.ndarray | None = None) -> np.ndarray:
    noise = np.clip(
        sigma * rng.standard_normal(pc.shape).astype(np.float32),
        -clip, clip)
    if apply is not None:
        noise *= apply[:, None, None].astype(np.float32)
    return pc + noise


def rotate_batch(pc: np.ndarray, rng: np.random.Generator,
                 apply: np.ndarray | None = None) -> np.ndarray:
    """Per-sample x-z-plane rotation with gaussian angle (like the per-item
    form); theta=0 (identity) where ``apply`` is False."""
    b = pc.shape[0]
    theta = (np.pi * 2 * rng.standard_normal(b)).astype(np.float32)
    if apply is not None:
        theta = np.where(apply, theta, np.float32(0.0))
    c, s = np.cos(theta), np.sin(theta)
    out = pc.copy()
    x, z = pc[..., 0], pc[..., 2]
    out[..., 0] = x * c[:, None] + z * s[:, None]
    out[..., 2] = -x * s[:, None] + z * c[:, None]
    return out


def shuffle_points_batch(rng: np.random.Generator, b: int, n: int) -> np.ndarray:
    """(B, N) independent point permutations (argsort of random keys)."""
    return np.argsort(rng.random((b, n)), axis=1)
