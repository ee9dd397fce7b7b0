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
