"""ctypes bindings for the native C++ point-cloud library (native/).

Capabilities (SURVEY.md §2.2 native table):
  * ``sample_mesh``           — area-weighted mesh sampling (pcsample core)
  * ``voxel_downsample``      — voxel-grid filter
  * ``farthest_point_sample`` — FPS (the reference prototyped this via dgl,
                                test.ipynb cell 4)
  * ``knn_host``              — exact host-side kNN oracle

The library auto-builds with make on first use when a toolchain is present;
every function has a numpy fallback so the Python path never hard-fails.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB_PATH = os.path.join(_REPO, "native", "build", "libpointcloud_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_REPO, "native")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.sample_mesh.argtypes = [f32p, ctypes.c_int64, i32p, ctypes.c_int64,
                                ctypes.c_int64, ctypes.c_uint64, f32p]
    lib.sample_mesh.restype = ctypes.c_int
    lib.voxel_downsample.argtypes = [f32p, ctypes.c_int64, ctypes.c_float, f32p]
    lib.voxel_downsample.restype = ctypes.c_int64
    lib.farthest_point_sample.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                                          ctypes.c_int32, i32p]
    lib.farthest_point_sample.restype = ctypes.c_int
    lib.knn_host.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                             ctypes.c_int64, i32p]
    lib.knn_host.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def sample_mesh(vertices: np.ndarray, faces: np.ndarray, n_samples: int,
                seed: int = 0) -> np.ndarray:
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    lib = _load()
    if lib is not None:
        out = np.empty((n_samples, 3), np.float32)
        rc = lib.sample_mesh(vertices, len(vertices), faces, len(faces),
                             n_samples, seed, out)
        if rc == 0:
            return out
    # numpy fallback: same algorithm
    rng = np.random.default_rng(seed)
    a = vertices[faces[:, 0]]
    b = vertices[faces[:, 1]]
    c = vertices[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    probs = area / area.sum()
    fidx = rng.choice(len(faces), n_samples, p=probs)
    u = rng.random(n_samples)
    v = rng.random(n_samples)
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    return (a[fidx] + u[:, None] * (b[fidx] - a[fidx])
            + v[:, None] * (c[fidx] - a[fidx])).astype(np.float32)


def voxel_downsample(points: np.ndarray, leaf: float) -> np.ndarray:
    points = np.ascontiguousarray(points, np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty_like(points)
        m = lib.voxel_downsample(points, len(points), leaf, out)
        return out[:m].copy()
    if leaf <= 0:
        return points.copy()
    keys = np.floor((points - points.min(0)) / leaf).astype(np.int64)
    _, inv = np.unique(keys, axis=0, return_inverse=True)
    m = inv.max() + 1
    sums = np.zeros((m, 3), np.float64)
    counts = np.zeros(m, np.int64)
    np.add.at(sums, inv, points)
    np.add.at(counts, inv, 1)
    return (sums / counts[:, None]).astype(np.float32)


def farthest_point_sample(points: np.ndarray, m: int,
                          start: int = 0) -> np.ndarray:
    points = np.ascontiguousarray(points, np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty(m, np.int32)
        rc = lib.farthest_point_sample(points, len(points), m, start, out)
        if rc == 0:
            return out
    n = len(points)
    dist = np.full(n, np.inf)
    idx = np.empty(m, np.int32)
    cur = start % n
    for s in range(m):
        idx[s] = cur
        d = np.sum((points - points[cur]) ** 2, axis=1)
        dist = np.minimum(dist, d)
        cur = int(np.argmax(dist))
    return idx


def knn_host(points: np.ndarray, k: int) -> np.ndarray:
    points = np.ascontiguousarray(points, np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty((len(points), k), np.int32)
        rc = lib.knn_host(points, len(points), points.shape[1], k, out)
        if rc == 0:
            return out
    d = np.sum((points[:, None] - points[None]) ** 2, -1)
    return np.argsort(d, axis=1, kind="stable")[:, :k].astype(np.int32)
