"""Minimal PLY point-cloud I/O (vertex elements only) — replaces the
reference's plyfile dependency (main_partseg.py:19, data_prep_util.py:5) with
a self-contained writer/reader for the artifact formats the reference emits:
float32 x/y/z plus optional uint8 red/green/blue, ASCII or binary LE."""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def write_ply_xyzrgb(path: str, xyzrgb: np.ndarray, binary: bool = True) -> None:
    """Write (N, 6) [x y z r g b] rows (matches the reference's PlyElement
    vertex schema: f4 coords + u1 colors)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = xyzrgb.shape[0]
    header = (
        "ply\n"
        f"format {'binary_little_endian' if binary else 'ascii'} 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                             ("red", "u1"), ("green", "u1"), ("blue", "u1")])
    rec["x"], rec["y"], rec["z"] = (xyzrgb[:, i].astype("<f4") for i in range(3))
    rec["red"], rec["green"], rec["blue"] = (
        xyzrgb[:, 3 + i].astype("u1") for i in range(3))
    if binary:
        with open(path, "wb") as f:
            f.write(header.encode())
            rec.tofile(f)
    else:
        with open(path, "w") as f:
            f.write(header)
            for r in rec:
                f.write("%g %g %g %d %d %d\n" % tuple(r))


def write_ply_xyz(path: str, xyz: np.ndarray, binary: bool = True) -> None:
    """Write (N, 3) coordinates (data_prep_util.export_ply schema)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = xyz.shape[0]
    header = (
        "ply\n"
        f"format {'binary_little_endian' if binary else 'ascii'} 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n"
    )
    rec = np.ascontiguousarray(xyz.astype("<f4"))
    if binary:
        with open(path, "wb") as f:
            f.write(header.encode())
            rec.tofile(f)
    else:
        with open(path, "w") as f:
            f.write(header)
            np.savetxt(f, rec, fmt="%g")


def read_ply(path: str) -> np.ndarray:
    """Read a vertex-only PLY written by this module (or compatible).
    Returns (N, n_props) float array in property order."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        n = 0
        props: list[Tuple[str, str]] = []
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: truncated header")
            parts = line.decode().strip().split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element" and parts[1] == "vertex":
                n = int(parts[2])
            elif parts[0] == "property":
                props.append((parts[2], parts[1]))
            elif parts[0] == "end_header":
                break
        typemap = {"float": "<f4", "float32": "<f4", "double": "<f8",
                   "uchar": "u1", "uint8": "u1", "int": "<i4"}
        dtype = np.dtype([(name, typemap[t]) for name, t in props])
        if fmt == "ascii":
            rows = np.loadtxt(f, max_rows=n, ndmin=2)
            return rows.astype(np.float64)
        rec = np.fromfile(f, dtype=dtype, count=n)
        return np.stack([rec[name].astype(np.float64) for name, _ in props], 1)
