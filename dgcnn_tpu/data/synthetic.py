"""Synthetic dataset fixtures in the exact h5 schemas the reference downloads
(ModelNet40 / ShapeNetPart / S3DIS blocks), for tests and offline benches on
zero-egress hosts.  Shapes/fields mirror data.py:80-169's expectations."""
from __future__ import annotations

import os

import numpy as np


def _write_h5(path: str, **arrays) -> None:
    import h5py

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with h5py.File(path, "w") as f:
        for k, v in arrays.items():
            f.create_dataset(k, data=v)


def make_modelnet40(root: str, n_train: int = 32, n_test: int = 16,
                    num_points: int = 2048, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    d = os.path.join(root, "modelnet40_ply_hdf5_2048")
    for part, n in [("train", n_train), ("test", n_test)]:
        data = rng.standard_normal((n, num_points, 3)).astype("float32")
        label = rng.integers(0, 40, size=(n, 1)).astype("uint8")
        _write_h5(os.path.join(d, f"ply_data_{part}0.h5"), data=data, label=label)


def make_shapenetpart(root: str, n_train: int = 24, n_val: int = 8,
                      n_test: int = 16, num_points: int = 2048,
                      seed: int = 0) -> None:
    from dgcnn_tpu.train.metrics import INDEX_START, SEG_NUM

    rng = np.random.default_rng(seed)
    d = os.path.join(root, "shapenet_part_seg_hdf5_data")
    for part, n in [("train", n_train), ("val", n_val), ("test", n_test)]:
        data = rng.standard_normal((n, num_points, 3)).astype("float32")
        label = rng.integers(0, 16, size=(n, 1)).astype("uint8")
        pid = np.stack([
            rng.integers(
                INDEX_START[int(c)], INDEX_START[int(c)] + SEG_NUM[int(c)],
                size=num_points,
            )
            for c in label[:, 0]
        ]).astype("uint8")
        _write_h5(
            os.path.join(d, f"ply_data_{part}0.h5"),
            data=data, label=label, pid=pid,
        )


def make_s3dis(root: str, blocks_per_room: int = 4, rooms_per_area: int = 2,
               num_points: int = 4096, seed: int = 0) -> None:
    """Block h5s + all_files/room_filelist for all 6 areas (train + test dirs
    share content like the real pipeline's gen_indoor3d_h5 output)."""
    rng = np.random.default_rng(seed)
    for sub in ["indoor3d_sem_seg_hdf5_data", "indoor3d_sem_seg_hdf5_data_test"]:
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        rooms = [
            f"Area_{a}_office_{r}"
            for a in range(1, 7)
            for r in range(1, rooms_per_area + 1)
        ]
        n = len(rooms) * blocks_per_room
        data = rng.random((n, num_points, 9)).astype("float32")
        label = rng.integers(0, 13, size=(n, num_points)).astype("uint8")
        _write_h5(os.path.join(d, "all_data0.h5"), data=data, label=label)
        with open(os.path.join(d, "all_files.txt"), "w") as f:
            f.write(os.path.join(sub, "all_data0.h5") + "\n")
        with open(os.path.join(d, "room_filelist.txt"), "w") as f:
            for room in rooms:
                for _ in range(blocks_per_room):
                    f.write(room + "\n")
        if sub.endswith("_test"):
            # raw per-block xyz dumps, named with the GLOBAL block counter
            # exactly like gen_indoor3d_h5 (so the visualizer's offset
            # threading is exercised, reference main_semseg.py:286-293)
            raw_index = 0
            for ri, room in enumerate(rooms):
                area_dir = os.path.join(d, "raw_data3d", f"Area_{room[5]}")
                os.makedirs(area_dir, exist_ok=True)
                for b in range(blocks_per_room):
                    np.savetxt(
                        os.path.join(
                            area_dir, f"{room[7:]}({raw_index}).txt"),
                        data[ri * blocks_per_room + b, :, 0:3],
                        fmt="%s", delimiter=" ")
                    raw_index += 1


def make_all(root: str, seed: int = 0) -> None:
    make_modelnet40(root, seed=seed)
    make_shapenetpart(root, seed=seed)
    make_s3dis(root, seed=seed)


# --------------------------------------------------------------------------
# Structured (learnable) variants.
#
# The fixtures above carry RANDOM labels — good for schema/shape tests, but
# a model trained on them can only memorize.  The generators below attach
# labels to GEOMETRY, so held-out generalization is possible and measures
# whether the benched TRAIN paths actually learn (the strongest on-box proxy
# for the blocked real-data gates: reference README.md:86 cls 93.3%,
# :146 partseg 85.2 mIoU, :285 semseg 59.2 mIoU — zero egress here).
#
# Design constraints (so the tasks survive the reference's own train-time
# augmentations, data.py:258-276):
#   * cls: class = (azimuthal, polar) radial-bump frequency pair on a unit
#     sphere with a random azimuthal phase per sample — invariant to the
#     translate aug's anisotropic scale/shift up to mild distortion, and
#     genuinely shape-based (no absolute-coordinate shortcut).
#   * partseg: parts are blobs stacked along +y; rotate_pointcloud spins the
#     x-z plane (around y) and translate/jitter preserve y-order, so the
#     part rule (position along the stack) survives every augmentation.
#   * semseg: room-like blocks (ceiling/floor/wall planes + object blobs)
#     with class-correlated color channels — label is a clean function of
#     the 9-channel features.


def _sphere_dirs(rng: np.random.Generator, n: int):
    """Uniform directions on S^2, plus their azimuth/polar angles."""
    cosph = rng.uniform(-1.0, 1.0, n)
    theta = rng.uniform(0.0, 2.0 * np.pi, n)
    sinph = np.sqrt(1.0 - cosph**2)
    dirs = np.stack(
        [sinph * np.cos(theta), sinph * np.sin(theta), cosph], axis=-1)
    return dirs, theta, np.arccos(cosph)


def structured_cls_cloud(rng: np.random.Generator, cls_id: int,
                         num_points: int, noise: float = 0.02) -> np.ndarray:
    """One class-``cls_id`` cloud: unit sphere with radial bumps
    r = 1 + 0.4 sin(f*(theta+phase)) sin(g*phi), f in 1..8, g in 1..5."""
    f = cls_id % 8 + 1
    g = cls_id // 8 + 1
    dirs, theta, phi = _sphere_dirs(rng, num_points)
    phase = rng.uniform(0.0, 2.0 * np.pi)
    r = 1.0 + 0.4 * np.sin(f * (theta + phase)) * np.sin(g * phi)
    pts = dirs * r[:, None] + noise * rng.standard_normal((num_points, 3))
    return pts.astype("float32")


def make_modelnet40_structured(root: str, n_train: int = 2048,
                               n_test: int = 512, num_points: int = 1024,
                               num_classes: int = 40, seed: int = 0) -> None:
    """ModelNet40-schema h5s whose labels are learnable shape classes."""
    rng = np.random.default_rng(seed)
    d = os.path.join(root, "modelnet40_ply_hdf5_2048")
    for part, n in [("train", n_train), ("test", n_test)]:
        label = (np.arange(n) % num_classes).astype("uint8")
        rng.shuffle(label)
        data = np.stack([
            structured_cls_cloud(rng, int(c), num_points) for c in label
        ])
        _write_h5(os.path.join(d, f"ply_data_{part}0.h5"),
                  data=data, label=label[:, None])


def _primitive(rng: np.random.Generator, kind: int, n: int) -> np.ndarray:
    """Points on one of six LOCALLY distinguishable primitives, all invariant
    to the reference augmentations (rotate spins the x-z plane; anisotropic
    scale preserves each primitive's topological signature): a part id must
    be recoverable from local neighbourhood shape alone — absolute position
    rules do NOT survive the translate aug's +-0.2 shift."""
    if kind == 0:    # solid ball
        dirs, _, _ = _sphere_dirs(rng, n)
        return dirs * (0.8 * rng.uniform(0, 1, n) ** (1 / 3))[:, None]
    if kind == 1:    # thin spherical shell
        dirs, _, _ = _sphere_dirs(rng, n)
        return dirs * (0.9 + 0.02 * rng.standard_normal(n))[:, None]
    if kind == 2:    # flat disk in the x-z plane
        ang = rng.uniform(0, 2 * np.pi, n)
        rad = np.sqrt(rng.uniform(0, 1, n))
        return np.stack([rad * np.cos(ang),
                         0.03 * rng.standard_normal(n),
                         rad * np.sin(ang)], -1)
    if kind == 3:    # stick along y
        p = 0.05 * rng.standard_normal((n, 3))
        p[:, 1] = rng.uniform(-0.8, 0.8, n)
        return p
    if kind == 4:    # torus in the x-z plane
        u = rng.uniform(0, 2 * np.pi, n)
        v = rng.uniform(0, 2 * np.pi, n)
        r = 0.08
        return np.stack([(0.8 + r * np.cos(v)) * np.cos(u),
                         r * np.sin(v),
                         (0.8 + r * np.cos(v)) * np.sin(u)], -1)
    # kind 5: three tight clusters in the x-z plane
    c = rng.integers(0, 3, n)
    ang = 2 * np.pi * c / 3
    ctr = 0.7 * np.stack([np.cos(ang), np.zeros(n), np.sin(ang)], -1)
    return ctr + 0.12 * rng.standard_normal((n, 3))


def structured_partseg_cloud(rng: np.random.Generator, cat: int,
                             num_points: int):
    """One category-``cat`` cloud: SEG_NUM[cat] primitives stacked along +y;
    part id = primitive index within the category's window.  Each part has
    a distinct local shape (_primitive), so segmentation is learnable from
    k-neighbourhood geometry regardless of the augmentations."""
    from dgcnn_tpu.train.metrics import INDEX_START, SEG_NUM

    s = int(SEG_NUM[cat])
    start = int(INDEX_START[cat])
    counts = np.full(s, num_points // s)
    counts[: num_points - counts.sum()] += 1
    pts, pid = [], []
    for i in range(s):
        n_i = int(counts[i])
        center = np.array([0.0, (i - (s - 1) / 2.0) * 2.4, 0.0])
        pts.append(_primitive(rng, i, n_i) + center)
        pid.append(np.full(n_i, start + i))
    pts = np.concatenate(pts, 0)
    pid = np.concatenate(pid, 0)
    pts /= np.abs(pts).max()  # ShapeNet-style unit scale
    order = rng.permutation(num_points)
    return pts[order].astype("float32"), pid[order].astype("uint8")


def make_shapenetpart_structured(root: str, n_train: int = 768,
                                 n_val: int = 128, n_test: int = 256,
                                 num_points: int = 2048,
                                 seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    d = os.path.join(root, "shapenet_part_seg_hdf5_data")
    for part, n in [("train", n_train), ("val", n_val), ("test", n_test)]:
        label = (np.arange(n) % 16).astype("uint8")
        rng.shuffle(label)
        data = np.empty((n, num_points, 3), "float32")
        pid = np.empty((n, num_points), "uint8")
        for j, c in enumerate(label):
            data[j], pid[j] = structured_partseg_cloud(rng, int(c), num_points)
        _write_h5(os.path.join(d, f"ply_data_{part}0.h5"),
                  data=data, label=label[:, None], pid=pid)


# 13 well-separated RGB anchors for the structured S3DIS classes
# (ceiling, floor, wall, beam, column, window, door, table, chair, sofa,
# bookcase, board, clutter — the reference class order, meta/class_names.txt)
_SEM_COLORS = np.array([
    [0.95, 0.95, 0.95], [0.35, 0.20, 0.05], [0.70, 0.70, 0.20],
    [0.90, 0.10, 0.10], [0.10, 0.90, 0.10], [0.10, 0.10, 0.90],
    [0.90, 0.50, 0.10], [0.60, 0.10, 0.60], [0.10, 0.60, 0.60],
    [0.50, 0.50, 0.90], [0.25, 0.55, 0.25], [0.05, 0.05, 0.05],
    [0.55, 0.30, 0.55],
])


def structured_semseg_block(rng: np.random.Generator, num_points: int):
    """One room-like 9-channel block: ceiling/floor/wall planes + 4 object
    blobs; rgb = class color + noise; channels 6-8 = room-normalized xyz."""
    n_plane = num_points // 6          # per structural element
    n_rest = num_points - 4 * n_plane
    obj_counts = np.full(4, n_rest // 4)
    obj_counts[: n_rest - obj_counts.sum()] += 1

    xyz, lab = [], []

    def plane(n, cls, axis, value, zlo=0.0, zhi=3.0):
        p = np.empty((n, 3))
        p[:, 0] = rng.uniform(-0.5, 0.5, n)
        p[:, 1] = rng.uniform(-0.5, 0.5, n)
        p[:, 2] = rng.uniform(zlo, zhi, n)
        p[:, axis] = value + 0.02 * rng.standard_normal(n)
        xyz.append(p)
        lab.append(np.full(n, cls))

    plane(n_plane, 0, 2, 3.0)                                  # ceiling
    plane(n_plane, 1, 2, 0.0)                                  # floor
    plane(n_plane, 2, 0, float(rng.choice([-0.5, 0.5])))       # wall x
    plane(n_plane, 2, 1, float(rng.choice([-0.5, 0.5])))       # wall y
    for n_i in obj_counts:                                     # objects
        cls = int(rng.integers(3, 13))
        center = np.array([rng.uniform(-0.35, 0.35),
                           rng.uniform(-0.35, 0.35),
                           0.3 + 0.18 * (cls - 3)])
        p = center + 0.12 * rng.standard_normal((int(n_i), 3))
        xyz.append(p)
        lab.append(np.full(int(n_i), cls))

    xyz = np.concatenate(xyz, 0)
    lab = np.concatenate(lab, 0)
    rgb = np.clip(
        _SEM_COLORS[lab] + 0.08 * rng.standard_normal((num_points, 3)),
        0.0, 1.0)
    norm = np.stack([xyz[:, 0] + 0.5, xyz[:, 1] + 0.5, xyz[:, 2] / 3.0], -1)
    block = np.concatenate([xyz, rgb, norm], axis=-1)
    order = rng.permutation(num_points)
    return block[order].astype("float32"), lab[order].astype("uint8")


def make_s3dis_structured(root: str, blocks_per_room: int = 6,
                          rooms_per_area: int = 8, num_points: int = 4096,
                          seed: int = 0) -> None:
    """S3DIS-schema block h5s with learnable labels.  All six areas are
    generated from the same distribution, so training with --test_area=6
    holds out a distribution-matched test set."""
    rng = np.random.default_rng(seed)
    rooms = [
        f"Area_{a}_office_{r}"
        for a in range(1, 7)
        for r in range(1, rooms_per_area + 1)
    ]
    n = len(rooms) * blocks_per_room
    data = np.empty((n, num_points, 9), "float32")
    label = np.empty((n, num_points), "uint8")
    for i in range(n):
        data[i], label[i] = structured_semseg_block(rng, num_points)
    for sub in ["indoor3d_sem_seg_hdf5_data",
                "indoor3d_sem_seg_hdf5_data_test"]:
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        _write_h5(os.path.join(d, "all_data0.h5"), data=data, label=label)
        with open(os.path.join(d, "all_files.txt"), "w") as f:
            f.write(os.path.join(sub, "all_data0.h5") + "\n")
        with open(os.path.join(d, "room_filelist.txt"), "w") as f:
            for room in rooms:
                for _ in range(blocks_per_room):
                    f.write(room + "\n")


# bump when any structured generator changes so cached fixture dirs
# (tools/learn_check.py) regenerate
STRUCTURED_VERSION = 2


def make_all_structured(root: str, seed: int = 0) -> None:
    make_modelnet40_structured(root, seed=seed)
    make_shapenetpart_structured(root, seed=seed)
    make_s3dis_structured(root, seed=seed)
    with open(os.path.join(root, "STRUCTURED_VERSION"), "w") as f:
        f.write(str(STRUCTURED_VERSION))
