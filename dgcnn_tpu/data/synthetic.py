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
