"""Datasets + h5 loaders (SURVEY.md §2 #14, #15, #18; reference data.py).

Same file globs, field names (``data``/``label``/``pid``), trainval concat and
Area-substring split as the reference, but numpy-native (no torch Dataset) and
deterministic via an explicit ``np.random.Generator`` instead of global seeds.

The data root resolves from ``$DGCNN_TPU_DATA`` (default ``<repo>/data``) so
the same code path serves real downloads and the synthetic test fixtures
written by dgcnn_tpu.data.synthetic.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Optional, Tuple

import numpy as np

from dgcnn_tpu.data import augment

META_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "meta")


def data_root() -> str:
    root = os.environ.get("DGCNN_TPU_DATA")
    if root:
        return root
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(repo, "data")


def _read_h5(path: str, fields: Tuple[str, ...]):
    import h5py

    with h5py.File(path, "r") as f:
        return tuple(np.asarray(f[k]) for k in fields)


def load_data_cls(partition: str):
    """ModelNet40 h5 concat (reference data.py:80-95)."""
    from dgcnn_tpu.data.download import download_modelnet40

    download_modelnet40()
    files = sorted(glob.glob(os.path.join(
        data_root(), "modelnet40_ply_hdf5_2048", f"*{partition}*.h5")))
    datas, labels = [], []
    for p in files:
        d, l = _read_h5(p, ("data", "label"))
        datas.append(d.astype("float32"))
        labels.append(l.astype("int64"))
    return np.concatenate(datas, 0), np.concatenate(labels, 0)


def load_data_partseg(partition: str):
    """ShapeNetPart h5 concat; trainval = train + val (reference data.py:98-122)."""
    from dgcnn_tpu.data.download import download_shapenetpart

    download_shapenetpart()
    base = os.path.join(data_root(), "shapenet_part_seg_hdf5_data")
    if partition == "trainval":
        files = sorted(glob.glob(os.path.join(base, "*train*.h5"))) + sorted(
            glob.glob(os.path.join(base, "*val*.h5")))
    else:
        files = sorted(glob.glob(os.path.join(base, f"*{partition}*.h5")))
    datas, labels, segs = [], [], []
    for p in files:
        d, l, s = _read_h5(p, ("data", "label", "pid"))
        datas.append(d.astype("float32"))
        labels.append(l.astype("int64"))
        segs.append(s.astype("int64"))
    return (
        np.concatenate(datas, 0),
        np.concatenate(labels, 0),
        np.concatenate(segs, 0),
    )


def load_data_semseg(partition: str, test_area: str):
    """S3DIS block h5s with Area-substring train/test split
    (reference data.py:134-169); the test partition's h5s come from the local
    ETL (dgcnn_tpu.data.prepare) when absent."""
    from dgcnn_tpu.data.download import download_S3DIS, prepare_test_data_semseg

    root = data_root()
    if partition == "train":
        d = os.path.join(root, "indoor3d_sem_seg_hdf5_data")
    else:
        d = os.path.join(root, "indoor3d_sem_seg_hdf5_data_test")
    if not os.path.exists(d):
        download_S3DIS()
        prepare_test_data_semseg()
    with open(os.path.join(d, "all_files.txt")) as f:
        all_files = [line.rstrip() for line in f]
    with open(os.path.join(d, "room_filelist.txt")) as f:
        room_filelist = [line.rstrip() for line in f]
    datas, labels = [], []
    for fn in all_files:
        # the reference stores paths relative to its data dir
        path = fn if os.path.isabs(fn) else os.path.join(root, fn)
        if not os.path.exists(path):
            path = os.path.join(d, os.path.basename(fn))
        da, la = _read_h5(path, ("data", "label"))
        datas.append(da)
        labels.append(la)
    data_batches = np.concatenate(datas, 0)
    seg_batches = np.concatenate(labels, 0)
    test_area_name = "Area_" + str(test_area)
    idxs = [
        i for i, room in enumerate(room_filelist)
        if (test_area_name in room) == (partition != "train")
    ]
    return data_batches[idxs, ...], seg_batches[idxs, ...].astype("int64")


def load_color_partseg() -> np.ndarray:
    """Part-id -> RGB table (reference data.py:172-181; legend rendering is in
    dgcnn_tpu.utils.visualization)."""
    with open(os.path.join(META_DIR, "partseg_colors.txt")) as f:
        return np.array([row["color"] for row in json.load(f)])


def load_color_semseg() -> np.ndarray:
    with open(os.path.join(META_DIR, "semseg_colors.txt")) as f:
        return np.array([row["color"] for row in json.load(f)])


class ModelNet40:
    """reference data.py:279-294.  Train: translate aug + point shuffle."""

    def __init__(self, num_points: int, partition: str = "train",
                 seed: int = 42):
        self.data, self.label = load_data_cls(partition)
        self.num_points = num_points
        self.partition = partition
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, item: int):
        pc = self.data[item][: self.num_points].copy()
        label = self.label[item]
        if self.partition == "train":
            pc = augment.translate_pointcloud(pc, self.rng)
            self.rng.shuffle(pc)
        return pc, label

    def batch(self, idxs: np.ndarray, rng: np.random.Generator):
        """Vectorized batch assembly (data.pipeline.PipelineLoader): one
        fancy-index + whole-batch augmentation instead of a per-item loop.
        Same augmentation distribution as __getitem__ (different RNG draw
        order)."""
        pc = self.data[idxs, : self.num_points]
        if self.partition == "train":
            pc = augment.translate_batch(pc, rng)
            order = augment.shuffle_points_batch(rng, *pc.shape[:2])
            pc = np.take_along_axis(pc, order[:, :, None], axis=1)
        else:
            pc = pc.copy()
        return pc, self.label[idxs]


class ShapeNetPart:
    """reference data.py:297-336 (cat2id, seg windows, class_choice filter;
    trainval: point-order shuffle)."""

    CAT2ID = {
        "airplane": 0, "bag": 1, "cap": 2, "car": 3, "chair": 4,
        "earphone": 5, "guitar": 6, "knife": 7, "lamp": 8, "laptop": 9,
        "motor": 10, "mug": 11, "pistol": 12, "rocket": 13,
        "skateboard": 14, "table": 15,
    }
    SEG_NUM = [4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3]
    INDEX_START = [0, 4, 6, 8, 12, 16, 19, 22, 24, 28, 30, 36, 38, 41, 44, 47]

    def __init__(self, num_points: int, partition: str = "train",
                 class_choice: Optional[str] = None, seed: int = 42):
        self.data, self.label, self.seg = load_data_partseg(partition)
        self.num_points = num_points
        self.partition = partition
        self.class_choice = class_choice
        self.partseg_colors = load_color_partseg()
        self.rng = np.random.default_rng(seed)
        if class_choice is not None:
            cid = self.CAT2ID[class_choice]
            keep = (self.label == cid).squeeze()
            self.data = self.data[keep]
            self.label = self.label[keep]
            self.seg = self.seg[keep]
            self.seg_num_all = self.SEG_NUM[cid]
            self.seg_start_index = self.INDEX_START[cid]
        else:
            self.seg_num_all = 50
            self.seg_start_index = 0

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, item: int):
        pc = self.data[item][: self.num_points].copy()
        label = self.label[item]
        seg = self.seg[item][: self.num_points].copy()
        if self.partition == "trainval":
            order = self.rng.permutation(pc.shape[0])
            pc, seg = pc[order], seg[order]
        return pc, label, seg

    def batch(self, idxs: np.ndarray, rng: np.random.Generator):
        pc = self.data[idxs, : self.num_points]
        seg = self.seg[idxs, : self.num_points]
        if self.partition == "trainval":
            order = augment.shuffle_points_batch(rng, *pc.shape[:2])
            pc = np.take_along_axis(pc, order[:, :, None], axis=1)
            seg = np.take_along_axis(seg, order, axis=1)
        else:
            pc, seg = pc.copy(), seg.copy()
        return pc, self.label[idxs], seg


class ShapeNetPartAugmented:
    """reference data.py:339-364: pre-generated tensors with a random subset
    of {translate, jitter, rotate} applied per sample at train time.  Loads
    ``shapenetpart_{train,test}_dataset.npz`` (numpy re-serialization of the
    reference's .pt files; dgcnn_tpu.convert can produce it from them)."""

    def __init__(self, partition: str, seed: int = 42):
        assert partition in ("train", "trainval", "test")
        if partition == "trainval":
            partition = "train"
        self.partition = partition
        path = os.path.join(data_root(), f"shapenetpart_{partition}_dataset.npz")
        if os.path.exists(path):
            z = np.load(path)
            self.data, self.label, self.seg = z["data"], z["label"], z["seg"]
        else:  # fall back to the plain h5s
            part = "trainval" if partition == "train" else "test"
            self.data, self.label, self.seg = load_data_partseg(part)
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, item: int):
        pc = np.asarray(self.data[item], dtype=np.float32).copy()
        label = self.label[item]
        seg = self.seg[item]
        if self.partition == "train":
            fns = [
                augment.translate_pointcloud,
                augment.jitter_pointcloud,
                augment.rotate_pointcloud,
            ]
            self.rng.shuffle(fns)
            choices = self.rng.integers(0, 2, size=3)
            for fn, c in zip(fns, choices):
                if c:
                    pc = fn(pc, self.rng)
        return pc, label, seg

    def batch(self, idxs: np.ndarray, rng: np.random.Generator):
        """Vectorized form of the per-sample random-augmentation-subset
        recipe: each sample draws a random ORDER of the three augmentations
        and an independent on/off choice per augmentation (like
        __getitem__/reference data.py:352-357).  Executed as 3 slots x 3
        masked whole-batch ops (order matters — translate/rotate do not
        commute)."""
        pc = np.asarray(self.data[idxs], dtype=np.float32).copy()
        b = pc.shape[0]
        if self.partition == "train":
            batched = [augment.translate_batch, augment.jitter_batch,
                       augment.rotate_batch]
            # per-sample permutation of the 3 fns + per-fn on/off choice
            order = np.argsort(rng.random((b, 3)), axis=1)        # (B, 3)
            choices = rng.integers(0, 2, size=(b, 3)).astype(bool)
            for slot in range(3):
                for f in range(3):
                    apply = (order[:, slot] == f) & choices[:, f]
                    if apply.any():
                        pc = batched[f](pc, rng, apply=apply)
        return pc, self.label[idxs], self.seg[idxs]


class S3DIS:
    """reference data.py:367-386.  4096-point 9-channel blocks; train-time
    point-order shuffle."""

    def __init__(self, num_points: int = 4096, partition: str = "train",
                 test_area: str = "1", seed: int = 42):
        self.data, self.seg = load_data_semseg(partition, test_area)
        self.num_points = num_points
        self.partition = partition
        self.semseg_colors = load_color_semseg()
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, item: int):
        pc = self.data[item][: self.num_points].copy()
        seg = self.seg[item][: self.num_points].copy()
        if self.partition == "train":
            order = self.rng.permutation(pc.shape[0])
            pc, seg = pc[order], seg[order]
        return pc, seg

    def batch(self, idxs: np.ndarray, rng: np.random.Generator):
        pc = self.data[idxs, : self.num_points]
        seg = self.seg[idxs, : self.num_points]
        if self.partition == "train":
            order = augment.shuffle_points_batch(rng, *pc.shape[:2])
            pc = np.take_along_axis(pc, order[:, :, None], axis=1)
            seg = np.take_along_axis(seg, order, axis=1)
        else:
            pc, seg = pc.copy(), seg.copy()
        return pc, seg
