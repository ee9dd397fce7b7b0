"""Room -> block ETL core (behavioural spec: reference
prepare_data/indoor3d_util.py; rebuilt with vectorized numpy, explicit RNG and
no global raw-data-index state).

Block semantics (indoor3d_util.py:134-261):
  * 1m x 1m XY blocks swept with the given stride over the min-shifted room;
  * blocks with <100 points are discarded;
  * each block is random-sampled (or duplicated up) to exactly ``num_point``;
  * the 9-channel layout is [centered-XY, Z, RGB/255, XYZ/room-max], with the
    block centered on its XY midpoint;
  * per-block raw xyz is dumped to ``raw_data3d/Area_<a>/<room>(<i>).txt`` for
    the sem-seg visualizer (main_semseg.py:103 reads these back).
"""
from __future__ import annotations

import glob
import os
from typing import List, Optional, Tuple

import numpy as np

CLASSES = [
    "ceiling", "floor", "wall", "beam", "column", "window", "door", "table",
    "chair", "sofa", "bookcase", "board", "clutter",
]
CLASS2LABEL = {c: i for i, c in enumerate(CLASSES)}

CLASS2COLOR = {
    "ceiling": [0, 255, 0], "floor": [0, 0, 255], "wall": [0, 255, 255],
    "beam": [255, 255, 0], "column": [255, 0, 255], "window": [100, 100, 255],
    "door": [200, 200, 100], "table": [170, 120, 200], "chair": [255, 0, 0],
    "sofa": [200, 100, 100], "bookcase": [10, 200, 100],
    "board": [200, 200, 200], "clutter": [50, 50, 50],
}
LABEL2COLOR = {i: CLASS2COLOR[c] for i, c in enumerate(CLASSES)}
EASY_VIEW_LABELS = [7, 8, 9, 10, 11, 1]


def collect_point_label(anno_path: str, out_filename: str,
                        file_format: str = "numpy") -> np.ndarray:
    """Aggregate a room's per-instance annotation txts into one XYZRGBL array,
    shifted so the most negative corner is the origin; unknown classes (e.g.
    the dataset's 'staris' typo) map to clutter."""
    rows: List[np.ndarray] = []
    for f in sorted(glob.glob(os.path.join(anno_path, "*.txt"))):
        cls = os.path.basename(f).split("_")[0]
        if cls not in CLASS2LABEL:
            cls = "clutter"
        pts = np.loadtxt(f)
        lab = np.full((pts.shape[0], 1), CLASS2LABEL[cls], dtype=pts.dtype)
        rows.append(np.concatenate([pts, lab], axis=1))
    data_label = np.concatenate(rows, 0)
    data_label[:, 0:3] -= data_label[:, 0:3].min(axis=0)
    if file_format == "numpy":
        np.save(out_filename, data_label)
    elif file_format == "txt":
        np.savetxt(out_filename, data_label,
                   fmt="%f %f %f %d %d %d %d")
    else:
        raise ValueError(f"Unknown file format: {file_format}")
    return data_label


def sample_to_fixed(data: np.ndarray, num_sample: int,
                    rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """Random subsample to exactly num_sample rows (duplicate when short)."""
    n = data.shape[0]
    if n == num_sample:
        return data, np.arange(n)
    if n > num_sample:
        idx = rng.choice(n, num_sample)
        return data[idx], idx
    extra = rng.choice(n, num_sample - n)
    idx = np.concatenate([np.arange(n), extra])
    return data[idx], idx


def room_to_blocks(
    data: np.ndarray,
    label: np.ndarray,
    num_point: int,
    block_size: float = 1.0,
    stride: float = 1.0,
    min_points: int = 100,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sweep XY blocks over a min-shifted room; sample each kept block to
    ``num_point``.  Returns (K, num_point, C) data and (K, num_point) labels."""
    assert stride <= block_size
    if rng is None:
        rng = np.random.default_rng()
    limit = data[:, 0:3].max(0)
    nx = int(np.ceil((limit[0] - block_size) / stride)) + 1
    ny = int(np.ceil((limit[1] - block_size) / stride)) + 1
    blocks, labels = [], []
    for i in range(nx):
        for j in range(ny):
            xb, yb = i * stride, j * stride
            cond = (
                (data[:, 0] >= xb) & (data[:, 0] <= xb + block_size)
                & (data[:, 1] >= yb) & (data[:, 1] <= yb + block_size)
            )
            if cond.sum() < min_points:
                continue
            sampled, idx = sample_to_fixed(data[cond], num_point, rng)
            blocks.append(sampled)
            labels.append(label[cond][idx])
    return np.stack(blocks), np.stack(labels)


def room_to_blocks_normalized(
    data_label: np.ndarray,
    num_point: int,
    block_size: float = 1.0,
    stride: float = 1.0,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """9-channel block build: RGB/255, normalized room XYZ appended, block XY
    centered (reference indoor3d_util.py:238-261)."""
    data = data_label[:, 0:6].copy()
    data[:, 3:6] /= 255.0
    label = data_label[:, -1].astype(np.uint8)
    room_max = data[:, 0:3].max(0)
    blocks, labels = room_to_blocks(
        data, label, num_point, block_size, stride, rng=rng)
    k = blocks.shape[0]
    out = np.zeros((k, num_point, 9), np.float32)
    out[:, :, 6:9] = blocks[:, :, 0:3] / room_max
    xy_min = blocks[:, :, 0:2].min(axis=1, keepdims=True)
    blocks[:, :, 0:2] -= xy_min + block_size / 2
    out[:, :, 0:6] = blocks
    return out, labels


def room_to_samples(
    data: np.ndarray, label: np.ndarray, sample_num_point: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Whole-room chunking into ceil(N/P) fixed-size samples, the tail padded
    by wrapping to the room start (reference indoor3d_util.py:276-310)."""
    n = data.shape[0]
    order = np.arange(n)
    nblocks = int(np.ceil(n / float(sample_num_point)))
    padded = np.concatenate(
        [order, order[: nblocks * sample_num_point - n]])
    sel = padded.reshape(nblocks, sample_num_point)
    return data[sel], label[sel]


def room_to_samples_normalized(
    data_label: np.ndarray, num_point: int
) -> Tuple[np.ndarray, np.ndarray]:
    data = data_label[:, 0:6].copy()
    data[:, 3:6] /= 255.0
    label = data_label[:, -1].astype(np.uint8)
    room_max = data[:, 0:3].max(0)
    samples, labels = room_to_samples(data, label, num_point)
    k = samples.shape[0]
    out = np.zeros((k, num_point, 9), np.float32)
    out[:, :, 6:9] = samples[:, :, 0:3] / room_max
    out[:, :, 0:6] = samples
    return out, labels


def point_label_to_obj(input_filename: str, out_filename: str,
                       label_color: bool = True, easy_view: bool = False,
                       no_wall: bool = False) -> None:
    """OBJ exporter for room inspection (reference indoor3d_util.py:81-104)."""
    data_label = np.loadtxt(input_filename)
    label = data_label[:, -1].astype(int)
    keep = np.ones(len(label), bool)
    if easy_view:
        keep &= np.isin(label, EASY_VIEW_LABELS)
    if no_wall:
        keep &= ~np.isin(label, [0, 2])
    rows = data_label[keep]
    labs = label[keep]
    colors = (np.array([LABEL2COLOR[l] for l in labs])
              if label_color else rows[:, 3:6])
    with open(out_filename, "w") as f:
        for p, c in zip(rows, colors):
            f.write("v %f %f %f %d %d %d\n"
                    % (p[0], p[1], p[2], c[0], c[1], c[2]))
