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


# ---------------------------------------------------------------------------
# Instance bounding boxes (detection evaluation exporters; behavioural spec:
# reference prepare_data/indoor3d_util.py:353-598).  Boxes are axis-aligned
# per-instance AABBs over the room's annotation files, with the room shifted
# so its most negative box corner is the origin.
# ---------------------------------------------------------------------------

def _iter_instances(anno_path: str):
    """(points, label) per annotation file, unknown classes -> clutter."""
    for f in sorted(glob.glob(os.path.join(anno_path, "*.txt"))):
        cls = os.path.basename(f).split("_")[0]
        if cls not in CLASS2LABEL:
            cls = "clutter"
        yield np.loadtxt(f), CLASS2LABEL[cls]


def collect_bounding_box(anno_path: str, out_filename: str) -> np.ndarray:
    """Per-instance axis-aligned bounding boxes of one room.

    Writes one text line per instance: ``x1 y1 z1 x2 y2 z2 label`` with
    (x1,y1,z1) the corner closest to the origin (reference
    indoor3d_util.py:353-391).  Returns the (K, 7) array.
    """
    rows = []
    for pts, lab in _iter_instances(anno_path):
        lo = pts[:, 0:3].min(axis=0)
        hi = pts[:, 0:3].max(axis=0)
        rows.append(np.concatenate([lo, hi, [lab]]))
    bbox_label = np.stack(rows)
    room_min = bbox_label[:, 0:3].min(axis=0)
    bbox_label[:, 0:3] -= room_min
    bbox_label[:, 3:6] -= room_min
    with open(out_filename, "w") as f:
        for r in bbox_label:
            f.write("%f %f %f %f %f %f %d\n" % (*r[:6], int(r[6])))
    return bbox_label


def collect_point_bounding_box(anno_path: str, out_filename: str,
                               file_format: str = "numpy") -> np.ndarray:
    """Per-point parent-instance bounding boxes of one room.

    Each row is ``XYZRGB L offsetX offsetY offsetZ a b c`` where the box
    center is point + offset and (a, b, c) are the center-to-surface
    half-extents (reference indoor3d_util.py:548-598).  Returns the (N, 13)
    array; writes txt or .npy per ``file_format``.
    """
    rows = []
    for pts, lab in _iter_instances(anno_path):
        lo = pts[:, 0:3].min(axis=0)
        hi = pts[:, 0:3].max(axis=0)
        center = (lo + hi) / 2
        half = (hi - lo) / 2
        n = pts.shape[0]
        rows.append(np.concatenate([
            pts,
            np.full((n, 1), lab, pts.dtype),
            center - pts[:, 0:3],
            np.broadcast_to(half, (n, 3)),
        ], axis=1))
    point_bbox = np.concatenate(rows, 0)
    point_bbox[:, 0:3] -= point_bbox[:, 0:3].min(axis=0)
    if file_format == "txt":
        with open(out_filename, "w") as f:
            for r in point_bbox:
                f.write("%f %f %f %d %d %d %d %f %f %f %f %f %f\n"
                        % (r[0], r[1], r[2], r[3], r[4], r[5], int(r[6]),
                           r[7], r[8], r[9], r[10], r[11], r[12]))
    elif file_format == "numpy":
        np.save(out_filename, point_bbox)
    else:
        raise ValueError(f"Unknown file format: {file_format}")
    return point_bbox


# The axis-aligned unit cube as OBJ geometry: 8 vertex offsets (unit corner
# weights onto the box extents) and 6 quad faces, 1-based (reference
# indoor3d_util.py:436-452 literal vertex emit, shared here by both OBJ
# exporters instead of being duplicated).
_CUBE_CORNERS = np.array([
    [0, 0, 1], [0, 1, 1], [1, 1, 1], [1, 0, 1],
    [0, 0, 0], [0, 1, 0], [1, 1, 0], [1, 0, 0],
], np.float64)
_CUBE_FACES = [(4, 3, 2, 1), (1, 2, 6, 5), (7, 6, 2, 3),
               (4, 8, 7, 3), (5, 8, 4, 1), (5, 6, 7, 8)]


def _emit_box(fout_obj, fout_mtl, lo: np.ndarray, hi: np.ndarray,
              label: int, ins_cnt: int, v_base: int) -> None:
    material = "material%d" % ins_cnt
    color = np.asarray(LABEL2COLOR[label], np.float64) / 255.0
    fout_obj.write("usemtl %s\n" % material)
    for corner in lo + _CUBE_CORNERS * (hi - lo):
        fout_obj.write("v %f %f %f\n" % tuple(corner))
    fout_obj.write("g default\n")
    for face in _CUBE_FACES:
        fout_obj.write("f %d %d %d %d\n" % tuple(v + v_base for v in face))
    fout_obj.write("\n")
    fout_mtl.write("newmtl %s\nKd %f %f %f\n\n" % (material, *color))


def bbox_label_to_obj(input_filename: str, out_filename_prefix: str,
                      easy_view: bool = False) -> None:
    """One OBJ+MTL file pair per instance box (reference
    indoor3d_util.py:393-466)."""
    bbox_label = np.loadtxt(input_filename)
    ins_cnt = 0
    for row in np.atleast_2d(bbox_label):
        label = int(row[6])
        if easy_view and label not in EASY_VIEW_LABELS:
            continue
        stem = "%s_%s_%d" % (out_filename_prefix, CLASSES[label], ins_cnt)
        with open(stem + ".obj", "w") as fobj, \
                open(stem + ".mtl", "w") as fmtl:
            fobj.write("mtllib %s\n" % os.path.basename(stem + ".mtl"))
            _emit_box(fobj, fmtl, row[0:3], row[3:6], label, ins_cnt, 0)
        ins_cnt += 1


def bbox_label_to_obj_room(input_filename: str, out_filename_prefix: str,
                           easy_view: bool = False,
                           permute: Optional[List[int]] = None,
                           center: bool = False,
                           exclude_table: bool = False) -> None:
    """All of a room's instance boxes in one OBJ+MTL pair, with optional axis
    permutation and centering to a unit-scale origin box (reference
    indoor3d_util.py:468-546)."""
    bbox_label = np.atleast_2d(np.loadtxt(input_filename))
    bbox = bbox_label[:, 0:6].copy()
    if permute is not None:
        assert len(permute) == 3
        p = np.asarray(permute)
        bbox = np.concatenate([bbox[:, p], bbox[:, p + 3]], axis=1)
    if center:
        half_max = bbox[:, 3:6].max(axis=0) / 2.0
        bbox[:, 0:3] -= half_max
        bbox[:, 3:6] -= half_max
        bbox /= half_max.max()
    labels = bbox_label[:, -1].astype(int)
    with open(out_filename_prefix + ".obj", "w") as fobj, \
            open(out_filename_prefix + ".mtl", "w") as fmtl:
        fobj.write("mtllib %s\n"
                   % os.path.basename(out_filename_prefix + ".mtl"))
        ins_cnt = 0
        for row, label in zip(bbox, labels):
            if easy_view and label not in EASY_VIEW_LABELS:
                continue
            if exclude_table and label == CLASSES.index("table"):
                continue
            _emit_box(fobj, fmtl, row[0:3], row[3:6], label, ins_cnt,
                      8 * ins_cnt)
            ins_cnt += 1


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
