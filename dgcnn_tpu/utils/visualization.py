"""Visualization writers (SURVEY.md §2 #16, #25, #26).

Reproduces the reference's artifact formats exactly:
  * part-seg: per-shape ``<class>/<class>_<idx>_pred_<miou>.{txt,ply}`` +
    ``_gt`` files, colored by part id, with the stateful per-class counters and
    ``--visu`` filtering grammar (``all`` / ``<class>`` / ``<class>_<idx>``) of
    reference main_partseg.py:83-154.
  * sem-seg: per-room streamed txt appends finalized to
    ``<room>_pred_<miou>.{txt,ply}`` (reference main_semseg.py:64-147).
  * color legends rendered from the meta color tables (reference
    data.py:172-255) when cv2 is available.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from dgcnn_tpu.train.metrics import (
    CLASS_CHOICES,
    calculate_sem_IoU,
    calculate_shape_IoU,
)


def write_xyzrgb(path: str, xyzrgb: np.ndarray, fmt: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if fmt == "txt":
        np.savetxt(path, xyzrgb, fmt="%s", delimiter=" ")
    elif fmt == "ply":
        from dgcnn_tpu.utils.ply import write_ply_xyzrgb

        write_ply_xyzrgb(path, np.asarray(xyzrgb, dtype=np.float64))
    else:
        raise ValueError(f"Unknown visualization format: {fmt} (use txt or ply)")


class PartSegVisualizer:
    """Stateful part-seg artifact writer (reference main_partseg.py:26-28,
    83-154: global per-class counters + one warning if the filter matched
    nothing)."""

    def __init__(self, exp_dir: str, visu: str, visu_format: str,
                 colors: np.ndarray, class_choice: Optional[str]):
        self.exp_dir = exp_dir
        self.visu = visu.split("_") if visu else [""]
        self.visu_format = visu_format
        self.colors = np.asarray(colors)
        self.class_choice = class_choice
        self.class_indexs = np.zeros(16, dtype=int)
        self.visual_warning = True

    def _should_skip(self, classname: str, class_index: int) -> bool:
        v = self.visu
        if v[0] != "all":
            if len(v) != 1:
                if v[0] != classname or v[1] != str(class_index):
                    return True
                self.visual_warning = False
            elif v[0] != classname:
                return True
            else:
                self.visual_warning = False
        elif self.class_choice is not None:
            return True
        else:
            self.visual_warning = False
        return False

    def __call__(self, data: np.ndarray, pred: np.ndarray, seg: np.ndarray,
                 label: np.ndarray) -> None:
        """data (B, N, 3); pred/seg (B, N); label (B,) or (B,1)."""
        label = np.ravel(np.asarray(label))
        for i in range(data.shape[0]):
            classname = CLASS_CHOICES[int(label[i])]
            class_index = int(self.class_indexs[int(label[i])])
            if self._should_skip(classname, class_index):
                self.class_indexs[int(label[i])] += 1
                continue
            out_dir = os.path.join(self.exp_dir, "visualization", classname)
            rgb = self.colors[pred[i].astype(int)]
            rgb_gt = self.colors[seg[i].astype(int)]
            xyzrgb = np.concatenate([data[i], rgb], axis=1)
            xyzrgb_gt = np.concatenate([data[i], rgb_gt], axis=1)
            iou = calculate_shape_IoU(
                pred[i][None], seg[i][None], label[i][None],
                self.class_choice, visual=True,
            )[0]
            base = f"{classname}_{class_index}"
            path = os.path.join(
                out_dir, f"{base}_pred_{round(iou, 4)}.{self.visu_format}")
            path_gt = os.path.join(out_dir, f"{base}_gt.{self.visu_format}")
            write_xyzrgb(path, xyzrgb, self.visu_format)
            write_xyzrgb(path_gt, xyzrgb_gt, self.visu_format)
            print(f"{self.visu_format.upper()} visualization file saved in", path)
            print(f"{self.visu_format.upper()} visualization file saved in", path_gt)
            self.class_indexs[int(label[i])] += 1

    def warn_if_unmatched(self) -> None:
        if self.visual_warning and self.visu != [""]:
            print(
                "Visualization Failed: You can only choose a point cloud shape "
                "to visualize within the scope of the test class"
            )


class SemSegVisualizer:
    """Streaming per-room sem-seg writer (reference main_semseg.py:64-147):
    appends colored rows per block, finalizes a room file (with its mIoU in
    the name) at room boundaries."""

    def __init__(self, exp_dir: str, visu: str, visu_format: str,
                 test_choice: str, colors: np.ndarray,
                 room_filelist: List[str], raw_data_dir: Optional[str] = None,
                 index_offset: int = 0):
        self.exp_dir = exp_dir
        self.visu = visu.split("_") if visu else [""]
        self.visu_format = visu_format
        self.test_choice = test_choice
        self.colors = np.asarray(colors)
        self.rooms = room_filelist
        self.raw_data_dir = raw_data_dir
        # the ETL names raw_data3d files with a GLOBAL block counter across
        # all areas (gen_indoor3d_h5); index_offset is this area's start in
        # the global room_filelist (reference main_semseg.py:286-293)
        self.index_offset = index_offset
        self.index = 0
        self.room_seg: List[np.ndarray] = []
        self.room_pred: List[np.ndarray] = []
        self.visual_warning = True

    def _room_info(self, idx: int):
        entry = self.rooms[idx]          # e.g. Area_6_office_1
        test_area = entry[5]
        roomname = entry[7:]
        nxt = self.rooms[idx + 1][7:] if idx + 1 < len(self.rooms) else ""
        return test_area, roomname, nxt

    def _should_skip(self, test_area: str, roomname: str) -> bool:
        v = self.visu
        if v[0] != "all":
            if len(v) == 2:
                if v[0] != "area" or v[1] != test_area:
                    return True
                self.visual_warning = False
            elif len(v) == 4:
                parts = roomname.split("_")
                if (v[0] != "area" or v[1] != test_area
                        or v[2] != parts[0] or v[3] != parts[1]):
                    return True
                self.visual_warning = False
            else:
                return True
        elif self.test_choice != "all":
            return True
        else:
            self.visual_warning = False
        return False

    def __call__(self, data: np.ndarray, seg: np.ndarray, pred: np.ndarray) -> None:
        """data (B, N, 9) blocks; seg/pred (B, N)."""
        for i in range(data.shape[0]):
            test_area, roomname, nxt = self._room_info(self.index)
            if self._should_skip(test_area, roomname):
                self.index += 1
                continue
            room_dir = os.path.join(
                self.exp_dir, "visualization", f"area_{test_area}", roomname)
            os.makedirs(room_dir, exist_ok=True)
            # raw per-block xyz dumps from the ETL when available (reference
            # main_semseg.py:103 reads raw_data3d/<room>(<i>).txt); otherwise
            # the block's own xyz channels
            xyz = None
            if self.raw_data_dir:
                raw = os.path.join(
                    self.raw_data_dir, f"Area_{test_area}",
                    f"{roomname}({self.index + self.index_offset}).txt")
                if os.path.exists(raw):
                    xyz = np.loadtxt(raw)[:, [1, 2, 0]]
            if xyz is None:
                xyz = data[i][:, :3]
            self.index += 1
            n = min(xyz.shape[0], pred.shape[1])
            rgb = self.colors[pred[i][:n].astype(int)]
            rgb_gt = self.colors[seg[i][:n].astype(int)]
            with open(os.path.join(room_dir, roomname + ".txt"), "a") as f:
                np.savetxt(f, np.concatenate([xyz[:n], rgb], 1), fmt="%s")
            with open(os.path.join(room_dir, roomname + "_gt.txt"), "a") as f:
                np.savetxt(f, np.concatenate([xyz[:n], rgb_gt], 1), fmt="%s")
            self.room_seg.append(seg[i])
            self.room_pred.append(pred[i])
            if roomname != nxt:
                miou = float(np.mean(calculate_sem_IoU(
                    np.array(self.room_pred), np.array(self.room_seg),
                    visual=True)))
                self.room_seg, self.room_pred = [], []
                base = os.path.join(room_dir, roomname)
                if self.visu_format == "ply":
                    for suffix, out in [
                        ("", f"{base}_pred_{round(miou, 4)}.ply"),
                        ("_gt", f"{base}_gt.ply"),
                    ]:
                        rows = np.loadtxt(f"{base}{suffix}.txt")
                        write_xyzrgb(out, rows, "ply")
                        print("PLY visualization file saved in", out)
                        os.remove(f"{base}{suffix}.txt")
                else:
                    final = f"{base}_pred_{round(miou, 4)}.txt"
                    os.rename(base + ".txt", final)
                    print("TXT visualization file saved in", final)
                    print("TXT visualization file saved in", base + "_gt.txt")

    def warn_if_unmatched(self) -> None:
        if self.visual_warning and self.visu != [""]:
            print(
                "Visualization Failed: You can only choose a room to visualize "
                "within the scope of the test area"
            )


class _Painter:
    """Legend drawing backend: cv2 when importable (Hershey text, like the
    reference data.py:182-255), else the dependency-free bitmap-font raster
    (utils/raster.py) — legends render everywhere."""

    def __init__(self):
        try:
            import cv2

            self.cv2 = cv2
        except ImportError:
            self.cv2 = None

    def rect(self, img, x0, y0, x1, y1, color):
        if self.cv2 is not None:
            self.cv2.rectangle(img, (x0, y0), (x1, y1),
                               color=tuple(int(v) for v in color),
                               thickness=-1)
        else:
            from dgcnn_tpu.utils import raster

            raster.draw_rect(img, x0, y0, x1, y1, color)

    def text(self, img, s, x, y, scale):
        if self.cv2 is not None:
            self.cv2.putText(img, s, (x, y), self.cv2.FONT_HERSHEY_SIMPLEX,
                             scale, (0, 0, 0), 2)
        else:
            from dgcnn_tpu.utils import raster

            raster.draw_text(img, s, x, y - 16, scale=3)

    def save(self, path, img) -> str:
        if self.cv2 is not None:
            self.cv2.imwrite(path, img)
        else:
            from dgcnn_tpu.utils import raster

            # colors are BGR-ordered for cv2 parity; PNG wants RGB
            raster.write_png(path, img[..., ::-1])
        return path


def render_legend_partseg(out_path: str) -> Optional[str]:
    """Part-seg color legend PNG (reference data.py:182-213)."""
    import json

    from dgcnn_tpu.data.datasets import META_DIR

    painter = _Painter()
    with open(os.path.join(META_DIR, "partseg_colors.txt")) as f:
        table = json.load(f)
    colors = np.array([r["color"] for r in table])[:, [2, 1, 0]]
    labels = [r["label"] for r in table]
    column_numbers = [4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3]
    column_gaps = [320, 320, 300, 300, 285, 285]
    img = np.full((1350, 1890, 3), 255, dtype="uint8")
    idx, row_y = 0, 16
    for row in range(len(column_numbers)):
        col_x = 32
        for col in range(column_numbers[row]):
            c = colors[idx]
            painter.rect(img, col_x, row_y, col_x + 64, row_y + 64, c)
            painter.text(img, labels[idx], col_x + 73, row_y + 32, 0.76)
            col_x += column_gaps[col]
            idx += 1
            if idx >= len(labels):
                break
        row_y += 83
        if idx >= len(labels):
            break
    return painter.save(out_path, img)


def render_legend_semseg(out_path: str) -> Optional[str]:
    """Sem-seg color legend PNG (reference data.py:216-255)."""
    import json

    from dgcnn_tpu.data.datasets import META_DIR

    painter = _Painter()
    with open(os.path.join(META_DIR, "semseg_colors.txt")) as f:
        table = json.load(f)
    colors = np.array([r["color"] for r in table])[:, [2, 1, 0]]
    labels = [r["label"] for r in table]
    img = np.full((500, 1500, 3), 255, dtype="uint8")
    idx, row_y = 0, 16
    while idx < len(labels):
        col_x = 32
        while idx < len(labels) and col_x < 1280:
            c = colors[idx]
            painter.rect(img, col_x, row_y, col_x + 64, row_y + 64, c)
            painter.text(img, labels[idx], col_x + 73, row_y + 32, 0.7)
            col_x += 200
            idx += 1
        row_y += 83
    return painter.save(out_path, img)
