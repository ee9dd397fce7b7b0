"""ETL step 1 (reference prepare_data/collect_indoor3d_data.py): every
annotated room -> Area_X_room_Y.npy of XYZRGBL rows, including the known
corrupt-character patch in Area_5/hallway_6/ceiling_1.txt."""
from __future__ import annotations

import os

from dgcnn_tpu.data.prepare.indoor3d import collect_point_label

_REVISE_FILE = "Area_5/hallway_6/Annotations/ceiling_1.txt"
_REVISE_POS = 5545347


def patch_corrupt_annotation(data_path: str) -> None:
    """The released dataset has a stray control character in one file; replace
    it with a space (reference collect_indoor3d_data.py:15-22)."""
    path = os.path.join(data_path, _REVISE_FILE)
    if not os.path.exists(path):
        return
    with open(path, "r") as f:
        data = f.read()
    if len(data) > _REVISE_POS + 1 and data[_REVISE_POS + 1] != " ":
        pass  # only rewrite when the char is still present
    patched = data[:_REVISE_POS] + " " + data[_REVISE_POS + 1:]
    if patched != data:
        with open(path, "w") as f:
            f.write(patched)


def main() -> None:
    from dgcnn_tpu.data.datasets import META_DIR, data_root

    root = data_root()
    data_path = os.path.join(root, "Stanford3dDataset_v1.2_Aligned_Version")
    out_dir = os.path.join(root, "stanford_indoor3d")
    os.makedirs(out_dir, exist_ok=True)
    patch_corrupt_annotation(data_path)
    with open(os.path.join(META_DIR, "anno_paths.txt")) as f:
        anno_paths = [os.path.join(data_path, ln.rstrip()) for ln in f]
    for anno in anno_paths:
        print(anno)
        parts = anno.split(os.sep)
        out_name = f"{parts[-3]}_{parts[-2]}.npy"
        collect_point_label(anno, os.path.join(out_dir, out_name), "numpy")


if __name__ == "__main__":
    main()
