"""H5/PLY prep utilities (reference prepare_data/data_prep_util.py).

The reference shells out to a missing C++ PCL binary
(``third_party/mesh_sampling/build/pcsample``, data_prep_util.py:9) for
mesh->point sampling; here that capability is the native C++ sampler in
``native/`` exposed via dgcnn_tpu.native (ctypes), with a numpy fallback.
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

SAMPLING_POINT_NUM = 2048
SAMPLING_LEAF_SIZE = 0.005


def save_h5(h5_filename: str, data: np.ndarray, label: np.ndarray,
            data_dtype: str = "uint8", label_dtype: str = "uint8") -> None:
    import h5py

    with h5py.File(h5_filename, "w") as f:
        f.create_dataset("data", data=data, compression="gzip",
                         compression_opts=4, dtype=data_dtype)
        f.create_dataset("label", data=label, compression="gzip",
                         compression_opts=1, dtype=label_dtype)


def save_h5_data_label_normal(
    h5_filename: str, data: np.ndarray, label: np.ndarray,
    normal: np.ndarray, data_dtype: str = "float32",
    label_dtype: str = "uint8", normal_dtype: str = "float32",
) -> None:
    import h5py

    with h5py.File(h5_filename, "w") as f:
        f.create_dataset("data", data=data, compression="gzip",
                         compression_opts=4, dtype=data_dtype)
        f.create_dataset("normal", data=normal, compression="gzip",
                         compression_opts=4, dtype=normal_dtype)
        f.create_dataset("label", data=label, compression="gzip",
                         compression_opts=1, dtype=label_dtype)


def load_h5(h5_filename: str) -> Tuple[np.ndarray, np.ndarray]:
    import h5py

    with h5py.File(h5_filename, "r") as f:
        return np.asarray(f["data"]), np.asarray(f["label"])


def load_h5_data_label_normal(h5_filename: str):
    import h5py

    with h5py.File(h5_filename, "r") as f:
        return (np.asarray(f["data"]), np.asarray(f["label"]),
                np.asarray(f["normal"]))


def load_h5_data_label_seg(h5_filename: str):
    import h5py

    with h5py.File(h5_filename, "r") as f:
        return (np.asarray(f["data"]), np.asarray(f["label"]),
                np.asarray(f["pid"]))


def export_ply(pc: np.ndarray, filename: str) -> None:
    from dgcnn_tpu.utils.ply import write_ply_xyz

    write_ply_xyz(filename, np.asarray(pc))


def load_ply_data(filename: str, point_num: int) -> np.ndarray:
    from dgcnn_tpu.utils.ply import read_ply

    return read_ply(filename)[:point_num, :3]


def get_sampling_command(obj_filename: str, ply_filename: str) -> str:
    """Mesh->point sampling command (reference shelled out to the absent
    ``pcsample`` binary; our native sampler CLI replaces it)."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    binary = os.path.join(repo, "native", "build", "pcsample")
    return (f"{binary} {obj_filename} {ply_filename} "
            f"-n_samples {SAMPLING_POINT_NUM} -leaf_size {SAMPLING_LEAF_SIZE}")


def pad_arr_rows(arr: np.ndarray, row: int, pad_value: float = 0.0) -> np.ndarray:
    """Pad/truncate the first axis to ``row`` rows."""
    if arr.shape[0] >= row:
        return arr[:row]
    pad = np.full((row - arr.shape[0],) + arr.shape[1:], pad_value, arr.dtype)
    return np.concatenate([arr, pad], 0)
