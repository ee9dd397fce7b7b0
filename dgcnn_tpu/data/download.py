"""Dataset downloads (reference data.py:31-77).

Same URLs and directory layout as the reference; skipped when the target
directory already exists (so pre-provisioned or synthetic data short-circuits)
and degrade to a clear error when the host has no egress.
"""
from __future__ import annotations

import os
import subprocess
import sys


def _fetch_zip(url: str, final_dir: str, unzipped_name: str) -> None:
    from dgcnn_tpu.data.datasets import data_root

    root = data_root()
    os.makedirs(root, exist_ok=True)
    if os.path.exists(os.path.join(root, final_dir)):
        return
    if os.environ.get("DGCNN_TPU_NO_DOWNLOAD"):
        raise FileNotFoundError(
            f"dataset dir {os.path.join(root, final_dir)} missing and downloads "
            "are disabled (DGCNN_TPU_NO_DOWNLOAD); provision data or generate "
            "fixtures via dgcnn_tpu.data.synthetic"
        )
    zipname = os.path.basename(url)
    try:
        subprocess.run(["wget", "--no-check-certificate", "-q", url], check=True)
        subprocess.run(["unzip", "-q", zipname], check=True)
        os.replace(unzipped_name, os.path.join(root, final_dir))
    finally:
        if os.path.exists(zipname):
            os.remove(zipname)


def download_modelnet40() -> None:
    _fetch_zip(
        "https://shapenet.cs.stanford.edu/media/modelnet40_ply_hdf5_2048.zip",
        "modelnet40_ply_hdf5_2048",
        "modelnet40_ply_hdf5_2048",
    )


def download_shapenetpart() -> None:
    _fetch_zip(
        "https://shapenet.cs.stanford.edu/media/shapenet_part_seg_hdf5_data.zip",
        "shapenet_part_seg_hdf5_data",
        "hdf5_data",
    )


def download_S3DIS() -> None:
    from dgcnn_tpu.data.datasets import data_root

    _fetch_zip(
        "https://shapenet.cs.stanford.edu/media/indoor3d_sem_seg_hdf5_data.zip",
        "indoor3d_sem_seg_hdf5_data",
        "indoor3d_sem_seg_hdf5_data",
    )
    root = data_root()
    aligned = os.path.join(root, "Stanford3dDataset_v1.2_Aligned_Version")
    if not os.path.exists(aligned):
        zippath = aligned + ".zip"
        if os.path.exists(zippath):
            subprocess.run(["unzip", "-q", zippath, "-d", root], check=True)
            os.remove(zippath)
        else:
            print(
                "Place Stanford3dDataset_v1.2_Aligned_Version.zip under "
                f"{root} (manual download form; reference data.py:68-77)",
                file=sys.stderr,
            )


def prepare_test_data_semseg() -> None:
    """Lazy S3DIS ETL (reference data.py:125-131): raw rooms -> per-room npy ->
    4096-pt block h5s, via dgcnn_tpu.data.prepare (in-process, not os.system)."""
    from dgcnn_tpu.data.datasets import data_root

    root = data_root()
    if not os.path.exists(os.path.join(root, "stanford_indoor3d")):
        from dgcnn_tpu.data.prepare import collect_indoor3d_data

        collect_indoor3d_data.main()
    if not os.path.exists(os.path.join(root, "indoor3d_sem_seg_hdf5_data_test")):
        from dgcnn_tpu.data.prepare import gen_indoor3d_h5

        gen_indoor3d_h5.main()
