"""Dataset file conversion: the fork's pre-generated torch TensorDataset
files (``data/shapenetpart_{train,test}_dataset.pt``, reference data.py:348)
re-serialized as npz for the torch-free data path."""
from __future__ import annotations

import os

import numpy as np


def convert_shapenetpart_pt(pt_path: str, npz_path: str) -> None:
    """torch TensorDataset .pt -> npz with data/label/seg arrays."""
    import torch

    ds = torch.load(pt_path, map_location="cpu", weights_only=False)
    if hasattr(ds, "tensors"):                 # TensorDataset
        data, label, seg = (t.numpy() for t in ds.tensors)
    else:                                      # list of (pc, label, seg)
        rows = [tuple(np.asarray(t) for t in row) for row in ds]
        data = np.stack([r[0] for r in rows])
        label = np.stack([r[1] for r in rows])
        seg = np.stack([r[2] for r in rows])
    os.makedirs(os.path.dirname(npz_path) or ".", exist_ok=True)
    np.savez(npz_path, data=data.astype(np.float32),
             label=label.astype(np.int64), seg=seg.astype(np.int64))


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(
        description="Convert reference .pt datasets to npz")
    p.add_argument("pt_path")
    p.add_argument("npz_path")
    args = p.parse_args(argv)
    convert_shapenetpart_pt(args.pt_path, args.npz_path)


if __name__ == "__main__":
    main()
