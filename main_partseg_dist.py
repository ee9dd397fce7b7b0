#!/usr/bin/env python
"""Distributed part-segmentation trainer (replaces the reference's
torchrun/DDP main_partseg_dist.py; engine in dgcnn_tpu/cli/partseg_dist.py).
Single process per host — the device mesh replaces process groups."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dgcnn_tpu.cli.partseg_dist import main

if __name__ == "__main__":
    main()
