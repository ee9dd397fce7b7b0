#!/usr/bin/env python
"""ShapeNetPart part-segmentation CLI (flag-compatible with the reference
main_partseg.py; engine in dgcnn_tpu/cli/partseg.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dgcnn_tpu.cli.partseg import main

if __name__ == "__main__":
    main()
