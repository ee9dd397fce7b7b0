#!/usr/bin/env python
"""S3DIS semantic-segmentation CLI (flag-compatible with the reference
main_semseg.py; engine in dgcnn_tpu/cli/semseg.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dgcnn_tpu.cli.semseg import main

if __name__ == "__main__":
    main()
