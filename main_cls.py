#!/usr/bin/env python
"""ModelNet40 classification CLI (flag-compatible with the reference
main_cls.py; engine in dgcnn_tpu/cli/cls.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dgcnn_tpu.cli.cls import main

if __name__ == "__main__":
    main()
