#!/usr/bin/env python
"""Compatibility entry point (reference optimize_nuscenes.py)."""
import sys

from supnerf_tpu.cli.optimize import main

if __name__ == "__main__":
    main(sys.argv[1:] + (["--dataset", "nusc"] if "--dataset" not in " ".join(sys.argv) else []))
