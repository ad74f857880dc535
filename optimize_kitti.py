#!/usr/bin/env python
"""Compatibility entry point (reference optimize_kitti.py)."""
import sys

from supnerf_tpu.cli.optimize import main

if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--config_file" not in " ".join(argv):
        argv += ["--config_file", "supnerf.kitti.car.json"]
    if "--dataset" not in " ".join(argv):
        argv += ["--dataset", "kitti"]
    main(argv)
