#!/usr/bin/env python
"""Compatibility entry point (reference optimize_waymo.py)."""
import sys

from supnerf_tpu.cli.optimize import main

if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--config_file" not in " ".join(argv):
        argv += ["--config_file", "supnerf.waymo.car.json"]
    if "--dataset" not in " ".join(argv):
        argv += ["--dataset", "waymo"]
    main(argv)
