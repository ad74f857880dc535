#!/usr/bin/env python
"""Compatibility entry point (reference optimize_kitti.py)."""
import sys

from supnerf_tpu.cli.optimize import main

if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--config_file" not in " ".join(argv):
        argv += ["--config_file", "supnerf.kitti.car.json"]
    # reference KITTI/Waymo CLI defaults differ from nuScenes
    # (optimize_kitti.py:32-34): init_rot_err 0.4, init_trans_err 0.01
    if "--init_rot_err" not in " ".join(argv):
        argv += ["--init_rot_err", "0.4"]
    if "--init_trans_err" not in " ".join(argv):
        argv += ["--init_trans_err", "0.01"]
    if "--dataset" not in " ".join(argv):
        argv += ["--dataset", "kitti"]
    main(argv)
