#!/usr/bin/env python
"""Assemble per-iteration optimization PNG panels into videos via ffmpeg
(reference scripts/generate_video_vis.py:1-15).

Usage: python scripts/generate_video_vis.py RESULT_DIR [--fps 10]
Every subdirectory of RESULT_DIR containing optNNN.png frames becomes
RESULT_DIR/<name>.mp4.
"""
import argparse
import glob
import os
import subprocess


def main():
    p = argparse.ArgumentParser()
    p.add_argument("result_dir")
    p.add_argument("--fps", type=int, default=10)
    args = p.parse_args()

    for sub in sorted(os.listdir(args.result_dir)):
        d = os.path.join(args.result_dir, sub)
        if not os.path.isdir(d) or not glob.glob(os.path.join(d, "opt*.png")):
            continue
        out = os.path.join(args.result_dir, f"{sub}.mp4")
        cmd = [
            "ffmpeg", "-y", "-framerate", str(args.fps),
            "-pattern_type", "glob", "-i", os.path.join(d, "opt*.png"),
            "-c:v", "libx264", "-pix_fmt", "yuv420p", out,
        ]
        print(" ".join(cmd))
        subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()
