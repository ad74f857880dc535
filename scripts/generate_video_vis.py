#!/usr/bin/env python
"""Assemble per-iteration optimization PNG panels into videos
(reference scripts/generate_video_vis.py:1-15).

Usage: python scripts/generate_video_vis.py RESULT_DIR [--fps 10]
Every subdirectory of RESULT_DIR containing optNNN.png frames becomes
RESULT_DIR/<name>.mp4 via ffmpeg, or <name>.gif via imageio when no
ffmpeg binary is installed (this environment ships imageio but not
ffmpeg).
"""
import argparse
import glob
import os
import subprocess


def assemble(frames_dir: str, out_base: str, fps: int) -> str:
    """One frame directory -> out_base.mp4 (ffmpeg) or out_base.gif
    (imageio fallback). Returns the written path."""
    frames = sorted(glob.glob(os.path.join(frames_dir, "opt*.png")))
    out_mp4 = out_base + ".mp4"
    cmd = [
        "ffmpeg", "-y", "-framerate", str(fps),
        "-pattern_type", "glob", "-i", os.path.join(frames_dir, "opt*.png"),
        "-c:v", "libx264", "-pix_fmt", "yuv420p", out_mp4,
    ]
    try:
        print(" ".join(cmd))
        subprocess.run(cmd, check=True)
        return out_mp4
    except (FileNotFoundError, subprocess.CalledProcessError):
        import imageio.v2 as imageio

        out_gif = out_base + ".gif"
        imageio.mimsave(out_gif, [imageio.imread(f) for f in frames],
                        duration=1.0 / fps)
        print(f"ffmpeg unavailable -> wrote {out_gif}")
        return out_gif


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("result_dir")
    p.add_argument("--fps", type=int, default=10)
    args = p.parse_args(argv)

    for sub in sorted(os.listdir(args.result_dir)):
        d = os.path.join(args.result_dir, sub)
        if not os.path.isdir(d) or not glob.glob(os.path.join(d, "opt*.png")):
            continue
        assemble(d, os.path.join(args.result_dir, sub), args.fps)


if __name__ == "__main__":
    main()
