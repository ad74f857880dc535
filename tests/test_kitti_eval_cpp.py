"""Build and exercise the native KITTI AP evaluator end-to-end."""
import os
import re
import subprocess

import numpy as np
import pytest

CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cpp")
BIN = os.path.join(CPP_DIR, "kitti_eval")


@pytest.fixture(scope="module")
def binary():
    subprocess.run(["bash", os.path.join(CPP_DIR, "build.sh")], check=True,
                   capture_output=True)
    assert os.path.exists(BIN)
    return BIN


def _write_frames(gt_dir, det_dir, n_frames=20, jitter=0.0, score_fn=None,
                  seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(det_dir, exist_ok=True)
    for f in range(n_frames):
        gt_lines, det_lines = [], []
        for o in range(3):
            x0 = rng.uniform(50, 900)
            y0 = rng.uniform(80, 200)
            w2d, h2d = rng.uniform(80, 150), rng.uniform(45, 90)
            h, w, l = 1.6, 1.8, 4.2
            t = [rng.uniform(-10, 10), 1.65, rng.uniform(8, 35)]
            ry = rng.uniform(-np.pi, np.pi)
            gt_lines.append(
                f"Car 0.00 0 0.0 {x0:.2f} {y0:.2f} {x0 + w2d:.2f} {y0 + h2d:.2f} "
                f"{h} {w} {l} {t[0]:.2f} {t[1]:.2f} {t[2]:.2f} {ry:.2f}")
            dt = np.asarray(t) + rng.normal(0, jitter, 3)
            score = rng.uniform(0.3, 1.0) if score_fn is None else score_fn(o)
            det_lines.append(
                f"Car 0.00 0 0.0 {x0 + jitter * 20:.2f} {y0:.2f} "
                f"{x0 + w2d + jitter * 20:.2f} {y0 + h2d:.2f} "
                f"{h} {w} {l} {dt[0]:.2f} {dt[1]:.2f} {dt[2]:.2f} {ry:.2f} {score:.3f}")
        with open(os.path.join(gt_dir, "%06d.txt" % f), "w") as fh:
            fh.write("\n".join(gt_lines) + "\n")
        with open(os.path.join(det_dir, "%06d.txt" % f), "w") as fh:
            fh.write("\n".join(det_lines) + "\n")


def _run(binary, gt, det, *extra):
    out = subprocess.run([binary, "--gt_dir", gt, "--det_dir", det, *extra],
                         capture_output=True, text=True, check=True).stdout
    aps = {}
    for line in out.splitlines():
        m = re.match(r"AP_(\S+)\s+easy: ([\d.]+|n/a)\s+moderate: ([\d.]+|n/a)\s+hard: ([\d.]+|n/a)", line)
        if m:
            vals = [None if v == "n/a" else float(v) for v in m.groups()[1:]]
            aps[m.group(1)] = vals
    return aps, out


def test_perfect_detections_ap100(binary, tmp_path):
    gt, det = str(tmp_path / "gt"), str(tmp_path / "det")
    _write_frames(gt, det, jitter=0.0)
    aps, out = _run(binary, gt, det)
    for metric in ("2D", "BEV", "3D"):
        assert aps[metric][0] > 99.0, out  # easy AP ~100


def test_jittered_detections_degrade_3d_first(binary, tmp_path):
    gt, det = str(tmp_path / "gt"), str(tmp_path / "det")
    _write_frames(gt, det, jitter=0.4)
    aps, out = _run(binary, gt, det, "--min_overlap", "0.7")
    aps_loose, _ = _run(binary, gt, det, "--min_overlap", "0.3")
    # loosening the overlap threshold can only help
    assert aps_loose["3D"][0] >= aps["3D"][0]
    assert aps_loose["BEV"][0] >= aps["BEV"][0]


def test_depth_band_filters_gt(binary, tmp_path):
    gt, det = str(tmp_path / "gt"), str(tmp_path / "det")
    _write_frames(gt, det, jitter=0.0)
    aps_all, _ = _run(binary, gt, det)
    aps_band, out = _run(binary, gt, det, "--depth", "15")
    # a (0, 15] band keeps only a few gt; matched dets on ignored gt don't
    # count as fp, so precision at the achieved recalls stays perfect but the
    # 41-slot average is bounded by the band's n_gt (official small-sample
    # behavior). It must never exceed the full-range AP here.
    assert aps_band["2D"][0] is not None and aps_band["2D"][0] <= aps_all["2D"][0], out
    # depth band with no gt at all -> n/a
    aps_empty, out2 = _run(binary, gt, det, "--depth", "60")
    assert aps_empty["2D"][0] is None, out2


def test_missing_detections_reduce_ap(binary, tmp_path):
    gt, det = str(tmp_path / "gt"), str(tmp_path / "det")
    _write_frames(gt, det, jitter=0.0)
    # drop detections from half the frames
    for f in range(0, 20, 2):
        with open(os.path.join(det, "%06d.txt" % f), "w") as fh:
            fh.write("")
    aps, out = _run(binary, gt, det)
    assert aps["2D"][0] < 70.0, out
