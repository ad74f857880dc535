"""Dataset QA: per-sample debug overlays and a statistics walkthrough.

Capability-equivalent of the reference's dataset debug mode and __main__
statistics blocks (/root/reference/src/data_nuscenes.py:660-711 debug
rendering, :1010-1092 stats walkthrough; src/data_kitti.py:606-665), headless:
panels are written as PNGs and histograms as PDFs instead of plt.show()
(this environment has no display, and the real datasets' QA runs on hosts).

All drawing is numpy/cv2 via utils.vis primitives; the tiny box-projection
math is pinned to the host CPU device so a debug-enabled dataset on the TPU
backend never pays per-sample tunnel dispatches.
"""
from __future__ import annotations

import os

import numpy as np


def _boxes_uv(pose, wlh, K, is_kitti: bool):
    import jax
    import jax.numpy as jnp

    from supnerf_tpu.geometry.boxes import corners_of_box, view_points

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        corners = corners_of_box(jnp.asarray(pose), jnp.asarray(wlh),
                                 is_kitti=is_kitti)
        uv = view_points(corners, jnp.asarray(K), normalize=True)
    return np.asarray(uv)[:2]


def _mask_vis(img, mask_occ):
    """Occupancy-mask panel: target green, occluders red, background dimmed
    (the reference shows the raw instance map; the {-1, 0, 1} occ encoding is
    what this pipeline actually consumes, so that is what gets QA'd)."""
    vis = img * 0.35
    tgt = mask_occ > 0.5
    occ = np.abs(mask_occ) < 0.5
    vis[tgt] = vis[tgt] * 0.3 + np.array([0.1, 0.8, 0.2]) * 0.7
    vis[occ] = vis[occ] * 0.3 + np.array([0.85, 0.15, 0.1]) * 0.7
    return vis


def _scatter_lidar(im, u, v, depth):
    import cv2

    from supnerf_tpu.utils.vis import colorize_depth

    if len(u) == 0:
        return im
    colors = colorize_depth(np.asarray(depth).reshape(1, -1))[0] / 255.0
    for x, y, c in zip(np.asarray(u), np.asarray(v), colors):
        cv2.circle(im, (int(round(float(x))), int(round(float(y)))), 2,
                   tuple(float(ch) for ch in c), -1)
    return im


def debug_sample_panel(sample, *, is_kitti: bool = False, save_path=None):
    """[image + GT box (+ error box) + lidar | occ-mask + 2D ROI + lidar]
    overlay for one dataset sample dict (reference data_nuscenes.py:660-711).
    Returns the uint8 panel; writes it when save_path is given."""
    import cv2

    from supnerf_tpu.utils.vis import render_box

    img = np.asarray(sample["imgs"], np.float32).copy()
    left = img.copy()
    g = ((0.0, 0.8, 0.0),) * 3
    left = render_box(left, _boxes_uv(sample["obj_poses"], sample["wlh"],
                                      sample["cam_intrinsics"], is_kitti), colors=g)
    pose_err = sample.get("obj_poses_w_err")
    if pose_err is not None and not np.allclose(pose_err, sample["obj_poses"]):
        r = ((0.9, 0.1, 0.1),) * 3
        left = render_box(left, _boxes_uv(pose_err, sample["wlh"],
                                          sample["cam_intrinsics"], is_kitti),
                          colors=r)
    right = _mask_vis(img, np.asarray(sample["masks_occ"]))
    x0, y0, x1, y1 = [int(v) for v in np.asarray(sample["rois"]).tolist()]
    cv2.rectangle(right, (x0, y0), (x1, y1), (0.95, 0.9, 0.1), 2)
    for im in (left, right):
        _scatter_lidar(im, sample.get("lidar_u", []), sample.get("lidar_v", []),
                       sample.get("lidar_depth", []))
    panel = (np.clip(np.concatenate([left, right], axis=1), 0, 1)
             * 255).astype(np.uint8)
    if save_path:
        import imageio.v2 as imageio

        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        imageio.imwrite(save_path, panel)
    return panel


def dataset_statistics(dataset, out_dir: str, *, max_samples: int | None = None,
                       name: str | None = None, print_every: int = 50):
    """Walk the dataset and report the curation-quality statistics the
    reference's __main__ blocks print/plot: wlh mean/std, object-distance
    histogram, and visibility (nuScenes devkit) or occlusion (KITTI/Waymo
    labels) histogram. Saves PDFs under out_dir and returns the stats dict."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    name = name or getattr(dataset, "NAME", type(dataset).__name__.lower())
    n = len(dataset) if max_samples is None else min(len(dataset), max_samples)

    distance_all, wlh_all, level_all = [], [], []
    level_label = None
    nusc = getattr(dataset, "nusc", None)
    for i in range(n):
        s = dataset[i]
        distance_all.append(float(np.linalg.norm(np.asarray(s["obj_poses"])[:, 3])))
        wlh_all.append(np.asarray(s["wlh"], np.float32))
        if "occlusion" in s:
            level_label = "Occlusion"
            level_all.append(float(s["occlusion"]))
        elif nusc is not None and "anntoken" in s:
            try:
                ann = nusc.get("sample_annotation", s["anntoken"])
                lvl = int(nusc.get("visibility",
                                   ann["visibility_token"])["token"])
                level_label = "Visibility (6 CAM)"
                level_all.append(lvl)
            except (KeyError, AttributeError):
                pass  # devkit builds without a visibility table
        if print_every and (i + 1) % print_every == 0:
            print(f"Finish {i + 1} / {n}")

    wlh_all = np.stack(wlh_all)
    stats = {
        "n_samples": n,
        "wlh_mean": wlh_all.mean(axis=0).tolist(),
        "wlh_std": wlh_all.std(axis=0).tolist(),
        "dist_mean": float(np.mean(distance_all)),
    }
    print(f"wlh mean: {stats['wlh_mean']},  wlh std: {stats['wlh_std']}")

    plt.figure()
    plt.hist(np.asarray(distance_all), bins="auto", color="#0504aa",
             alpha=0.7, rwidth=0.85)
    plt.grid(axis="y", alpha=0.75)
    plt.xlabel("Distance")
    plt.ylabel("Counts")
    plt.title("Histogram of object distance")
    plt.savefig(os.path.join(out_dir, f"{name}_dist_hist.pdf"))
    plt.close()

    if level_all:
        plt.figure()
        bins = [0, 1, 2, 3] if level_label == "Occlusion" else [1, 2, 3, 4, 5]
        plt.hist(np.asarray(level_all), bins=bins, color="#0504aa",
                 alpha=0.7, rwidth=0.85)
        plt.grid(axis="y", alpha=0.75)
        plt.xlabel(level_label)
        plt.ylabel("Counts")
        plt.title(f"Histogram of {level_label.lower()} level")
        suffix = "occ" if level_label == "Occlusion" else "vis"
        plt.savefig(os.path.join(out_dir, f"{name}_{suffix}_hist.pdf"))
        plt.close()
        stats["level_label"] = level_label
        stats["levels"] = level_all
    return stats
