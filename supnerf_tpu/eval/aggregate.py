"""Saved-result aggregation and metric curves.

Capability-equivalent of the reference's collect_eval_results
(/root/reference/src/utils.py:786-988) + scripts/eval_saved_result.py: load a
codes+poses result file (pickle from tto.driver, or the same dict structure),
average PSNR / lidar-weighted depth error / rot / trans error across objects
per iteration, print the table at the standard iters, plot 2x2 curves, and
fold in cross-view evaluation when available.
"""
from __future__ import annotations

import os
import pickle

import numpy as np

PRINT_ITERS = (0, 3, 5, 10, 20, 50, 99)


def _torch_to_numpy(obj):
    import torch

    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    if isinstance(obj, dict):
        return {k: _torch_to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        seq = [_torch_to_numpy(v) for v in obj]
        return type(obj)(seq) if isinstance(obj, tuple) else seq
    return obj


def load_result_file(path: str) -> dict:
    """Load a result dict: this framework's pickles, or the reference's torch
    .pth files (the reference repo distributes saved predictions — they can be
    re-scored here directly)."""
    if path.endswith(".pth"):
        import torch

        # weights_only=False: reference result files contain numpy scalars
        # (np.log/np.sum outputs), which torch>=2.6's default loader rejects
        return _torch_to_numpy(torch.load(path, map_location="cpu",
                                          weights_only=False))
    with open(path, "rb") as f:
        return pickle.load(f)


def aggregate_metrics(result: dict, max_iter: int = 100,
                      rot_outlier_ignore: bool = False,
                      sample_keys=None) -> dict:
    """Compute per-iteration mean curves from a result dict. Returns dict with
    psnr (T,), depth_err (T,) lidar-count-weighted, rot_err_deg (T,),
    trans_err (T,), and n_objects."""
    keys = list(result["psnr_eval"].keys()) if sample_keys is None else sample_keys

    psnr_all = np.asarray([np.asarray(result["psnr_eval"][k])[:max_iter] for k in keys])
    psnr_all = np.nan_to_num(psnr_all, posinf=0.0, neginf=0.0)
    psnr_all[psnr_all < 0] = 0
    psnr_iters = psnr_all.mean(axis=0)

    out = {"psnr": psnr_iters, "n_objects": len(keys)}

    if result.get("depth_err_mean"):
        d_keys = [k for k in keys if k in result["depth_err_mean"]]
        d_all = np.asarray([np.asarray(result["depth_err_mean"][k])[:max_iter] for k in d_keys])
        cnt = np.asarray([result["lidar_pts_cnt"][k] for k in d_keys], np.float64)
        out["depth_err"] = (d_all * cnt[:, None]).sum(axis=0) / max(cnt.sum(), 1e-8)

    if result.get("R_eval"):
        R_all = np.asarray([np.asarray(result["R_eval"][k])[:max_iter] for k in keys])
        R_all = np.nan_to_num(R_all)
        if rot_outlier_ignore:
            r0 = R_all[:, 0].copy()
            R_all[R_all > np.pi * 0.9] = np.abs(R_all[R_all > np.pi * 0.9] - np.pi)
            R_all[:, 0] = r0
        T_all = np.asarray([np.asarray(result["T_eval"][k])[:max_iter] for k in keys])
        out["rot_err_deg"] = R_all.mean(axis=0) / np.pi * 180
        out["trans_err"] = T_all.mean(axis=0)
    return out


def aggregate_cross_eval(cross: dict) -> dict:
    """Off-diagonal cross-view PSNR / depth means at each CODE_SAVE_ITERS
    (reference utils.py:926-986). Instances with <2 views are skipped."""
    iters = cross["CODE_SAVE_ITERS_"]
    n_iters = len(iters)
    psnr_acc = [[] for _ in range(n_iters)]
    depth_acc = [[] for _ in range(n_iters)]
    for ins, mats in cross["psnr_eval_mat_per_ins"].items():
        n_cams = mats[0].shape[0]
        if n_cams < 2:
            continue
        dmats = cross["depth_eval_mat_per_ins"][ins]
        r, c = np.where(~np.eye(n_cams, dtype=bool))
        for i in range(n_iters):
            psnr_acc[i] += mats[i][r, c].tolist()
            depth_acc[i] += dmats[i][r, c].tolist()
    return {
        "iters": np.asarray(iters),
        "psnr_cross": np.asarray([np.mean(p) if p else np.nan for p in psnr_acc]),
        "depth_cross": np.asarray([np.mean(d) if d else np.nan for d in depth_acc]),
    }


def collect_eval_results(result_file: str, max_iter: int = 100, axes=None,
                         color: str = "b", cross_eval_file: str | None = None,
                         print_iters=PRINT_ITERS, rot_outlier_ignore: bool = False,
                         sample_keys=None):
    """Print the standard metric table and (optionally) draw the 2x2 curves
    onto matplotlib axes. Returns the aggregated dict."""
    print(f"Processing {result_file}")
    result = load_result_file(result_file)
    agg = aggregate_metrics(result, max_iter, rot_outlier_ignore, sample_keys)
    pi = [i for i in print_iters if i < len(agg["psnr"])]

    print(f"    psnr: {np.round(agg['psnr'][pi], 2)}")
    if "depth_err" in agg:
        print(f"    depth err: {np.round(agg['depth_err'][pi], 2)}")
    if "rot_err_deg" in agg:
        print(f"    R err: {np.round(agg['rot_err_deg'][pi], 2)}")
        print(f"    T err: {np.round(agg['trans_err'][pi], 2)}")

    if axes is not None:
        iters = np.arange(len(agg["psnr"]))
        axes[0, 0].plot(iters, agg["psnr"], f"{color}-", linewidth=2)
        axes[0, 0].set_title("PSNR"); axes[0, 0].set_xlabel("Iters")
        if "depth_err" in agg:
            axes[0, 1].plot(iters, agg["depth_err"], f"{color}-", linewidth=2)
            axes[0, 1].set_title("Depth Err"); axes[0, 1].set_xlabel("Iters")
        if "rot_err_deg" in agg:
            axes[1, 0].plot(iters, agg["rot_err_deg"], f"{color}-", linewidth=2)
            axes[1, 0].set_title("Rot Err"); axes[1, 0].set_xlabel("Iters")
            axes[1, 1].plot(iters, agg["trans_err"], f"{color}-", linewidth=2)
            axes[1, 1].set_title("Trans Err"); axes[1, 1].set_xlabel("Iters")

    if cross_eval_file is not None and os.path.exists(cross_eval_file):
        cross = aggregate_cross_eval(load_result_file(cross_eval_file))
        agg["cross"] = cross
        print(f"    psnr cross-view: {np.round(cross['psnr_cross'], 2)}")
        print(f"    depth err cross-view: {np.round(cross['depth_cross'], 2)}")
        if axes is not None:
            axes[0, 0].plot(cross["iters"], cross["psnr_cross"], f"{color}s--", linewidth=2)
            axes[0, 1].plot(cross["iters"], cross["depth_cross"], f"{color}s--", linewidth=2)
    return agg
