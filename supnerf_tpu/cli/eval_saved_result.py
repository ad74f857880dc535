"""Re-score saved optimization results (reference scripts/eval_saved_result.py
+ evaluate_all.sh): prints the metric tables at the standard iterations and
writes the 2x2 PDF curve figure.

Usage (explicit result files):
  python -m supnerf_tpu.cli.eval_saved_result RESULT.pkl [RESULT2.pkl ...] \
      [--cross_eval CROSS.pkl] [--out eval.pdf] [--max_iter 100]

Usage (reference folder convention, scripts/eval_saved_result.py:10-15):
  python -m supnerf_tpu.cli.eval_saved_result \
      --model-folder checkpoints/supnerf --test-folder test_nuscenes... \
      --legend-name SUPNeRF-nuScenes --plot-cross-view [--save-dir eval_summary]
"""
from __future__ import annotations

import argparse
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from supnerf_tpu.eval.aggregate import collect_eval_results

COLORS = ["b", "r", "g", "m", "c", "k"]


def _find_result(folder: str, stem: str):
    """codes+poses / cross_eval in .pkl (ours) or .pth (reference interop)."""
    for ext in (".pkl", ".pth"):
        path = os.path.join(folder, stem + ext)
        if os.path.exists(path):
            return path
    return None


def main(argv=None):
    p = argparse.ArgumentParser("supnerf_tpu eval_saved_result")
    p.add_argument("results", nargs="*")
    p.add_argument("--cross_eval", type=str, default=None)
    p.add_argument("--out", type=str, default="eval.pdf")
    p.add_argument("--max_iter", type=int, default=100)
    p.add_argument("--rot_outlier_ignore", action="store_true")
    # reference folder-convention mode
    p.add_argument("--model-folder", dest="model_folder", default=None)
    p.add_argument("--test-folder", dest="test_folder",
                   default="test_nuscenes")
    p.add_argument("--legend-name", dest="legend_name", default=None)
    p.add_argument("--plot-cross-view", dest="plot_cross_view",
                   action="store_true")
    p.add_argument("--save-dir", dest="save_dir", default="eval_summary")
    args = p.parse_args(argv)

    results = list(args.results)
    cross_eval = args.cross_eval
    out = args.out
    if args.model_folder is not None:
        if results or args.cross_eval or args.out != "eval.pdf":
            p.error("--model-folder mode is mutually exclusive with explicit "
                    "result files / --cross_eval / --out")
        folder = os.path.join(args.model_folder, args.test_folder)
        path = _find_result(folder, "codes+poses")
        if path is None:
            raise SystemExit(f"no codes+poses result under {folder}")
        results = [path]
        if args.plot_cross_view:
            cross_eval = _find_result(folder, "cross_eval")
        os.makedirs(args.save_dir, exist_ok=True)
        out = os.path.join(args.save_dir,
                           (args.legend_name or "eval") + ".pdf")
    elif not results:
        p.error("provide result files or --model-folder/--test-folder")

    if args.legend_name:
        print(f"==================== Evaluating {args.legend_name} "
              f"====================")
    fig, axes = plt.subplots(2, 2, figsize=(9, 9))
    for i, path in enumerate(results):
        collect_eval_results(
            path, max_iter=args.max_iter, axes=axes, color=COLORS[i % len(COLORS)],
            cross_eval_file=cross_eval,
            rot_outlier_ignore=args.rot_outlier_ignore,
        )
    fig.savefig(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
