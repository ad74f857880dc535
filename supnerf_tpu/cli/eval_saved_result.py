"""Re-score saved optimization results (reference scripts/eval_saved_result.py
+ evaluate_all.sh): prints the metric tables at the standard iterations and
writes the 2x2 PDF curve figure.

Usage:
  python -m supnerf_tpu.cli.eval_saved_result RESULT.pkl [RESULT2.pkl ...] \
      [--cross_eval CROSS.pkl] [--out eval.pdf] [--max_iter 100]
"""
from __future__ import annotations

import argparse

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from supnerf_tpu.eval.aggregate import collect_eval_results

COLORS = ["b", "r", "g", "m", "c", "k"]


def main(argv=None):
    p = argparse.ArgumentParser("supnerf_tpu eval_saved_result")
    p.add_argument("results", nargs="+")
    p.add_argument("--cross_eval", type=str, default=None)
    p.add_argument("--out", type=str, default="eval.pdf")
    p.add_argument("--max_iter", type=int, default=100)
    p.add_argument("--rot_outlier_ignore", action="store_true")
    args = p.parse_args(argv)

    fig, axes = plt.subplots(2, 2, figsize=(9, 9))
    for i, path in enumerate(args.results):
        collect_eval_results(
            path, max_iter=args.max_iter, axes=axes, color=COLORS[i % len(COLORS)],
            cross_eval_file=args.cross_eval,
            rot_outlier_ignore=args.rot_outlier_ignore,
        )
    fig.savefig(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
