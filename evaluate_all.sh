#!/bin/bash
# Re-score all saved optimization results under a checkpoints tree
# (reference evaluate_all.sh). Usage: ./evaluate_all.sh [CHECKPOINT_ROOT]
set -e
ROOT="${1:-checkpoints}"
for f in $(find "$ROOT" -name 'codes+poses.pkl' | sort); do
    dir=$(dirname "$f")
    cross=""
    [ -f "$dir/cross_eval.pkl" ] && cross="--cross_eval $dir/cross_eval.pkl"
    python -m supnerf_tpu.cli.eval_saved_result "$f" $cross --out "$dir/eval.pdf"
done
