"""Bench-contract smoke: the scoreboard depends on `python bench.py` printing
EXACTLY one valid JSON line. Round 3's official bench timed out and produced
nothing (BENCH_r03.json rc=124/parsed=null); this test pins the contract so a
structural breakage turns a test red instead of nulling a round.

Runs the full orchestrator (every stage in its own time-boxed subprocess) on
the CPU platform at tiny shapes (BENCH_SMOKE=1).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_all_stages_smoke():
    env = dict(os.environ)
    env.update(BENCH_SMOKE="1", BENCH_METRIC="all", BENCH_DEADLINE_S="540",
               JAX_PLATFORMS="cpu")
    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          env=env, capture_output=True, text=True,
                          timeout=600, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {lines}"
    out = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline", "extra"):
        assert key in out
    assert out["extra"]["smoke"] is True
    # every stage must have actually completed in the smoke run — a stage
    # that fails structurally (import error, shape bug, bad JSON) shows here
    failed = {s: r for s, r in out["extra"]["stages_failed"].items()}
    timed_out = out["extra"]["stages_timed_out"]
    skipped = out["extra"]["stages_skipped"]
    assert not failed, f"stages failed: {failed}"
    assert not timed_out and not skipped, (timed_out, skipped)
    assert out["metric"] == "render_rays_per_sec_per_chip"
    assert out["value"] > 0
    for k in ("tto_objects_per_min_per_chip",
              "tto_product_objects_per_min_per_chip",
              "train_steps_per_sec_per_chip",
              "train_product_steps_per_sec_per_chip",
              "scene_frames_per_sec",
              "tto_vs_ceiling"):
        assert out["extra"][k] > 0, k
    assert out["extra"]["programs_recompiled"] >= 0
