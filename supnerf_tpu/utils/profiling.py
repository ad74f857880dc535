"""First-class profiling / phase timing.

The reference's observability is a per-step wall-clock scalar and commented-out
phase timers (survey §5, trainer_unified_nuscenes.py:341, optimizer
:563-786). Here: jax.profiler trace capture plus a lightweight phase timer
whose results land in the metric logs.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into log_dir (view with
    tensorboard's profile plugin or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase; blocks on device results so the
    measured span covers the actual device work."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def timed(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def summary(self) -> dict:
        return {
            name: {"total_s": self.totals[name], "count": self.counts[name],
                   "mean_s": self.totals[name] / max(self.counts[name], 1)}
            for name in self.totals
        }

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items(),
                              key=lambda kv: -kv[1]["total_s"]):
            lines.append(f"{name:30s} total {s['total_s']:8.3f}s  "
                         f"x{s['count']:<6d} mean {s['mean_s'] * 1e3:8.2f}ms")
        return "\n".join(lines)
