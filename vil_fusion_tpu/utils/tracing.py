"""Structured stage timing (the reference's TicToc, done properly).

The reference wraps every stage in wall-clock `TicToc` stopwatches and logs
via ROS_DEBUG (SURVEY §5 "Tracing"). Here: a process-wide registry of named
timers with mean/max/count and optional JSON dump — usable around jitted
calls (remember to block_until_ready when timing device work).
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class StageTimers:
    def __init__(self):
        self.stats = defaultdict(lambda: {"n": 0, "total": 0.0, "max": 0.0})

    @contextlib.contextmanager
    def timed(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self.stats[name]
            s["n"] += 1
            s["total"] += dt
            s["max"] = max(s["max"], dt)

    def summary(self) -> dict:
        return {
            k: {"n": v["n"], "mean_ms": 1e3 * v["total"] / max(v["n"], 1),
                "max_ms": 1e3 * v["max"], "total_s": v["total"]}
            for k, v in self.stats.items()
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2, sort_keys=True)

    def reset(self):
        self.stats.clear()


GLOBAL_TIMERS = StageTimers()
timed = GLOBAL_TIMERS.timed
