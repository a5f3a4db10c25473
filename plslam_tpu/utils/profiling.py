"""Tracing / profiling helpers (SURVEY.md §5: the reference has only a
chrono Timer and cout; here: structured per-stage host timing plus
jax.profiler traces for kernel-level speed-of-light analysis in xprof)."""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall time per named stage (the Vector7f `time` analog,
    mapHandler.cpp:162-234, but structured)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync: bool = False):
        t0 = time.time()
        try:
            yield
        finally:
            if sync:
                # block on device work so the stage boundary is honest
                jax.effects_barrier()
            dt = time.time() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {k: {"total_s": round(v, 4),
                    "mean_ms": round(1000.0 * v / max(self.counts[k], 1), 3),
                    "count": self.counts[k]}
                for k, v in sorted(self.totals.items())}

    def dump_jsonl(self, path: str):
        with open(path, "a") as f:
            f.write(json.dumps(self.summary()) + "\n")


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context; view with xprof/tensorboard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
