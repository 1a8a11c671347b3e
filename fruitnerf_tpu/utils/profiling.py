"""Profiling hooks — the analog of nerfstudio's @profiler.time_function on the
pipeline hot path (fruit_pipeline.py:50,120,156,175) plus a jax.profiler
trace context for TPU timeline capture."""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StepTimer:
    """Accumulates wall-time per named section; report() gives ms averages."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> dict:
        return {
            name: 1e3 * self.totals[name] / max(self.counts[name], 1)
            for name in self.totals
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace (view with tensorboard/xprof). On remote-tunneled
    TPU backends device timelines may be unavailable; host traces still work."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
