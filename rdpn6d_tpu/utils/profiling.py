"""Profiling and timing helpers.

The reference has no profiler integration — only wall-clock timing with
cuda.synchronize inside the inference loop (SURVEY.md §5,
gdrn_evaluator.py:603-683). Here: ``jax.profiler`` trace capture around any
region (viewable in TensorBoard / Perfetto) plus a lightweight step timer.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: with trace('/tmp/profile'): step(...)"""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the TraceViewer timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Blocking wall-clock stats per named phase."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def measure(self, name: str):
        """``with timer.measure("step") as sync: out = f(x); sync(out)``.

        Call the yielded ``sync`` on values produced INSIDE the block to
        include their async device execution in the measurement (a value
        bound at context creation could never cover work dispatched in
        the body). Accounting runs even if the body raises."""
        pending = []
        t0 = time.perf_counter()
        try:
            yield pending.append
        finally:
            for r in pending:
                jax.block_until_ready(r)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}

    def report(self) -> str:
        return "  ".join(f"{k}: {v * 1000:.2f}ms"
                         for k, v in sorted(self.summary().items()))
