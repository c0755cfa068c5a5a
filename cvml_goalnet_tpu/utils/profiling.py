"""Tracing / profiling hooks (a first-class subsystem; ABSENT upstream —
the reference only printed wall-clock deltas, ``main.py:83,145-146`` —
SURVEY.md §5 "Tracing / profiling").

* :class:`StageTimer` — named per-stage wall-clock aggregation with summary.
* :func:`trace_annotation` — ``jax.profiler.TraceAnnotation`` passthrough so
  stages show up in TPU profiler timelines (xprof/tensorboard).
* :func:`start_trace` / :func:`stop_trace` — programmatic device tracing.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall-clock per named stage; ``summary()`` → dict of seconds."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        with trace_annotation(name):
            yield
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }


def trace_annotation(name: str):
    """Named region for device profiles (no-op cost when not tracing)."""
    return jax.profiler.TraceAnnotation(name)


def start_trace(log_dir: str) -> None:
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()
