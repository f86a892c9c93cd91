"""Tracing / profiling utilities.

TPU equivalent of the reference's ``torch.profiler.record_function``
annotations on the stage-2 hot path (SURVEY.md §5.1; reference
lib/temporalpoints.py:421-653, lib/pointwarper.py:217-241): named trace
scopes that show up in a ``jax.profiler`` trace, plus a trace-session
context manager. Scopes are inert unless a profiler session is active —
exactly like the reference's annotations.
"""
from __future__ import annotations

import contextlib
import os
import time

import jax


def scope(name: str):
    """Named annotation visible in profiler traces (and in HLO metadata)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(logdir: str = "./logs/trace"):
    """Capture a profiler trace around a code block
    (view with tensorboard or xprof)."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-interval timing (reference run.py:725-728 style)."""

    def __init__(self):
        self.t0 = time.time()
        self.marks = {}

    def elapsed(self) -> float:
        return time.time() - self.t0

    def elapsed_str(self) -> str:
        t = self.elapsed()
        return f"{t // 3600:02.0f}:{t // 60 % 60:02.0f}:{t % 60:02.0f}"

    def lap(self, key: str) -> float:
        now = time.time()
        prev = self.marks.get(key, self.t0)
        self.marks[key] = now
        return now - prev
