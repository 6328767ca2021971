"""Profiling helpers: wall-clock phases + jax.profiler trace capture.

The reference's observability is Instant timers + indicatif bars
(SURVEY.md §5); here phases() gives the same per-phase wall clock and
trace() wraps jax.profiler for XProf/TensorBoard traces of the device
timeline."""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class Phases:
    """Accumulates named wall-clock phases; print with report()."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [
            f"  {k:24s} {v:8.2f}s ({100*v/total:4.1f}%)"
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler device trace (view with xprof/tensorboard).
    No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Paths/s meter for render loops."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.paths = 0

    def add(self, n_paths: int):
        self.paths += n_paths

    @property
    def mpaths_per_s(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.paths / dt / 1e6 if dt > 0 else 0.0
