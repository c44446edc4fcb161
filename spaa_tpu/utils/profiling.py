"""Profiling/observability helpers (SURVEY.md §5: the reference has none;
the TPU build adds jax.profiler traces + simple throughput counters).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/spaa_tpu_trace"):
    """Capture a jax.profiler trace around a code block:

        with profiling.trace("/tmp/trace"):
            run_attack(...)

    View with TensorBoard's profile plugin, or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class IterMeter:
    """Running iterations/sec + wall-clock counter for training/attack
    loops (the BASELINE metrics)."""

    def __init__(self):
        self.t0 = time.time()
        self.iters = 0

    def update(self, n: int = 1) -> None:
        self.iters += n

    @property
    def elapsed(self) -> float:
        return time.time() - self.t0

    @property
    def iters_per_sec(self) -> float:
        dt = self.elapsed
        return self.iters / dt if dt > 0 else 0.0

    def __str__(self) -> str:
        return f"{self.iters} iters in {self.elapsed:.1f}s " \
               f"({self.iters_per_sec:.2f} it/s)"
