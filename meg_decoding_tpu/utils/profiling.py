"""Profiling & step-timing instrumentation.

The reference has none (SURVEY §5.1 — only tqdm bars).  Here:
* ``profile_trace`` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace for a window of steps (``profile_dir`` config
  key on the trainers).
* ``StepTimer`` — lightweight wall-clock phase timer accumulating per-phase
  means (gather / step / eval), reported in the epoch summary.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["profile_trace", "StepTimer"]


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self._acc = defaultdict(float)
        self._n = defaultdict(int)
        self._t0 = None
        self._phase = None

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name] += time.perf_counter() - t0
            self._n[name] += 1

    def means_ms(self) -> dict:
        return {f"t_{k}_ms": 1e3 * self._acc[k] / max(self._n[k], 1)
                for k in self._acc}

    def reset(self):
        self._acc.clear()
        self._n.clear()
