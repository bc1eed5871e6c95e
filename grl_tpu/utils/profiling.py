"""Profiling: jax.profiler traces + throughput counters as first-class.

The reference has no working profiling (an unused steps_per_sec counter
and an empty perf template — reference: gnn/utils/tensorboard_writer.py:
60-68, docs/model-performance.md). Here: a trace context that captures a
window of training steps into TensorBoard-viewable traces, plus a
StepTimer producing steps/s / nodes/s / edges/s counters.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace_window(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace (XPlane + TensorBoard) for the block."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling throughput counters for training loops."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._start = time.perf_counter()
        self._steps = 0
        self._units: Dict[str, float] = {}

    def step(self, **units: float) -> None:
        """Record one step and any unit counts (nodes=..., edges=...)."""
        self._steps += 1
        for key, value in units.items():
            self._units[key] = self._units.get(key, 0.0) + value

    def rates(self) -> Dict[str, float]:
        elapsed = max(time.perf_counter() - self._start, 1e-9)
        out = {"steps_per_sec": self._steps / elapsed}
        for key, value in self._units.items():
            out[f"{key}_per_sec"] = value / elapsed
        return out


class Profiler:
    """Config-driven trainer hook: trace steps [start, stop) of training.

    Config block::

        logging:
          profile: {start_step: 10, num_steps: 5}
    """

    def __init__(self, log_dir: str, start_step: int = -1, num_steps: int = 0):
        self.log_dir = os.path.join(log_dir, "traces")
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def maybe_start(self, step: int) -> None:
        if self.start_step >= 0 and step == self.start_step and not self._active:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def maybe_stop(self, step: int) -> Optional[str]:
        if self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            return self.log_dir
        return None
