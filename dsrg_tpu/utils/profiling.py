"""Tracing / profiling / metric logging.

The reference has none of this (``SURVEY.md`` §5: an unused ``import
timeit`` is its entire observability story).  Here:

* :func:`trace` — ``jax.profiler`` trace context writing TensorBoard-readable
  traces for a block of steps;
* :class:`StepTimer` — EMA step timing with images/sec;
* :class:`MetricLogger` — JSONL metric writer + Caffe-style console lines
  (``display`` / ``average_loss``, solver-s.prototxt:10-11).
"""

from __future__ import annotations

import collections
import contextlib
import json
import os
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile the enclosed block: ``with trace('/tmp/tb'): run_steps()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, batch_size: int, ema: float = 0.9):
        self.batch_size = batch_size
        self.ema = ema
        self._last: Optional[float] = None
        self.step_time: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.step_time = dt if self.step_time is None else (
                self.ema * self.step_time + (1 - self.ema) * dt
            )
        self._last = now

    @property
    def images_per_sec(self) -> float:
        return self.batch_size / self.step_time if self.step_time else float("nan")


class MetricLogger:
    def __init__(self, log_path: Optional[str] = None, average_window: int = 10):
        self.log_path = log_path
        if log_path:
            os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
            self._f = open(log_path, "a")
        else:
            self._f = None
        self.window: Dict[str, collections.deque] = {}
        self.average_window = average_window

    def log(self, step: int, metrics: Dict[str, float]) -> Dict[str, float]:
        averaged = {}
        for k, v in metrics.items():
            v = float(v)
            self.window.setdefault(k, collections.deque(maxlen=self.average_window)).append(v)
            averaged[k] = sum(self.window[k]) / len(self.window[k])
        if self._f:
            self._f.write(json.dumps({"step": step, **{k: float(v) for k, v in metrics.items()}}) + "\n")
            self._f.flush()
        return averaged

    def close(self) -> None:
        if self._f:
            self._f.close()
