"""Tracing / timing utilities (SURVEY §5: the reference only has an
IterationTimer hook; here we add first-class XLA tracing too)."""

from __future__ import annotations

import contextlib
import logging
import time
from collections import deque
from typing import Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace_context(logdir: str):
    """Capture an XLA profiler trace (viewable in TensorBoard's profile
    plugin / Perfetto) around a code block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("wrote XLA trace to %s", logdir)


class IterationTimer:
    """Rolling iteration/data-time tracker (replaces d2 IterationTimer +
    the data_time metric of trainer.run_step)."""

    def __init__(self, window: int = 20):
        self.iter_times = deque(maxlen=window)
        self.data_times = deque(maxlen=window)
        self._t_start: Optional[float] = None
        self._t_data: Optional[float] = None

    def before_data(self):
        self._t_data = time.perf_counter()

    def after_data(self):
        if self._t_data is not None:
            self.data_times.append(time.perf_counter() - self._t_data)
        self._t_start = time.perf_counter()

    def after_step(self):
        if self._t_start is not None:
            self.iter_times.append(time.perf_counter() - self._t_start)

    @property
    def avg_iter(self) -> float:
        return (sum(self.iter_times) / len(self.iter_times)
                if self.iter_times else 0.0)

    @property
    def avg_data(self) -> float:
        return (sum(self.data_times) / len(self.data_times)
                if self.data_times else 0.0)
