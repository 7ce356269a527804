"""Profiling / tracing hooks (SURVEY.md section 5.1: the reference has
only wall-clock iter timing; we add first-class device tracing).

- `trace(logdir)` context: captures a jax.profiler trace viewable in
  TensorBoard / Perfetto.
- `StepTimer`: wall-clock iter/data timing identical to the reference's
  train-loop probes (train.py:175-199), plus per-step device sync.
- `annotate`: TraceAnnotation for named regions inside a step.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Tracks data/step wall time and an exponential moving average."""

    def __init__(self, ema: float = 0.98):
        self.ema = ema
        self.data_time = 0.0
        self.step_time = 0.0
        self._avg_data: Optional[float] = None
        self._avg_step: Optional[float] = None
        self._t = time.perf_counter()

    def mark_data(self):
        now = time.perf_counter()
        self.data_time = now - self._t
        self._t = now

    def mark_step(self, block_on=None):
        if block_on is not None:
            import jax

            jax.block_until_ready(block_on)
        now = time.perf_counter()
        self.step_time = now - self._t
        self._t = now
        for attr, v in (("_avg_data", self.data_time),
                        ("_avg_step", self.step_time)):
            prev = getattr(self, attr)
            setattr(self, attr, v if prev is None
                    else self.ema * prev + (1 - self.ema) * v)

    def summary(self) -> Dict[str, float]:
        return {
            "time": self._avg_step or self.step_time,
            "data_time": self._avg_data or self.data_time,
        }
