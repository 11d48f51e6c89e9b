"""Profiling and tracing — first-class, unlike the reference.

The reference only measures wall-clock FPS at inference
(/root/reference/inference.py:313-324) and imports-but-never-uses
torch.profiler / DeviceStatsMonitor (generation.py:13,
multiclass_training_folds.py:29).  Here:

- ``trace(logdir)``: context manager around ``jax.profiler`` producing
  TensorBoard-viewable traces of the jitted steps (XLA ops, Pallas kernels,
  host/device overlap).
- ``step_timer``: lightweight device-synced step timing with percentile
  summaries, for per-step logging without a full trace.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    import jax

    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class step_timer:
    """Collects device-synced step durations; ``summary()`` gives
    mean/p50/p90/max in milliseconds."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self):
        if not self.times:
            return {}
        arr = np.array(self.times) * 1e3
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean()),
            "p50_ms": float(np.percentile(arr, 50)),
            "p90_ms": float(np.percentile(arr, 90)),
            "max_ms": float(arr.max()),
        }
