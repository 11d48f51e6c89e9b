"""Utilities: profiling/tracing helpers."""

from vivim_tpu.utils.profiling import trace, step_timer

__all__ = ["trace", "step_timer"]
