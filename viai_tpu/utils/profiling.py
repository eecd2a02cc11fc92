"""Tracing/profiling + debug-mode guards.

Reference capability (SURVEY.md §5.1/§5.2): the reference has no
profiler and no sanitizers; the rebuild adds
  * jax.profiler trace capture around train/infer steps,
  * a step timer with EMA throughput,
  * a debug mode that enables jax NaN-checking and chex assertions
    (jit-purity is the race detector on TPU — there is no shared
    mutable state to race on inside a compiled step).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_mode():
    """NaN checks + disabled fusion-unsafe optimizations for debugging.

    Expensive: every primitive output is checked for NaNs; use on the
    CPU-runnable config (SURVEY.md §4) when chasing loss blowups.
    """
    jax.config.update("jax_debug_nans", True)


def disable_debug_mode():
    jax.config.update("jax_debug_nans", False)


class StepTimer:
    """EMA step-time / throughput tracker for the train loop."""

    def __init__(self, ema: float = 0.98):
        self.ema = ema
        self.avg = None
        self._t = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        dt = None
        if self._t is not None:
            dt = now - self._t
            self.avg = (
                dt if self.avg is None
                else self.ema * self.avg + (1 - self.ema) * dt
            )
        self._t = now
        return dt

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.avg if self.avg else 0.0
