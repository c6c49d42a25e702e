"""Tracing / profiling utilities (SURVEY §5 tracing parity and beyond).

The reference only records per-iteration CUDA-event times into
TensorBoard (`/root/reference/train.py:44-45,72,119,184`). Here:
- `StepTimer`: wall-time EMA per step + steps/sec (the `iter_time`
  scalar), logged by the Trainer;
- `trace()`: a context manager around `jax.profiler` emitting a
  Perfetto/XPlane trace directory for deep TPU analysis;
- `device_memory_stats()`: live HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class StepTimer:
    def __init__(self, ema: float = 0.6):
        self._ema = ema
        self.iter_time = None  # EMA seconds/step
        self._last = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.iter_time = (
                dt if self.iter_time is None
                else self._ema * self.iter_time + (1 - self._ema) * dt
            )
        self._last = now
        return self.iter_time

    @property
    def steps_per_sec(self) -> Optional[float]:
        return None if not self.iter_time else 1.0 / self.iter_time


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with Perfetto / TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
