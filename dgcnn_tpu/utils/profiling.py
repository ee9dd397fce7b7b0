"""Tracing / profiling hooks (SURVEY.md §5: the reference has none — only a
notebook ``!gpustat``; the rebuild ships first-class observability)."""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """clouds/sec meter with exponential smoothing; the per-epoch rate the
    BASELINE.json north-star is measured in."""

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self.rate: Optional[float] = None
        self._t: Optional[float] = None

    def start(self) -> None:
        self._t = time.perf_counter()

    def tick(self, items: int) -> float:
        now = time.perf_counter()
        if self._t is None:
            self._t = now
            return 0.0
        dt = max(now - self._t, 1e-9)
        self._t = now
        inst = items / dt
        self.rate = (inst if self.rate is None
                     else self.smoothing * self.rate
                     + (1 - self.smoothing) * inst)
        return self.rate


def enable_nan_debugging() -> None:
    """jax_debug_nans: fail fast at the op that produced a NaN — the rebuild's
    answer to the reference's absent sanitizers (SURVEY.md §5)."""
    import jax

    jax.config.update("jax_debug_nans", True)
