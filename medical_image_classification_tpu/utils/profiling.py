"""Profiling helpers: jax.profiler traces + step timing.

The reference has no profiler integration (SURVEY §5 tracing note — only
analytic FLOP counts and wall-clock prints).  Here: one context manager for
TensorBoard-compatible device traces plus the analytic models in
``utils/flops.py`` and the relay-safe timer in ``utils/timing.py``.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str = "runs/profile") -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock + ETA logging (fusion-train style, `CrossMamba/train.py:138-161`)."""

    def __init__(self, total_steps: int):
        self.total = total_steps
        self.start = time.time()
        self.done = 0

    def step(self, n: int = 1) -> str:
        self.done += n
        elapsed = time.time() - self.start
        rate = self.done / max(elapsed, 1e-9)
        eta = (self.total - self.done) / max(rate, 1e-9)
        return f"{self.done}/{self.total} ({rate:.2f} it/s, ETA {eta:.0f}s)"
