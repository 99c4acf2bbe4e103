"""Profiling/tracing hooks (SURVEY §5: the reference has only gettime around
the worker loop; here: jax.profiler traces + simple phase timers)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """Capture a jax.profiler trace when ``log_dir`` is set (CLI --profile)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class PhaseTimer:
    """Accumulates wall time per phase (feed / h2d / scan / decode)."""

    def __init__(self):
        self.acc: dict[str, float] = defaultdict(float)
        self.n: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.acc[name] += time.perf_counter() - t0
            self.n[name] += 1

    def render(self) -> str:
        return " ".join(
            f"{k}={v:.3f}s/{self.n[k]}" for k, v in sorted(self.acc.items())
        )
