"""Profiling helpers (the reference has only wall-clock prints, SURVEY.md §5):
jax.profiler trace capture plus simple named stage timers."""

from __future__ import annotations

import contextlib
import time

from .log import log


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimers:
    """Accumulating named wall-clock spans; report() prints a summary."""

    def __init__(self):
        self.totals: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> None:
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            log(f"  {name}: {total:.3f} s")
