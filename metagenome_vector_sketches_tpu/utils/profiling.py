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


def marginal_time(run_chain, reps: int = 8, rounds: int = 3,
                  band: bool = False):
    """Median-of-`rounds` marginal per-iteration time of a data-dependent
    chain ending in one host read (excludes dispatch/transfer latency; the
    median is robust to the tunneled chip's latency spikes in either the
    1-iteration or the n-iteration wall). With band=True also returns the
    min/median/max drift band so regressions are attributable against the
    tunnel's run-to-run drift. `run_chain(n)` must run n chained
    iterations and return wall seconds. THE canonical marginal-timing
    harness — bench.py and the scale benchmarks all use this one so a
    methodology change lands everywhere at once."""
    import numpy as np
    run_chain(1)  # warm-up / compile
    margins = []
    for _ in range(rounds):
        d1 = run_chain(1)
        dn = run_chain(reps)
        margins.append((dn - d1) / (reps - 1))
    good = [m for m in margins if m > 0] or margins
    med = float(np.median(good))
    if not band:
        return med
    return med, {"min_ms": round(min(good) * 1e3, 3),
                 "median_ms": round(med * 1e3, 3),
                 "max_ms": round(max(good) * 1e3, 3)}


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
