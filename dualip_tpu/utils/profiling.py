"""Profiling / tracing hooks.

The reference had no profiler integration — timing was wall-clock
``time.perf_counter`` around ``maximize`` (reference
``run_matching_benchmark.py:105-107``; SURVEY.md §5).  The TPU build adds
``jax.profiler`` trace capture plus a phase timer whose records the
benchmarks and AGD's ``collect_stats`` share.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a ``jax.profiler`` device trace viewable in TensorBoard/xprof.

    >>> with trace("/tmp/dualip-trace"):
    ...     solver.maximize(objective, lam0)
    """
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock phase accumulation: ``with timer.phase("build"): ...``."""

    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def report(self, prefix: str = "") -> str:
        return " | ".join(f"{prefix}{k}={v:.2f}s" for k, v in self.phases.items())


def annotate(name: str):
    """Named-scope annotation that shows up in profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)
