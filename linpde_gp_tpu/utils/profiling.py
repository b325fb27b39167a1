"""Per-stage wall-clock metrics and JAX profiler integration.

SURVEY.md §5: the reference has no tracing/profiling; the driver metric
is wall-clock, so the new build ships stage timers (assembly / factorize
/ solve / eval) and an optional ``jax.profiler`` trace context.
"""

from __future__ import annotations

import contextlib
import time


class StageTimer:
    """Accumulating named-stage wall-clock timer."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        self.stages[name] = self.stages.get(name, 0.0) + (
            time.perf_counter() - t0
        )

    def __call__(self, name: str):
        return self.stage(name)

    def summary(self) -> dict[str, float]:
        return {k: round(v, 6) for k, v in self.stages.items()}


@contextlib.contextmanager
def trace(logdir: str | None = None):
    """``jax.profiler`` trace context (no-op when ``logdir`` is None)."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
