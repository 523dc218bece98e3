"""Tracing / profiling subsystem (SURVEY §5: the reference includes
<chrono> but never times anything; its only runtime visibility is the
per-frame progress line). Here: named stage timers aggregated per run,
optional JAX profiler traces for xprof, and JSONL emission."""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path


class StageTimers:
    """Accumulates wall-clock per named stage; cheap enough to leave on."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000.0 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in sorted(self.totals)
        }

    def dump(self, path) -> None:
        Path(path).write_text(json.dumps(self.summary(), indent=2))


@contextlib.contextmanager
def jax_trace(log_dir: str | None):
    """xprof-compatible device trace around a region (jax.profiler).
    No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named xprof annotation (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
