"""Profiling helpers: per-stage wall clock (report contract) + jax.profiler traces.

The reference's only tracing is perf_counter elapsed_ms in stage reports
(SURVEY.md §5); tpufem keeps that contract (pipeline.reports.timed) and adds
device-side tracing: `trace(path)` wraps jax.profiler for TensorBoard-viewable
traces of the solver/training hot loops, and `solver_stats` standardizes the
iteration-count telemetry every solve emits.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: Path | str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates named wall-clock spans; `report()` gives the elapsed_ms dict
    embedded into StepReport.extra."""

    def __init__(self):
        self.spans: dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + (time.perf_counter() - t0) * 1e3

    def report(self) -> dict[str, float]:
        return {f"{k}_ms": round(v, 3) for k, v in self.spans.items()}


def solver_stats(iters: int, rel_residual: float, converged: bool, elapsed_s: float | None = None) -> dict:
    out = {"iters": int(iters), "rel_residual": float(rel_residual), "converged": bool(converged)}
    if elapsed_s is not None:
        out["elapsed_s"] = round(elapsed_s, 4)
        out["iters_per_s"] = round(iters / max(elapsed_s, 1e-9), 1)
    return out
