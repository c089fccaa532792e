"""Tracing and per-stage timing.

The reference has no observability beyond wall-clock prints in its benchmark
(benchmark.cc:52-85).  Here:

* :class:`StageTimers` — lightweight named accumulators for pipeline stages
  (split/predict/entropy/serialize/transfer), reportable as a dict;
* :func:`trace` — context manager around ``jax.profiler`` emitting an XLA
  trace viewable in TensorBoard/Perfetto (set FPV_TPU_TRACE_DIR or pass a
  path);
* :func:`annotate` — named TraceAnnotation scope so host-side stages show up
  alongside device ops in the trace.
"""

from __future__ import annotations

import collections
import contextlib
import os
import time


class StageTimers:
    """Accumulating wall-clock timers keyed by stage name."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = collections.defaultdict(float)
        self.counts: dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": round(v, 6), "calls": self.counts[k],
                "mean_ms": round(1000 * v / max(self.counts[k], 1), 3)}
            for k, v in sorted(self.totals.items())
        }

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Capture a device+host profile trace (TensorBoard/Perfetto format).

    No-op if profiling is unavailable on the current backend.
    """
    log_dir = log_dir or os.environ.get("FPV_TPU_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


@contextlib.contextmanager
def annotate(name: str):
    """Named scope visible in profiler traces (host + device timeline).

    Only TraceAnnotation CONSTRUCTION is guarded (profiler may be absent);
    exceptions raised inside the caller's scope must propagate untouched —
    wrapping the yield in except would swallow them and yield twice
    ("generator didn't stop after throw()")."""
    import jax

    entered = False
    try:
        ann = jax.profiler.TraceAnnotation(name)
        ann.__enter__()
        entered = True
    except Exception:
        pass
    try:
        yield
    finally:
        if entered:
            try:
                ann.__exit__(None, None, None)
            except Exception:
                pass
