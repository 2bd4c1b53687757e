"""Tracing / profiling hooks — a NEW capability vs the reference (SURVEY §5.1:
the reference has none beyond tqdm/wandb step logging).

Usage:
    with trace("extract", out_dir="traces/"):   # jax.profiler trace
        extractor.extract_files(paths)

    with step_timer() as t: ...                  # wall-clock section timing
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(name: str, out_dir: str = "traces", enabled: Optional[bool] = None) -> Iterator[None]:
    """jax.profiler trace context; enable via arg or HMDT_TRACE=1."""
    if enabled is None:
        enabled = os.environ.get("HMDT_TRACE") == "1"
    if not enabled:
        yield
        return
    import jax

    path = os.path.join(out_dir, name)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield
    print(f"[trace] wrote {path} (view with tensorboard or xprof)")


class step_timer:
    """Accumulating section timer for throughput accounting."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1
        return False

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


def annotate(name: str):
    """jax.profiler.TraceAnnotation wrapper (no-op if profiler unavailable)."""
    try:
        import jax

        return jax.profiler.TraceAnnotation(name)
    except Exception:
        return contextlib.nullcontext()
