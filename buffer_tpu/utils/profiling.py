"""Profiling helpers.

The reference's observability is two wall-clock timers
(``utils/timer.py``, printed per iteration).  We keep those
(:mod:`buffer_tpu.utils.logging`) and add optional XLA-level tracing via
``jax.profiler`` — the TPU-native analog of torch profiler/NVTX the
reference lacks (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA profiler trace into ``log_dir`` (viewable with
    xprof/tensorboard); no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named trace span (shows up in the xprof timeline)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Blocking step timer for steady-state device timing."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self):
        import jax
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    @property
    def median(self) -> float:
        s = sorted(self.times)
        return s[len(s) // 2] if s else float("nan")
