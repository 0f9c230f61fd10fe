"""Profiling / tracing hooks (SURVEY.md SS6 tracing row).

The reference only wall-clock-prints t_comp/t_data; here:
- `trace(logdir)` context captures a jax.profiler trace (TensorBoard/Perfetto
  viewable) around any region — train steps, input pipeline, sampler.
- `annotate(name)` adds named TraceAnnotations visible in the trace timeline.
- `timed(fn)` returns a block_until_ready-bracketed wall-time wrapper for
  honest step timing (used by bench.py and the CLI's imgs/sec metric).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def timed(fn: Callable) -> Callable:
    """Returns wrapped(*a, **k) -> (result, seconds) with device sync."""

    def wrapped(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        jax.block_until_ready(out)
        return out, time.perf_counter() - t0

    return wrapped
