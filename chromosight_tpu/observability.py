"""Tracing and per-stage timing.

The reference ships no profiling beyond a progress bar (SURVEY §5).  Here:

* ``stage(name)`` - context manager recording wall time per pipeline stage;
  a summary is printed on exit when CHROMOSIGHT_TPU_TIMINGS=1.
* ``maybe_trace(path)`` - wraps a block in ``jax.profiler.trace`` when
  CHROMOSIGHT_TPU_PROFILE=<dir> is set, producing TensorBoard-compatible
  device traces.
"""

from __future__ import annotations

import atexit
import os
import sys
import threading
import time
from collections import defaultdict
from contextlib import contextmanager

_STAGE_TOTALS = defaultdict(float)
_STAGE_COUNTS = defaultdict(int)
_BYTE_TOTALS = defaultdict(int)
_ENABLED = os.environ.get("CHROMOSIGHT_TPU_TIMINGS", "") not in ("", "0")
# stages/bytes are recorded from worker threads too (prefetcher, tile
# dispatch pool, mesh host tails); += on a dict slot is not atomic
_LOCK = threading.Lock()


def add_bytes(channel, n):
    """Account bytes crossing the host<->device link (upload/download), so
    benchmarks can attribute link time = bytes / measured bandwidth even
    when transfers are enqueued asynchronously."""
    with _LOCK:
        _BYTE_TOTALS[channel] += int(n)


def snapshot():
    """(stage_totals, stage_counts, byte_totals) copies for benchmarks."""
    return dict(_STAGE_TOTALS), dict(_STAGE_COUNTS), dict(_BYTE_TOTALS)


def reset():
    """Clear accumulated stage and byte counters."""
    _STAGE_TOTALS.clear()
    _STAGE_COUNTS.clear()
    _BYTE_TOTALS.clear()


@contextmanager
def stage(name):
    """Accumulate wall-clock time for a named pipeline stage."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _LOCK:
            _STAGE_TOTALS[name] += dt
            _STAGE_COUNTS[name] += 1


def report(file=None):
    file = file or sys.stderr
    if not _STAGE_TOTALS:
        return
    file.write("\n-- chromosight-tpu stage timings --\n")
    for name, total in sorted(
        _STAGE_TOTALS.items(), key=lambda kv: -kv[1]
    ):
        file.write(
            f"  {name:<28} {total:8.3f}s  ({_STAGE_COUNTS[name]} calls)\n"
        )


if _ENABLED:
    atexit.register(report)


@contextmanager
def maybe_trace():
    """Enable a jax profiler trace when CHROMOSIGHT_TPU_PROFILE is set."""
    trace_dir = os.environ.get("CHROMOSIGHT_TPU_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
