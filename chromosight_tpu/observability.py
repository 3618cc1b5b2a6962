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
# Per-program-family compute accounting (MFU / roofline): logical FLOPs
# and HBM-byte bounds, accumulated per dispatch (see account_dispatch).
_FLOP_TOTALS = defaultdict(float)
_HBM_MIN_TOTALS = defaultdict(float)
_HBM_UNFUSED_TOTALS = defaultdict(float)
_DISPATCH_COUNTS = defaultdict(int)
_COST_CACHE = {}
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
    _FLOP_TOTALS.clear()
    _HBM_MIN_TOTALS.clear()
    _HBM_UNFUSED_TOTALS.clear()
    _DISPATCH_COUNTS.clear()


def _arg_sig(x, keep_scalars=False):
    """Cache-key signature of one argument.

    Arrays key on (shape, dtype).  Bare positional ints/floats are
    DROPPED by default: at the instrumented sites those are traced
    scalars (logical row counts, max_dist, thresholds) whose value does
    not change the compiled program's cost — keying on them would
    re-trace once per chromosome.  Kwargs (where the jitted programs
    put their static parameters) keep scalars.
    """
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return ("arr", tuple(x.shape), str(x.dtype))
    if isinstance(x, bool) or x is None or isinstance(x, str):
        return x
    if isinstance(x, (int, float)):
        return x if keep_scalars else ("scalar",)
    if isinstance(x, (tuple, list)):
        return tuple(_arg_sig(v, keep_scalars=True) for v in x)
    if isinstance(x, dict):
        return tuple(
            sorted((k, _arg_sig(v, keep_scalars=True)) for k, v in x.items())
        )
    return repr(x)


def _program_cost(name, jitfn, args, kwargs):
    """(flops, hbm_min_bytes, hbm_unfused_bytes) per dispatch, cached per
    (program, shape signature).

    * ``flops`` — XLA HloCostAnalysis on the UNOPTIMIZED lowering
      (``jitfn.lower(...).cost_analysis()``): logical FLOPs as written,
      no backend compile, no device traffic.  Note the band engine's
      matmuls run precision=HIGHEST, so the MXU executes ~3x these
      logical FLOPs in bf16 passes.
    * ``hbm_min_bytes`` — sum of input + output buffer sizes: the
      speed-of-light HBM traffic a perfectly fused executable would pay.
    * ``hbm_unfused_bytes`` — HloCostAnalysis 'bytes accessed' on the
      unoptimized module: every intermediate counted, i.e. an upper
      bound that ignores fusion.  True traffic lies in between.
    """
    key = (
        name,
        tuple(_arg_sig(a) for a in args),
        _arg_sig(kwargs, keep_scalars=True),
    )
    with _LOCK:
        hit = _COST_CACHE.get(key)
    if hit is not None:
        return hit
    flops = hbm_min = hbm_unfused = 0.0
    try:
        import jax.tree_util as jtu
        import numpy as _np

        lowered = jitfn.lower(*args, **kwargs)
        in_bytes = sum(
            x.dtype.itemsize * x.size
            for x in jtu.tree_leaves(args)
            if hasattr(x, "dtype") and hasattr(x, "size")
        )

        out_bytes = sum(
            x.dtype.itemsize * int(_np.prod(x.shape))
            for x in jtu.tree_leaves(lowered.out_info)
        )
        hbm_min = float(in_bytes + out_bytes)
        ca = lowered.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if not ca or not ca.get("flops"):
            # PJRT plugin backends (axon) may not implement HLO cost
            # analysis — re-lower abstractly for the always-present CPU
            # backend; logical FLOP counts are backend-agnostic.
            import jax
            import jax.tree_util as jtu

            def _abstract(x):
                if hasattr(x, "shape") and hasattr(x, "dtype"):
                    return jax.ShapeDtypeStruct(x.shape, x.dtype)
                return x

            a_args = jtu.tree_map(_abstract, args)
            a_kwargs = jtu.tree_map(_abstract, kwargs)
            with jax.default_device(jax.devices("cpu")[0]):
                ca = jitfn.lower(*a_args, **a_kwargs).cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        hbm_unfused = float(ca.get("bytes accessed", 0.0))
    except Exception:
        pass  # cost accounting is best-effort; never break the dispatch
    cost = (flops, hbm_min, hbm_unfused)
    with _LOCK:
        _COST_CACHE[key] = cost
    return cost


def account_dispatch(name, jitfn, *args, **kwargs):
    """Record the compute cost of one dispatch of a jitted program.

    Call next to the actual dispatch with the same arguments; the cost
    is computed once per shape signature (host-side trace only) and
    accumulated under the program-family ``name``.
    """
    flops, hbm_min, hbm_unfused = _program_cost(name, jitfn, args, kwargs)
    with _LOCK:
        _FLOP_TOTALS[name] += flops
        _HBM_MIN_TOTALS[name] += hbm_min
        _HBM_UNFUSED_TOTALS[name] += hbm_unfused
        _DISPATCH_COUNTS[name] += 1


def compute_snapshot():
    """Per-program-family compute totals for benchmarks / rooflines.

    Returns a dict name -> {flops, hbm_min_bytes, hbm_unfused_bytes,
    dispatches}.
    """
    with _LOCK:
        return {
            name: {
                "flops": _FLOP_TOTALS[name],
                "hbm_min_bytes": _HBM_MIN_TOTALS[name],
                "hbm_unfused_bytes": _HBM_UNFUSED_TOTALS[name],
                "dispatches": _DISPATCH_COUNTS[name],
            }
            for name in _FLOP_TOTALS
        }


def device_peaks():
    """(peak_flops_per_s, peak_hbm_bytes_per_s, label) for the current
    backend, for MFU / bandwidth-utilization reporting.

    TPU v5e (the bench chip): 197 TFLOP/s bf16, 819 GB/s HBM — public
    spec numbers.  Overridable via CHROMOSIGHT_TPU_PEAK_TFLOPS /
    CHROMOSIGHT_TPU_PEAK_HBM_GBPS for other chips.  CPU backends return
    (None, None): no meaningful peak to normalise against.
    """
    import jax

    if jax.default_backend() == "cpu":
        return None, None, "cpu"
    tflops = float(os.environ.get("CHROMOSIGHT_TPU_PEAK_TFLOPS", 197.0))
    gbps = float(os.environ.get("CHROMOSIGHT_TPU_PEAK_HBM_GBPS", 819.0))
    try:
        label = jax.devices()[0].device_kind
    except Exception:
        label = "tpu"
    return tflops * 1e12, gbps * 1e9, label


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
    if _FLOP_TOTALS:
        file.write("-- compute accounting (per program family) --\n")
        for name, flops in sorted(
            _FLOP_TOTALS.items(), key=lambda kv: -kv[1]
        ):
            file.write(
                f"  {name:<28} {flops / 1e12:8.3f} TFLOP  "
                f"{_HBM_MIN_TOTALS[name] / 1e9:8.3f} GB io-min  "
                f"({_DISPATCH_COUNTS[name]} dispatches)\n"
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
