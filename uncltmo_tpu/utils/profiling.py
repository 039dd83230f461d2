"""Tracing / profiling / numerics-debugging utilities.

The reference has no profiler (only ad-hoc time.time() spans,
`test_imageTMO.py:43,55`) and uses `torch.autograd.detect_anomaly()` as a
per-step NaN sanitizer (`GanTrainer.py:179`).  TPU-native equivalents:

  * `trace(name)` — jax.profiler TraceAnnotation context for device
    timelines (view with TensorBoard / xprof via `start_trace`);
  * `timed(fn)` — block_until_ready wall-clock harness;
  * `enable_anomaly_detection()` — jax debug_nans/debug_infs (the
    detect_anomaly analog: raises at the primitive that produced the
    first non-finite value);
  * `checked(fn)` — checkify wrapper surfacing NaN/OOB errors from jitted
    code with locations.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Optional

import jax


def trace(name: str):
    """Named device-trace span."""
    return jax.profiler.TraceAnnotation(name)


def start_trace(log_dir: str) -> None:
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


@contextlib.contextmanager
def traced_to(log_dir: Optional[str]):
    """Trace the enclosed block to log_dir (no-op if log_dir is falsy)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 10,
          **kwargs) -> float:
    """Mean wall-clock seconds per call, with device sync."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def enable_anomaly_detection(enable: bool = True) -> None:
    """NaN/Inf sanitizer (the `autograd.detect_anomaly()` analog)."""
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


def checked(fn: Callable) -> Callable:
    """checkify-wrapped fn that raises on NaN / division / OOB errors."""
    from jax.experimental import checkify

    checked_fn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks)

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
