"""Tracing / profiling helpers (SURVEY.md §5.1).

The reference had no in-repo profiling (Caffe layer timers at best); the
rebuild exposes jax.profiler traces (Perfetto-compatible) plus wall-clock
stage timers that use a HOST FETCH as the execution fence — on this TPU
terminal ``block_until_ready`` returns before execution finishes, so timing
code must pull a scalar to the host.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp

from vdetlib_tpu.utils.log import get_logger

log = get_logger("profiling")


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str] = None):
    """Capture a jax.profiler trace (view with Perfetto / TensorBoard).

    No-op when trace_dir is None — callers can leave the hook in place.
    """
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("trace written to %s", trace_dir)


def fence(tree) -> float:
    """Force execution of a pytree of device arrays; returns a checksum.

    Sums every leaf to a scalar ON DEVICE and fetches it — the only reliable
    execution fence on backends where block_until_ready is asynchronous.
    """
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    total = sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves)
    return float(total)


@contextlib.contextmanager
def stage_timer(name: str, sink: Optional[dict] = None):
    """Wall-clock a stage; the caller must fence device work inside."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    log.info("%s: %.1f ms", name, dt * 1e3)
    if sink is not None:
        sink[name] = dt


def timed_fenced(name: str, fn, *args, reps: int = 1, sink: Optional[dict] = None):
    """Run fn(*args) reps times, fencing each; returns (result, best_seconds)."""
    result = fn(*args)
    fence(result)  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        result = fn(*args)
        fence(result)
        best = min(best, time.perf_counter() - t0)
    log.info("%s: %.1f ms (best of %d)", name, best * 1e3, reps)
    if sink is not None:
        sink[name] = best
    return result, best
