"""Profiling / tracing utilities (SURVEY §5 — the reference only prints
wall-clock; here: ``jax.profiler`` trace annotation helpers and a
``block_until_ready`` timing harness for edges/s-style metrics)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import numpy as np

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region in a jax.profiler trace (viewable in XProf)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a device trace into ``logdir`` (open with TensorBoard's
    profile plugin / XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(
    fn: Callable,
    *args,
    iters: int = 20,
    warmup: int = 2,
    work_items: Optional[int] = None,
) -> Dict[str, float]:
    """Median wall-clock of ``fn(*args)`` with ``block_until_ready``
    fencing.  ``work_items`` (e.g. edge count) adds an items/s rate."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    result = {
        "median_s": med,
        "mean_s": float(np.mean(times)),
        "min_s": float(np.min(times)),
        "iters": float(iters),
    }
    if work_items is not None:
        result["items_per_s"] = work_items / med
    return result
