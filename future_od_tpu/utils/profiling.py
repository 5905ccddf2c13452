"""Profiling/tracing helpers.

The reference's only instrumentation is a CUDA-event timer around AP
aggregation (od_map.py:336-351). TPU-native equivalents: jax.profiler traces
(viewable in XProf/TensorBoard), named trace annotations for the hot regions,
and a host-side step timer with device synchronization.

NOTE: on the axon backend jax.block_until_ready can return before execution
finishes; `sync()` therefore materializes a leaf to host, which is the
reliable barrier on every backend.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, Optional

import numpy as np

import jax


def sync(tree: Any) -> None:
    """Reliable device barrier: materialize one element of one leaf."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(jax.device_get(jax.tree.leaves(tree)[0]))


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation  # with annotate("region"): ...


class StepTimer:
    """Running per-step wall-clock stats with device sync."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result_tree_getter=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def timed(self, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        sync(out)
        self.times.append(time.perf_counter() - t0)
        return out

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "steps": len(arr),
        }
