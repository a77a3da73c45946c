"""Observability: per-stage timers + jax.profiler trace hooks.

The reference has no tracing/profiling (SURVEY.md §5 — timestamps via
logging only). This module provides the framework's instrumentation:

- StageTimer: named wall-clock accumulators with device-sync points,
  reporting per-stage ms and throughput;
- trace(): context manager around jax.profiler for on-demand TPU traces;
- annotate(): TraceAnnotation passthrough for profiler timelines.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


def sync(tree) -> None:
    """Force completion of a pytree of device arrays (remote-transport safe:
    reads one element back rather than trusting block_until_ready)."""
    import jax

    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]


class StageTimer:
    """Accumulates wall time per named stage.

    >>> t = StageTimer()
    >>> with t.stage("detect") as s:
    ...     s["result"] = detect_fn(...)   # synced on exit: device time,
    >>> t.report()                         # not just dispatch time
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.items: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0, sync_result: bool = True):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            if sync_result and "result" in holder:
                sync(holder["result"])
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1
            self.items[name] += items

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, total in self.totals.items():
            n = self.counts[name]
            entry = {"total_s": round(total, 4), "calls": n,
                     "ms_per_call": round(total / n * 1000, 3)}
            if self.items[name]:
                entry["items_per_s"] = round(self.items[name] / total, 2)
            out[name] = entry
        return out

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
        self.items.clear()


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace around a region (viewable in TensorBoard/XProf).

    No-op when log_dir is None, so call sites can leave the hook in place.
    """
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)
