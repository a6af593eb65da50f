"""Profiling & observability — the apex.pyprof equivalent.

The reference ships a 3-stage GPU profiler: NVTX monkey-patching of
every torch op with call stack + shapes, nvprof SQLite parsing, and
per-op FLOP/bandwidth analysis (reference apex/apex/pyprof/README.md:1-40,
nvtx/nvmarker.py:67-105, prof/blas.py). GHOST itself only prints
wall-clock (reference inference.py:94,124, train.py:411).

The TPU-native stack:
  * `trace(logdir)` — context manager over jax.profiler, producing
    xprof/TensorBoard traces (kernel timeline, HLO cost analysis, HBM
    bandwidth — what pyprof derived by hand comes from XLA directly);
  * `annotate(name)` — TraceAnnotation (the NVTX range equivalent) that
    labels host spans and shows up inside device traces;
  * `StageTimer` — per-pipeline-stage wall-clock aggregation with
    frames/sec reporting (the measured analogue of the reference's
    printed "Total time"/"batch_time");
  * `flop_estimate(fn, *args)` — XLA's own cost analysis per compiled
    program (FLOPs + bytes accessed), replacing pyprof's per-op tables.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Callable, Dict

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ghost_tpu_trace"):
    """Capture an xprof trace of everything inside the context."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in device traces (NVTX range equivalent)."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulates wall time + item counts per named stage."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.items: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0, block_on: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.items[name] += items

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            t = self.totals[name]
            line = f"{name:24s} {t:8.3f}s  x{self.counts[name]}"
            if self.items[name]:
                line += f"  {self.items[name] / t:9.1f} items/s"
            lines.append(line)
        return "\n".join(lines)


def flop_estimate(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """XLA cost analysis of the compiled program for fn(*args)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
    }
