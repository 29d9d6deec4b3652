"""Tracing / profiling helpers.

The reference's observability is wall-clock timing in its bench tools plus a
dedicated profiling branch (SURVEY.md §5). The TPU equivalents:

  - :func:`trace` — context manager around ``jax.profiler`` writing an xprof
    trace viewable in TensorBoard/xprof.
  - :class:`BlockTimer` — the per-block percentile harness used by the bench
    tools (reference: tools/bench_a2_fast.cpp:99-163 percentile protocol),
    with the value-fetch synchronization this backend requires.
  - :func:`compiled_stats` — bytes-accessed / FLOPs / memory figures from
    XLA's cost analysis for a jitted function (what we used to find the
    lane-padding traffic blowup; see docs/performance.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with profiling.trace('/tmp/xprof'): ...``"""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(y) -> float:
    """Force real device completion via a tiny value fetch (this sandbox's
    axon backend ignores block_until_ready; see docs/performance.md)."""
    import jax.numpy as jnp

    return float(jnp.sum(y.ravel()[0]))


class BlockTimer:
    """Collects per-block wall times; reports the reference's percentile set
    {min, p50, p99, p99.9, max, mean} plus real-time factor."""

    def __init__(self, deadline_s: float):
        self.deadline_s = deadline_s
        self.times: List[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def stats(self) -> Dict[str, float]:
        t = np.asarray(self.times)
        s = {
            "min": float(t.min()),
            "p50": float(np.percentile(t, 50)),
            "p99": float(np.percentile(t, 99)),
            "p99.9": float(np.percentile(t, 99.9)),
            "max": float(t.max()),
            "mean": float(t.mean()),
        }
        s["rtf"] = self.deadline_s / s["p50"] if s["p50"] > 0 else float("inf")
        return s


def compiled_stats(jitted_fn, *args) -> Dict[str, Any]:
    """Lower+compile a jitted function and return XLA's cost/memory analysis."""
    compiled = jitted_fn.lower(*args).compile()
    cost = compiled.cost_analysis() or {}
    mem = compiled.memory_analysis()
    return {
        "bytes_accessed": cost.get("bytes accessed"),
        "flops": cost.get("flops"),
        "temp_bytes": getattr(mem, "temp_size_in_bytes", None),
        "argument_bytes": getattr(mem, "argument_size_in_bytes", None),
        "output_bytes": getattr(mem, "output_size_in_bytes", None),
        "generated_code_bytes": getattr(mem, "generated_code_size_in_bytes", None),
    }
