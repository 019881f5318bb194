"""Stage timing utilities (reference: kernels/timing.rs ScopeTimer :32-74
and the [STAGE] prints in pipelines, SURVEY.md §5).

On TPU per-op timing lives in jax.profiler traces; this module keeps the
host-visible stage-print UX the reference examples have.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from contextlib import contextmanager


class ScopeTimer:
    """Accumulates labeled wall-time; print_scope() dumps the breakdown."""

    def __init__(self):
        self.acc: OrderedDict[str, float] = OrderedDict()

    @contextmanager
    def scope(self, label: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.acc[label] = self.acc.get(label, 0.0) + time.perf_counter() - t0

    def print_scope(self, prefix: str = "[STAGE]"):
        total = sum(self.acc.values())
        for label, t in self.acc.items():
            pct = 100.0 * t / total if total else 0.0
            print(f"{prefix} {label}: {t * 1000:.2f} ms ({pct:.1f}%)")
        print(f"{prefix} total: {total * 1000:.2f} ms")


def bench_stats(times_s: list[float]) -> dict:
    """p50/mean/std/min/max summary (sensevoice main.rs:216-245 print set)."""
    import numpy as np

    a = np.asarray(times_s)
    return {
        "mean": float(a.mean()),
        "p50": float(np.median(a)),
        "std": float(a.std()),
        "min": float(a.min()),
        "max": float(a.max()),
    }


def profile_trace(path: str = "/tmp/lele_tpu_trace"):
    """jax.profiler trace context for deep dives (TPU op-level timing)."""
    import jax

    return jax.profiler.trace(path)
