"""Profiling: named phase scopes + wall-clock / XLA-trace profilers.

Covers the reference's profiler hierarchy (src/utils/profiler.py:42-283 —
PassThrough / Simple wall-time / cProfile / torch-autograd) with TPU-native
backends: every phase is wrapped both in a host wall-clock timer and a
`jax.profiler.TraceAnnotation`, so phases show up in TensorBoard/XProf traces
captured via `trace_to(...)`. The `record_function` name is kept so call
sites read like the reference's
(MultiviewMatcher.py:137,153,319,347 record_function scopes).
"""

from __future__ import annotations

import cProfile
import contextlib
import io
import pstats
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PassThroughProfiler:
    """No-op profiler (the default)."""

    @contextlib.contextmanager
    def record_function(self, name: str):
        with jax.profiler.TraceAnnotation(name):
            yield

    def summary(self) -> str:
        return ""


class SimpleProfiler(PassThroughProfiler):
    """Accumulates wall-clock per named action. Note: JAX dispatch is async —
    wrap the timed region's results in jax.block_until_ready for true device
    time, or use trace_to() for an XLA-level profile."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def record_function(self, name: str):
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> str:
        lines = ["action              | total s  | calls | mean ms"]
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:<20}| {t:8.3f} | {c:5d} | {t / c * 1e3:7.2f}")
        return "\n".join(lines)


class AdvancedProfiler(PassThroughProfiler):
    """cProfile per action (host-side Python cost)."""

    def __init__(self):
        self.profilers: Dict[str, cProfile.Profile] = {}

    @contextlib.contextmanager
    def record_function(self, name: str):
        prof = self.profilers.setdefault(name, cProfile.Profile())
        prof.enable()
        try:
            yield
        finally:
            prof.disable()

    def summary(self) -> str:
        out = io.StringIO()
        for name, prof in self.profilers.items():
            out.write(f"==== {name} ====\n")
            pstats.Stats(prof, stream=out).sort_stats("cumulative").print_stats(12)
        return out.getvalue()


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture an XLA/XProf device trace (open with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def get_profiler(kind: Optional[str]):
    if kind in (None, "", "pass", "passthrough"):
        return PassThroughProfiler()
    if kind == "simple":
        return SimpleProfiler()
    if kind == "advanced":
        return AdvancedProfiler()
    raise ValueError(kind)
