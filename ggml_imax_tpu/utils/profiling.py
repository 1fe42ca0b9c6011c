"""Tracing / profiling — the GGML_PERF counter analog.

Reference (SURVEY §5): per-tensor perf_runs/cycles/time_us (ggml.h:589-592)
printed by ggml_graph_print; per-phase timers in whisper (whisper.cpp:
790-803); graphviz dump ggml_graph_dump_dot.

TPU-native:
- `trace(logdir)`: wraps jax.profiler — captures an XPlane trace viewable
  in TensorBoard/XProf (per-op device timing, the test-backend-ops
  MODE_PERF analog at full fidelity).
- `GraphTimers`: named host-side wall timers with a ggml_graph_print-style
  report (whisper-style per-phase accounting).
- `dump_hlo(fn, *args)`: the ggml_graph_dump_dot analog — returns the
  optimized HLO text of a jitted computation for inspection.
- `annotate(name)`: TraceAnnotation context; names show up in the profile.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile into logdir (jax.profiler)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class GraphTimers:
    """Accumulating named wall timers (whisper.cpp:790-803 style)."""

    def __init__(self):
        self.total_us = defaultdict(float)
        self.runs = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync=None):
        """Time a block; pass sync=array to block_until_ready before stop."""
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.total_us[name] += (time.perf_counter() - t0) * 1e6
        self.runs[name] += 1

    def report(self) -> str:
        """ggml_graph_print-style per-section summary."""
        lines = ["perf (per section):"]
        for name in self.total_us:
            us = self.total_us[name]
            n = self.runs[name]
            lines.append(f"  {name:<24} {n:>6} runs  {us/1e3:>10.2f} ms total"
                         f"  {us/max(1,n)/1e3:>8.3f} ms/run")
        return "\n".join(lines)


def dump_hlo(fn, *args, optimized: bool = True) -> str:
    """Compiled-graph dump (ggml_graph_dump_dot analog): returns HLO text."""
    lowered = jax.jit(fn).lower(*args)
    if optimized:
        return lowered.compile().as_text()
    return lowered.as_text()


def memory_stats() -> dict:
    """ggml_used_mem / buffer-size reporting analog: per-device live bytes."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {"bytes_in_use": s.get("bytes_in_use"),
                           "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                           "bytes_limit": s.get("bytes_limit")}
        except Exception:
            out[str(d)] = None
    return out
