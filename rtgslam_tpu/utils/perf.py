"""Host-side span profiling for the dispatch/sync evidence trail.

The reference times coarse tracker/mapper stages with wall clocks
(``utils/monitor.py``); for a TPU pipeline the interesting quantities are
finer: how many device dispatches each stage issues and where the host
blocks on the device.  Spans wrap each call site that dispatches or
fetches; the report shows per-stage call counts and wall time, which on a
latency-bound link (this environment's tunneled device) directly exposes
round-trip hotspots.

Enable with ``RTG_PERF=1``; ``report()`` returns a dict, ``dump()`` writes
JSON.  Disabled spans cost one branch.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from contextlib import contextmanager

ENABLED = bool(int(os.environ.get("RTG_PERF", "0")))

_stats = defaultdict(list)  # name -> [dt, dt, ...] seconds


@contextmanager
def span(name: str):
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _stats[name].append(time.perf_counter() - t0)


def count(name: str, dt: float = 0.0) -> None:
    if ENABLED:
        _stats[name].append(dt)


def report() -> dict:
    """Per-span count / total / mean / MEDIAN.  The tunnel wedges for
    30-60 s sporadically (CLAUDE.md), so medians carry the signal; means
    are kept for the reference's accounting rule."""
    out = {}
    for k, v in sorted(_stats.items()):
        n = len(v)
        sv = sorted(v)
        med = sv[n // 2] if n % 2 else 0.5 * (sv[n // 2 - 1] + sv[n // 2])
        out[k] = {"count": n, "total_s": round(sum(v), 4),
                  "mean_ms": round(sum(v) / n * 1e3, 3) if n else 0.0,
                  "median_ms": round(med * 1e3, 3) if n else 0.0}
    return out


def reset() -> None:
    _stats.clear()


@contextmanager
def device_trace():
    """Optional XLA-level trace: ``RTG_TRACE=<dir>`` wraps the run in
    ``jax.profiler.trace`` (TensorBoard/xprof-readable).  Complements the
    host spans above with per-executable timelines; degrades to a warning
    if the backend's profiler is unavailable.  No-op when unset."""
    trace_dir = os.environ.get("RTG_TRACE", "")
    if not trace_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(trace_dir)
        started = True
    except Exception as e:       # pragma: no cover - profiler availability
        print(f"[perf] jax.profiler trace unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:   # pragma: no cover
                print(f"[perf] jax.profiler stop failed: {e}")


def dump(path: str) -> None:
    with open(path, "w") as f:
        json.dump(report(), f, indent=2)
