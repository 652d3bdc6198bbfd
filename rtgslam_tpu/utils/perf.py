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

_stats = defaultdict(lambda: [0, 0.0])  # name -> [count, total_s]


@contextmanager
def span(name: str):
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        s = _stats[name]
        s[0] += 1
        s[1] += time.perf_counter() - t0


def count(name: str, dt: float = 0.0) -> None:
    if ENABLED:
        s = _stats[name]
        s[0] += 1
        s[1] += dt


def report() -> dict:
    return {
        k: {"count": v[0], "total_s": round(v[1], 4),
            "mean_ms": round(v[1] / v[0] * 1e3, 3) if v[0] else 0.0}
        for k, v in sorted(_stats.items())
    }


def reset() -> None:
    _stats.clear()


def dump(path: str) -> None:
    with open(path, "w") as f:
        json.dump(report(), f, indent=2)
