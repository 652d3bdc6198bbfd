"""Run-time performance recorder (reference ``utils/monitor.py``).

Tracks running means/maxima of named timers, derives the reference's FPS
accounting rule ``fps = 1 / mean(mapping time)`` and writes
``performance.json``.  Optionally samples device memory via
``jax.local_devices()[0].memory_stats()``.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Optional


class Recorder:
    def __init__(self, device_index: int = 0, record_mem: bool = False):
        self.device_index = device_index
        self.record_mem = record_mem
        self.mean_dict: Dict[str, float] = defaultdict(float)
        self.count_dict: Dict[str, int] = defaultdict(int)
        self.max_dict: Dict[str, float] = defaultdict(float)
        self.extra: Dict[str, float] = {}

    def update_mean(self, name: str, value: float, count: int = 1) -> None:
        total = self.mean_dict[name] * self.count_dict[name] + value * count
        self.count_dict[name] += count
        self.mean_dict[name] = total / max(self.count_dict[name], 1)

    def update_max(self, name: str, value: float) -> None:
        self.max_dict[name] = max(self.max_dict[name], value)

    @contextmanager
    def time_block(self, name: str):
        start = time.time()
        yield
        self.update_mean(name, time.time() - start, 1)

    def watch_memory(self) -> Optional[float]:
        """Record current device memory-in-use in GiB, when available."""
        try:
            import jax

            stats = jax.local_devices()[self.device_index].memory_stats()
            used = stats.get("bytes_in_use", 0) / (1024 ** 3)
            self.update_max("device_mem_gib", used)
            return used
        except Exception:
            return None

    def cal_fps(self) -> float:
        mapping = self.mean_dict.get("mapping", 0.0)
        fps = 1.0 / mapping if mapping > 0 else 0.0
        self.extra["fps"] = fps
        return fps

    def save(self, save_path: str, name: str = "performance.json") -> None:
        os.makedirs(save_path, exist_ok=True)
        payload = {
            "mean": dict(self.mean_dict),
            "count": dict(self.count_dict),
            "max": dict(self.max_dict),
            **self.extra,
        }
        with open(os.path.join(save_path, name), "w") as f:
            json.dump(payload, f, indent=2)
