"""Prefetching frame loader: overlap disk I/O + decode with device compute.

The reference decodes each frame synchronously inside the main loop
(``utils/camera_utils.py:22-77`` via PIL).  Here a background worker pool
decodes ahead (cv2 releases the GIL in its C++ codecs), so the SLAM loop
never blocks on JPEG/PNG decode — the host-side analogue of the CUDA
pipeline's async H2D copies.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional

from .camera import Camera, CameraInfo, load_camera


class FrameLoader:
    """Iterate decoded Camera frames with ``prefetch`` frames in flight."""

    def __init__(self, args, infos: List[CameraInfo], prefetch: int = 4,
                 workers: int = 2):
        self.args = args
        self.infos = infos
        self.prefetch = max(prefetch, 1)
        self._results: "queue.Queue[tuple[int, Camera | Exception]]" = queue.Queue()
        self._tasks: "queue.Queue[Optional[int]]" = queue.Queue()
        self._buffer = {}
        self._workers = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(workers, 1))
        ]
        for w in self._workers:
            w.start()

    def _worker(self):
        while True:
            idx = self._tasks.get()
            if idx is None:
                return
            try:
                cam = load_camera(self.args, idx, self.infos[idx])
                self._results.put((idx, cam))
            except Exception as e:  # surfaced at __next__
                self._results.put((idx, e))

    def __len__(self):
        return len(self.infos)

    def __iter__(self) -> Iterator[Camera]:
        n = len(self.infos)
        submitted = 0
        for submitted in range(min(self.prefetch, n)):
            self._tasks.put(submitted)
        submitted = min(self.prefetch, n)

        for want in range(n):
            while want not in self._buffer:
                idx, item = self._results.get()
                self._buffer[idx] = item
            item = self._buffer.pop(want)
            if isinstance(item, Exception):
                raise item
            if submitted < n:
                self._tasks.put(submitted)
                submitted += 1
            yield item

    def close(self):
        for _ in self._workers:
            self._tasks.put(None)
