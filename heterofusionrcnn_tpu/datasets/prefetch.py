"""Background input prefetching.

The reference loaded batches synchronously inside the train loop
(trainer.py:179 create_feed_dict) — the known input bottleneck (SURVEY.md
§3.1). This wraps any `next_batch` callable with a worker thread pool and a
bounded queue so host-side decoding (cv2, numpy sampling, RoI noise loops)
overlaps device steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable


class BatchPrefetcher:
    """Bounded-queue prefetcher: `next()` returns batches in order."""

    def __init__(
        self,
        next_batch: Callable[[], dict],
        capacity: int = 4,
        num_threads: int = 1,
        transform: Callable = None,
    ):
        # NOTE: num_threads > 1 requires next_batch to be thread-safe; the
        # KittiDataset epoch state is not, so per-dataset use one thread and
        # scale with processes/hosts instead.
        # `transform` runs in the worker thread on each produced batch —
        # the trainer passes the device_put/shard step here so the
        # host->device upload overlaps the previous device step (on slow
        # transports the upload otherwise serializes with compute).
        if transform is not None:
            base = next_batch
            next_batch = lambda: transform(base())  # noqa: E731
        self._next_batch = next_batch
        self._queue: queue.Queue = queue.Queue(maxsize=capacity)
        self._stop = threading.Event()
        self._error = None
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(num_threads)
        ]
        for t in self._threads:
            t.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = self._next_batch()
            except Exception as e:  # propagate to the consumer
                self._error = e
                self._queue.put(None)
                return
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def next(self) -> dict:
        item = self._queue.get()
        if item is None and self._error is not None:
            raise self._error
        return item

    __call__ = next

    def close(self):
        self._stop.set()
        # Drain so workers blocked on put() can exit.
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
