"""Async device->host readback service.

Reference analogue: ReadbackManager + the fenced readback path (reference:
BasicRenderer ReadbackManager / CLodStreamingSystem.cpp:1091-1195 — GPU
writes land in a readback heap, a fence fires N frames later, the CPU maps
the buffer without ever stalling the frame). The XLA equivalent: the
device array is produced asynchronously by the dispatched frame;
`copy_to_host_async()` stages the device->host DMA immediately, and the
blocking `np.asarray` materialization runs on a dedicated worker thread —
the render thread never waits on the tunnel/PCIe.

Bounded in-flight depth gives the frames-in-flight backpressure: when
`max_in_flight` readbacks are pending, `request` blocks the caller (the
same stall the reference takes when the CPU outruns its readback ring).
"""

from __future__ import annotations

import threading
from concurrent.futures import Future
from queue import Queue
from typing import Any, Callable, Optional

import numpy as np


def _stage(x):
    """Kick off the device->host DMA without blocking (no-op for hosts/
    numpy; jax.Array grows copy_to_host_async)."""
    try:
        x.copy_to_host_async()
    except (AttributeError, RuntimeError):
        pass
    return x


class ReadbackManager:
    def __init__(self, max_in_flight: int = 3):
        self._q: Queue = Queue()
        self._sem = threading.Semaphore(max_in_flight)
        self._worker: Optional[threading.Thread] = None
        self._closed = False

    def _ensure_worker(self):
        if self._worker is None or not self._worker.is_alive():
            self._worker = threading.Thread(
                target=self._drain, name="readback", daemon=True)
            self._worker.start()

    def _drain(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            fut, value, post = item
            try:
                import jax
                arrs = jax.tree.map(lambda x: np.asarray(x), value)
                fut.set_result(post(arrs) if post else arrs)
            except Exception as e:  # surface through the future
                fut.set_exception(e)
            finally:
                self._sem.release()

    def request(self, value: Any,
                post: Callable[[Any], Any] = None) -> Future:
        """Queue an async fetch of `value` (a device array or pytree).
        Returns a Future resolving to the numpy tree (after `post`, if
        given — runs on the worker). Blocks only when `max_in_flight`
        readbacks are already pending (frames-in-flight backpressure);
        requests resolve strictly in request order."""
        if self._closed:
            raise RuntimeError("ReadbackManager is closed")
        self._sem.acquire()
        import jax
        jax.tree.map(_stage, value)        # stage DMAs before queueing
        fut: Future = Future()
        self._q.put((fut, value, post))
        self._ensure_worker()
        return fut

    def close(self):
        self._closed = True
        if self._worker is not None and self._worker.is_alive():
            self._q.put(None)
            self._worker.join(timeout=5.0)
