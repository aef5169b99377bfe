"""Micro-batching stylization server (ROADMAP item 6: the serving path).

The reference has no serving story — ``inference.py`` is a run-once script
(inference.py:1-166). Production TPU serving wants the opposite shape:
a long-lived process that keeps the compiled executable warm, coalesces
concurrent requests into MXU-sized batches, and keeps host<->device I/O
uint8. This module provides that as a dependency-free building block:

- :class:`StylizeServer` — a background-thread micro-batcher. ``submit()``
  returns a ``concurrent.futures.Future``; the worker groups queued
  requests by exact (H, W) — one jit compilation per distinct shape, same
  policy as :func:`stylize_batched` (padding would shift instance-norm
  statistics) — and runs them through the jitted ``stylize`` in batches of
  up to ``max_batch``, waiting at most ``max_wait_ms`` to fill a batch.
- uint8 in, uint8 out: the cast to f32 happens on-device (see
  :func:`stylize`), so each request moves 1 byte/channel each way.

The jit cache (plus the on-disk XLA compilation cache enabled by
``utils.cache.enable_compilation_cache``) means a restarted server reuses
previous compilations.
"""

from __future__ import annotations

import collections
import threading
import time
from concurrent.futures import Future

import jax.numpy as jnp
import numpy as np

from artist_style_transfer_tpu.infer.stylize import stylize


class StylizeServer:
    """Background micro-batching wrapper around the jitted stylize path.

    Thread-safe; ``submit`` may be called from any number of threads.
    """

    def __init__(self, params, max_batch: int = 8, max_wait_ms: float = 3.0):
        self._params = params
        self._max_batch = int(max_batch)
        self._max_wait_s = float(max_wait_ms) / 1e3
        self._lock = threading.Condition()
        # (H, W) -> deque of (image, future); insertion order preserved for
        # FIFO fairness across shapes via _order.
        self._pending: dict[tuple[int, int], collections.deque] = {}
        self._order: collections.deque[tuple[int, int]] = collections.deque()
        self._closed = False
        self.stats = {"batches": 0, "images": 0}
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, image_bgr_uint8: np.ndarray) -> Future:
        """Queue one HWC BGR uint8 image; resolves to the stylized uint8 HWC."""
        if image_bgr_uint8.ndim != 3 or image_bgr_uint8.shape[-1] != 3:
            raise ValueError(f"expected HWC BGR image, got {image_bgr_uint8.shape}")
        fut: Future = Future()
        key = (image_bgr_uint8.shape[0], image_bgr_uint8.shape[1])
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
            self._pending.setdefault(key, collections.deque()).append(
                (image_bgr_uint8, fut)
            )
            self._order.append(key)
            self._lock.notify()
        return fut

    def close(self, timeout: float | None = 10.0) -> None:
        """Drain the queue, then stop the worker."""
        with self._lock:
            self._closed = True
            self._lock.notify()
        self._worker.join(timeout)

    # ------------------------------------------------------------------

    def _take_batch(self):
        """Wait for work; return (key, [(image, future), ...]) or None when done.

        Takes the oldest pending shape, then waits up to ``max_wait_s`` for
        the batch to fill with same-shape requests before dispatching.
        """
        with self._lock:
            while not self._order and not self._closed:
                self._lock.wait()
            if not self._order:
                return None  # closed and drained
            key = self._order[0]
            deadline = time.monotonic() + self._max_wait_s
            while (
                len(self._pending.get(key, ())) < self._max_batch
                and not self._closed
            ):
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not self._lock.wait(timeout=remaining):
                    break
            q = self._pending.get(key, collections.deque())
            batch = [q.popleft() for _ in range(min(self._max_batch, len(q)))]
            # drop consumed entries of this shape from the FIFO order
            taken = 0
            kept = collections.deque()
            for k in self._order:
                if k == key and taken < len(batch):
                    taken += 1
                else:
                    kept.append(k)
            self._order = kept
            if not q:
                self._pending.pop(key, None)
            return key, batch

    def _run(self):
        while True:
            item = self._take_batch()
            if item is None:
                return
            _, batch = item
            images = np.stack([im for im, _ in batch])
            try:
                out = np.asarray(stylize(self._params, jnp.asarray(images)))
            except Exception as e:  # propagate compile/device failures per-request
                for _, fut in batch:
                    fut.set_exception(e)
                continue
            self.stats["batches"] += 1
            self.stats["images"] += len(batch)
            for i, (_, fut) in enumerate(batch):
                fut.set_result(out[i])
