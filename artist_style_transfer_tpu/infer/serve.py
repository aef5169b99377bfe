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
import logging
import os
import threading
import time
from concurrent.futures import Future, InvalidStateError

import jax.numpy as jnp
import numpy as np

from artist_style_transfer_tpu.infer.stylize import stylize, stylize_int8


def _is_quantized(params) -> bool:
    """Quantized pytrees (models/transformer_q.py) carry a 'stem' entry;
    regular transformer params keep the stem inside 'encoder'."""
    return isinstance(params, dict) and "stem" in params


def _apply_params(params, images: "jnp.ndarray") -> np.ndarray:
    fn = stylize_int8 if _is_quantized(params) else stylize
    return np.asarray(fn(params, images))


class ModelRegistry:
    """Thread-safe name -> transformer-params registry with hot-reload.

    Multi-tenant serving keeps every artist/method model resident (a
    trained net is ~3.4 MB of params — hundreds fit in HBM) and swaps a
    model's weights atomically when its checkpoint file changes on disk,
    without restarting the server or dropping in-flight requests: a batch
    dispatched before the swap finishes with the old params; the next
    batch picks up the new ones. Compiled executables are keyed by shape,
    not by weights, so a reload never triggers a recompile.

    Files: ``.pth`` (reference checkpoint layout, train_cnn.py:383-390,
    via ``utils.torch_import``) or ``.npz`` (this framework's export).
    """

    def __init__(self, auto_reload: bool = False, quantize: bool = False,
                 calib_images: np.ndarray | None = None):
        """``quantize=True`` converts every loaded model to the int8-MXU
        serving pytree (models/transformer_q.py; ~1.4x throughput at ~64 dB
        PSNR vs the parity path). ``calib_images`` (NHWC BGR [0,255])
        supplies activation-scale calibration content; defaults to fixed
        synthetic images — safe here because every quantized conv feeds an
        InstanceNorm, so miscalibration can only cost rounding, never bias
        (tests/test_quant.py measures random-calibration quality)."""
        self._lock = threading.Lock()
        # name -> (params, path | None, mtime | None)
        self._models: dict[str, tuple[object, str | None, float | None]] = {}
        self._auto = bool(auto_reload)
        self._quantize = bool(quantize)
        self._calib = calib_images

    def _maybe_quantize(self, params):
        if not self._quantize or _is_quantized(params):
            return params
        from artist_style_transfer_tpu.models.transformer_q import (
            quantize_transformer,
        )

        calib = self._calib
        if calib is None:
            calib = np.random.default_rng(0).random((2, 256, 256, 3)) * 255
        return quantize_transformer(params, jnp.asarray(calib, jnp.float32))

    def _load(self, path: str):
        from artist_style_transfer_tpu.infer.stylize import load_transfer_params

        return self._maybe_quantize(load_transfer_params(path))

    def register(self, name: str, params=None, *, path: str | None = None) -> None:
        """Add (or replace) a model, from in-memory params or a checkpoint file."""
        if (params is None) == (path is None):
            raise ValueError("pass exactly one of params= or path=")
        mtime = None
        if path is not None:
            params = self._load(path)
            mtime = os.stat(path).st_mtime
        else:
            params = self._maybe_quantize(params)
        with self._lock:
            self._models[name] = (params, path, mtime)

    def unregister(self, name: str) -> None:
        with self._lock:
            self._models.pop(name, None)

    def names(self) -> list[str]:
        with self._lock:
            return sorted(self._models)

    def __contains__(self, name: str) -> bool:
        with self._lock:
            return name in self._models

    def get(self, name: str):
        """Current params for ``name`` (auto-reloading if enabled)."""
        if self._auto:
            self.reload(name)
        with self._lock:
            if name not in self._models:
                raise KeyError(f"model {name!r} is not registered")
            return self._models[name][0]

    def reload(self, name: str, force: bool = False) -> bool:
        """Re-read the model's file if its mtime changed (or ``force``).

        Returns True when new weights were swapped in. No-op for models
        registered from in-memory params. A stat/load failure (file briefly
        missing or half-written while a trainer rewrites it) keeps the
        current weights serving and returns False — live traffic must not
        fail on a transient checkpoint race; the next reload retries.
        """
        with self._lock:
            entry = self._models.get(name)
        if entry is None or entry[1] is None:
            return False
        _, path, old_mtime = entry
        try:
            mtime = os.stat(path).st_mtime
            if not force and mtime == old_mtime:
                return False
            params = self._load(path)
        except Exception as e:
            logging.getLogger(__name__).warning(
                "reload of %r from %s failed (keeping current weights): %s",
                name, path, e,
            )
            return False
        with self._lock:
            self._models[name] = (params, path, mtime)
        return True


class StylizeServer:
    """Background micro-batching wrapper around the jitted stylize path.

    Thread-safe; ``submit`` may be called from any number of threads.

    Single-tenant: ``StylizeServer(params)``; every request uses the one
    model. Multi-tenant: ``StylizeServer(registry=reg)``; each request
    names its model and batches form per (model, H, W) — models hot-swap
    through :class:`ModelRegistry` without touching the server.

    ``apply_fn(params, images) -> np.ndarray`` overrides the model call —
    any per-image jitted pipeline batches through the same coalescing
    machinery (the HTTP ``/v1/classify`` endpoint rides this with the int8
    classifier: every request is a 256x256 crop, so ALL concurrent
    classify traffic coalesces into single MXU batches).
    """

    def __init__(self, params=None, max_batch: int = 8, max_wait_ms: float = 3.0,
                 registry: ModelRegistry | None = None, apply_fn=None):
        if (params is None) == (registry is None):
            raise ValueError("pass exactly one of params= or registry=")
        self._params = params
        self._registry = registry
        self._apply = apply_fn if apply_fn is not None else _apply_params
        self._max_batch = int(max_batch)
        self._max_wait_s = float(max_wait_ms) / 1e3
        self._lock = threading.Condition()
        # (model, H, W) -> deque of (image, future); insertion order
        # preserved for FIFO fairness across keys via _order.
        self._pending: dict[tuple, collections.deque] = {}
        self._order: collections.deque[tuple] = collections.deque()
        self._closed = False
        self.stats = {"batches": 0, "images": 0}
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, image_bgr_uint8: np.ndarray, model: str | None = None) -> Future:
        """Queue one HWC BGR uint8 image; resolves to the stylized uint8 HWC.

        ``model`` names a registry entry (required in multi-tenant mode,
        rejected in single-tenant mode).
        """
        if image_bgr_uint8.ndim != 3 or image_bgr_uint8.shape[-1] != 3:
            raise ValueError(f"expected HWC BGR image, got {image_bgr_uint8.shape}")
        if self._registry is not None:
            if model is None:
                raise ValueError("multi-tenant server: submit(..., model=...) required")
            if model not in self._registry:
                raise KeyError(f"model {model!r} is not registered")
        elif model is not None:
            raise ValueError("single-tenant server does not take model=")
        fut: Future = Future()
        key = (model, image_bgr_uint8.shape[0], image_bgr_uint8.shape[1])
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
            key, batch = item
            # A caller that timed out may have cancelled its future while it
            # was still queued; transition survivors to RUNNING (which also
            # blocks further cancellation) and drop the cancelled ones —
            # resolving a cancelled future raises InvalidStateError, which
            # must never kill the worker.
            batch = [
                (im, fut) for im, fut in batch if fut.set_running_or_notify_cancel()
            ]
            if not batch:
                continue
            images = np.stack([im for im, _ in batch])
            try:
                params = (
                    self._params
                    if self._registry is None
                    else self._registry.get(key[0])
                )
                out = self._apply(params, jnp.asarray(images))
            except Exception as e:  # propagate compile/device failures per-request
                for _, fut in batch:
                    try:
                        fut.set_exception(e)
                    except InvalidStateError:
                        pass
                continue
            self.stats["batches"] += 1
            self.stats["images"] += len(batch)
            for i, (_, fut) in enumerate(batch):
                try:
                    fut.set_result(out[i])
                except InvalidStateError:
                    pass
