"""Streaming content pipeline: per-host sharded file reads for corpora > HBM.

``train(content_stream=...)`` takes any callable ``epoch -> iterable of
host-local (B, H, W, 3) BGR [0,255] batches``; this module provides the
standard implementation over a directory of images (the reference's
``images/content/``, dataset.py:90-111, but decoded batch-by-batch instead
of materialized up front):

- Deterministic (seed, epoch) shuffle of the SAME global file list on every
  host, so all processes agree on which files form each global batch
  (SURVEY §5: restart reproduces the data order).
- Each process decodes only its own ``global_batch / process_count`` slice
  of every batch (per-host sharded reads — no host reads the whole corpus);
  ``data.prefetch.device_prefetch`` assembles the slices into global arrays
  on a multi-process mesh.
- Decode uses the native C++ thread-pool loader with per-file cv2 fallback
  (same policy as ``get_content_dataset``).
"""

from __future__ import annotations

import os

import numpy as np


def content_file_stream(
    content_dir: str,
    batch_size: int,
    rescale_height: int,
    rescale_width: int,
    *,
    content_data_size: int | None = None,
    seed: int = 2,
    _procs: tuple[int, int] | None = None,
):
    """Build a ``train(content_stream=...)`` callable over a directory.

    ``batch_size`` is the GLOBAL batch; with N processes each yields its
    ``batch_size / N`` host-local slice (N must divide it). A final ragged
    global batch is kept (reference train_cnn.py:170) when N divides it,
    else dropped with a warning — a ragged batch that splits unevenly
    across hosts cannot form a valid global array.

    ``_procs=(num, index)`` overrides ``jax.process_count/index`` (tests).
    Files that fail BOTH decoders raise: hosts pick rows from the shared
    file list by position, so silently skipping a file on one host would
    desynchronize the global batches.
    """
    files = sorted(os.listdir(content_dir))
    if content_data_size is not None:
        # Match get_content_dataset's corpus cap AFTER the seeded shuffle so
        # the subset drawn for a given seed is stable across epochs.
        first = np.random.default_rng(np.array([seed], np.uint64)).permutation(len(files))
        files = [files[i] for i in first[:content_data_size]]
    paths = [os.path.join(content_dir, f) for f in files]
    if not paths:
        raise ValueError(f"no files in {content_dir!r}")

    if _procs is None:
        import jax

        nproc, pid = jax.process_count(), jax.process_index()
    else:
        nproc, pid = _procs
    if batch_size % nproc:
        raise ValueError(f"batch_size={batch_size} not divisible by {nproc} processes")
    host_batch = batch_size // nproc

    def _decode(batch_paths: list[str]) -> np.ndarray:
        from artist_style_transfer_tpu.data import native_loader
        from artist_style_transfer_tpu.data.datasets import _cv2_fallback_decode

        images: list[np.ndarray | None] = [None] * len(batch_paths)
        if native_loader.available():
            out, ok = native_loader.decode_batch(
                batch_paths, rescale_height, rescale_width, native_loader.MODE_RESIZE
            )
            for j, good in enumerate(ok):
                if good:
                    images[j] = out[j]
        for j, im in enumerate(images):
            if im is None:
                im = _cv2_fallback_decode(
                    batch_paths[j], rescale_height, rescale_width, rescale=False
                )
                if im is None:
                    raise RuntimeError(
                        f"undecodable content file {batch_paths[j]!r}: streaming "
                        "hosts index a shared file list, so a skip would "
                        "desynchronize the global batch"
                    )
                images[j] = im
        return np.stack(images).astype(np.float32)

    n = len(paths)
    tail = n % batch_size
    keep_tail = tail != 0 and tail % nproc == 0
    if tail and not keep_tail:
        import warnings

        warnings.warn(
            f"dropping ragged final batch of {tail} (not divisible by "
            f"{nproc} processes)",
            stacklevel=2,
        )

    def stream(epoch: int):
        order = np.random.default_rng(
            np.array([seed, epoch], np.uint64)
        ).permutation(n)
        for s in range(0, n - tail, batch_size):
            idx = order[s : s + batch_size]
            local = idx[pid * host_batch : (pid + 1) * host_batch]
            yield _decode([paths[i] for i in local])
        if keep_tail:
            idx = order[n - tail :]
            per = tail // nproc
            local = idx[pid * per : (pid + 1) * per]
            yield _decode([paths[i] for i in local])

    return stream
