"""Host-side dataset builders mirroring the reference ``dataset.py`` API.

Conventions: all loaders return **NHWC, BGR, [0,255]** numpy float32 (or
uint8 for caches) — the framework's canonical image format. The reference's
NCHW float64 tensors (dataset.py:108, :228) are replaced by the TPU-native
layout; callers receive plain numpy and move data on-device once.

Public functions mirror dataset.py's signatures:
- ``get_content_dataset(size, rescale_height, rescale_width)``  (dataset.py:90-111)
- ``get_painting_dataset(for_classifier, ...)``                 (dataset.py:120-229)
- ``get_avg_dataset(rescale_height, rescale_width)``            (dataset.py:56-87)
- ``rescale_image`` / ``get_rescale_dims``                      (dataset.py:16-52)
"""

from __future__ import annotations

import os
import pickle
import random as _random
from typing import Iterable

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in this environment
    cv2 = None

ARCHIVE_DIR = "images/archive/"
CONTENT_DIR = "images/content/"
CACHE_DIR = "dicts/"  # also where the reference's full_int_*.pkl caches live


def _require_cv2():
    if cv2 is None:
        raise RuntimeError("OpenCV is required for host-side image decode")


def load_artist_names(archive_dir: str = ARCHIVE_DIR) -> tuple[list[str], list[int]]:
    """Artist names (spaces -> underscores) + painting counts from artists.csv.

    Reference dataset.py:122-127. Uses the csv module (no pandas dependency
    in the hot path).
    """
    import csv

    names, counts = [], []
    with open(os.path.join(archive_dir, "artists.csv"), newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f):
            names.append(row["name"].replace(" ", "_"))
            counts.append(int(row["paintings"]))
    return names, counts


def get_rescale_dims(
    images_by_artist: dict[str, list[np.ndarray]],
    total_paintings: int,
    rescale_height: int = -1,
    rescale_width: int = -1,
) -> tuple[int, int]:
    """Target dims: as given, else half the corpus-average dims (dataset.py:16-33)."""
    if rescale_width > 0 and rescale_height > 0:
        return rescale_height, rescale_width
    avg_h = avg_w = 0.0
    for images in images_by_artist.values():
        for im in images:
            avg_h += im.shape[0] / total_paintings
            avg_w += im.shape[1] / total_paintings
    return int(avg_h) // 2, int(avg_w) // 2


def rescale_image(image: np.ndarray, target_height: int, target_width: int) -> np.ndarray:
    """Centered anisotropic affine rescale — reference ``rescale`` (dataset.py:36-52).

    Host-side (cv2.warpAffine); the jit-compilable equivalent is
    :func:`artist_style_transfer_tpu.ops.image.affine_rescale` (tested equal).
    """
    _require_cv2()
    src_h, src_w = image.shape[0], image.shape[1]
    h_s = target_height / src_h
    w_s = target_width / src_w
    M = np.array(
        [
            [w_s, 0.0, target_width / 2 - w_s * src_w / 2],
            [0.0, h_s, target_height / 2 - h_s * src_h / 2],
        ],
        dtype=np.float64,
    )
    return cv2.warpAffine(image, M, (target_width, target_height))


def _iter_content_files(content_dir: str) -> list[str]:
    return sorted(os.listdir(content_dir))


def _cv2_fallback_decode(
    path: str, target_height: int, target_width: int, rescale: bool
) -> np.ndarray | None:
    """Per-file fallback for images the native decoder rejects.

    The native libjpeg path only accepts 3-component decodes; cv2.imread
    additionally converts CMYK/YCCK JPEGs (and non-JPEG formats) to BGR, so
    falling back per-file keeps the corpus composition identical to the
    cv2/reference path (ADVICE r1).
    """
    if cv2 is None:
        return None
    im = cv2.imread(path)
    if im is None:
        return None
    if rescale:
        return rescale_image(im, target_height, target_width).astype(np.float32)
    return cv2.resize(im, (target_width, target_height)).astype(np.float32)


def get_content_dataset(
    size: int,
    rescale_height: int,
    rescale_width: int,
    content_dir: str = CONTENT_DIR,
    seed: int | None = None,
) -> np.ndarray:
    """Up to ``size`` content JPEGs, shuffled, resized: (N, H, W, 3) BGR f32 [0,255].

    Reference dataset.py:90-111 (which builds an NCHW f64 TensorDataset with
    dummy labels; we return just the images — labels there are all-zero
    padding). Unreadable files are skipped (dataset.py:98-99). The shuffle
    uses ``seed`` for deterministic restarts (SURVEY §5 failure recovery);
    ``None`` uses Python's global RNG like the reference.
    """
    files = _iter_content_files(content_dir)
    rng = _random.Random(seed) if seed is not None else _random
    rng.shuffle(files)
    paths = [os.path.join(content_dir, f) for f in files]

    # Fast path: the native thread-pool decoder (C++/libjpeg-turbo).
    from artist_style_transfer_tpu.data import native_loader

    if native_loader.available():
        collected: list[np.ndarray] = []
        i = 0
        while len(collected) < size and i < len(paths):
            chunk = paths[i : i + (size - len(collected))]
            i += len(chunk)
            out, ok = native_loader.decode_batch(
                chunk, rescale_height, rescale_width, native_loader.MODE_RESIZE
            )
            for j, path in enumerate(chunk):
                if ok[j]:
                    collected.append(out[j])
                else:
                    im = _cv2_fallback_decode(
                        path, rescale_height, rescale_width, rescale=False
                    )
                    if im is not None:
                        collected.append(im)
        if collected:
            return np.stack(collected)[:size]
        # fall through to cv2 (e.g. no decodable files at all)

    _require_cv2()
    images = np.zeros((size, rescale_height, rescale_width, 3), np.float32)
    count = 0
    for path in paths:
        im = cv2.imread(path)
        if im is None:
            continue
        # Reference passes (h, w) where cv2 expects (w, h) (dataset.py:101);
        # harmless for the square sizes train() uses, and we keep the correct
        # order here.
        images[count] = cv2.resize(im, (rescale_width, rescale_height)).astype(np.float32)
        count += 1
        if count >= size:
            break
    if count < size:
        images = images[:count]
    return images


def _load_reference_pickles(cache_dir: str) -> dict[str, list[np.ndarray]] | None:
    """Load the reference's full_int_*.pkl caches if present (dataset.py:190-193)."""
    if not os.path.isdir(cache_dir):
        return None
    files = [f for f in sorted(os.listdir(cache_dir)) if "full_int" in f]
    if not files:
        return None
    dataset: dict[str, list[np.ndarray]] = {}
    for fname in files:
        with open(os.path.join(cache_dir, fname), "rb") as f:
            dataset.update(pickle.load(f))
    return dataset


def _decode_paintings(
    names: Iterable[str],
    counts: Iterable[int],
    archive_dir: str,
    use_resized: bool,
    wordy: bool,
) -> dict[str, list[np.ndarray]]:
    """Decode the Kaggle corpus JPEGs (dataset.py:135-164), BGR uint8 HWC."""
    _require_cv2()
    dataset: dict[str, list[np.ndarray]] = {}
    for name, num in zip(names, counts):
        dataset[name] = []
        if use_resized:
            paths = [
                os.path.join(archive_dir, "resized/resized", f"{name}_{i}.jpg")
                for i in range(1, num + 1)
            ]
        else:
            d = os.path.join(archive_dir, "images/images", name)
            paths = [os.path.join(d, f) for f in sorted(os.listdir(d))] if os.path.isdir(d) else []
        for p in paths:
            im = cv2.imread(p)
            if im is None:
                continue
            dataset[name].append(im)
        if wordy:
            print(f"{name}: {len(dataset[name])} paintings")
    return dataset


def get_painting_dataset(
    for_classifier: bool = True,
    rescale_height: int = -1,
    rescale_width: int = -1,
    use_resized: bool = True,
    save_pickle: bool = False,
    load_pickle: bool = True,
    wordy: bool = False,
    archive_dir: str = ARCHIVE_DIR,
    cache_dir: str = CACHE_DIR,
):
    """Painting corpus, mirroring reference ``get_painting_dataset`` (dataset.py:120).

    ``for_classifier=False``: dict artist -> (n_i, H, W, 3) float32 BGR
    [0,255] array (rescaled to a single static shape — jit-friendly, as the
    reference also does at dataset.py:224-228).

    ``for_classifier=True``: (images, labels) arrays, images RGB [0,1]
    torchvision-normalized NHWC, labels int32 artist indices
    (dataset.py:201-221).

    Cache strategy: ``save_pickle``/``load_pickle`` keep the reference's
    parameter names (dataset.py:120-121) but drive a single
    ``paintings_cache.npz`` replacing the 6-pickle scheme; the reference's
    ``full_int_*.pkl`` files are still read as a fallback when present.
    """
    # Reference classifier-cache fast path (dataset.py:183-188): prebuilt
    # normalized tensors + labels, stored NCHW; converted to this
    # framework's canonical NHWC on load.
    if for_classifier and load_pickle:
        in_path = os.path.join(cache_dir, "in_tensors.npz")
        out_path = os.path.join(cache_dir, "out_tensors.npz")
        if os.path.exists(in_path) and os.path.exists(out_path):
            ins = np.load(in_path)["arr_0"]
            outs = np.load(out_path)["arr_0"]
            if wordy:
                print("Loaded!")  # dataset.py:187
            return (
                np.ascontiguousarray(ins.transpose(0, 2, 3, 1)).astype(np.float32),
                np.asarray(outs, np.int32),
            )

    names, counts = load_artist_names(archive_dir)

    npz_path = os.path.join(cache_dir, "paintings_cache.npz")
    dataset: dict[str, list[np.ndarray]] | None = None
    rescaled: dict[str, np.ndarray] | None = None
    if load_pickle and os.path.exists(npz_path):
        z = np.load(npz_path, allow_pickle=False)
        loaded_names = [str(n) for n in z["names"]]
        offsets = z["offsets"]
        images = z["images"]
        ch, cw = int(images.shape[1]), int(images.shape[2])
        want_h = rescale_height if rescale_height > 0 else ch
        want_w = rescale_width if rescale_width > 0 else cw
        if (want_h, want_w) == (ch, cw):
            # The npz stores ALREADY-rescaled images at their final training
            # shape (unlike the reference's full_int pickles, which hold the
            # raw corpus). Reuse directly: feeding them back through
            # get_rescale_dims' default avg//2 rule would halve them again on
            # every round trip, and even a dims-matched reload would pay a
            # full-corpus identity cv2.warpAffine for nothing.
            rescaled = {
                n: images[offsets[i]: offsets[i + 1]].astype(np.float32)
                for i, n in enumerate(loaded_names)
            }
            th, tw = ch, cw
        else:
            # Explicit dims differing from the cached shape: re-rescale from
            # the cached images (lossy vs the raw corpus, but cache-consistent).
            dataset = {
                n: list(images[offsets[i]: offsets[i + 1]])
                for i, n in enumerate(loaded_names)
            }
        if wordy:
            print("Loaded npz cache!")
    elif load_pickle:
        dataset = _load_reference_pickles(cache_dir)
        if dataset is not None and wordy:
            print("Loaded reference pickle cache!")
    if dataset is None and rescaled is None:
        from artist_style_transfer_tpu.data import native_loader

        if (
            use_resized
            and rescale_height > 0
            and rescale_width > 0
            and native_loader.available()
        ):
            # Native fast path: decode + centered affine rescale in one
            # multithreaded pass, straight to the static training shape.
            th, tw = rescale_height, rescale_width
            rescaled = {}
            for name, num in zip(names, counts):
                paths = [
                    os.path.join(archive_dir, "resized/resized", f"{name}_{i}.jpg")
                    for i in range(1, num + 1)
                ]
                out, ok = native_loader.decode_batch(paths, th, tw, native_loader.MODE_RESCALE)
                imgs = []
                for j, path in enumerate(paths):
                    if ok[j]:
                        imgs.append(out[j])
                    else:
                        im = _cv2_fallback_decode(path, th, tw, rescale=True)
                        if im is not None:
                            imgs.append(im)
                rescaled[name] = (
                    np.stack(imgs) if imgs else np.zeros((0, th, tw, 3), np.float32)
                )
        else:
            dataset = _decode_paintings(names, counts, archive_dir, use_resized, wordy)

    if rescaled is None:
        total = sum(len(v) for v in dataset.values())
        th, tw = get_rescale_dims(dataset, total, rescale_height, rescale_width)
        rescaled = {}
        for artist, imgs in dataset.items():
            if len(imgs) == 0:
                rescaled[artist] = np.zeros((0, th, tw, 3), np.float32)
                continue
            out = np.stack([rescale_image(im, th, tw) for im in imgs]).astype(np.float32)
            rescaled[artist] = out

    if save_pickle:
        os.makedirs(cache_dir, exist_ok=True)
        arrs, offs, ns = [], [0], []
        for n in names:
            if n in rescaled:
                arrs.append(rescaled[n].astype(np.uint8))
                offs.append(offs[-1] + len(rescaled[n]))
                ns.append(n)
        np.savez_compressed(
            npz_path,
            images=np.concatenate(arrs) if arrs else np.zeros((0, th, tw, 3), np.uint8),
            offsets=np.array(offs, np.int64),
            names=np.array(ns),
        )
        if wordy:
            print("Saved npz cache!")

    if not for_classifier:
        return rescaled

    from artist_style_transfer_tpu.ops.image import (
        TORCHVISION_MEAN_RGB,
        TORCHVISION_STD_RGB,
    )

    imgs_list, labels = [], []
    for i, n in enumerate(names):
        arr = rescaled.get(n)
        if arr is None or len(arr) == 0:
            continue
        imgs_list.append(arr)
        labels.extend([i] * len(arr))
    images = np.concatenate(imgs_list) if imgs_list else np.zeros((0, th, tw, 3), np.float32)
    images = images[..., ::-1] / 255.0  # BGR -> RGB, [0,1]
    images = (images - np.asarray(TORCHVISION_MEAN_RGB, np.float32)) / np.asarray(
        TORCHVISION_STD_RGB, np.float32
    )
    return images.astype(np.float32), np.asarray(labels, np.int32)


def get_avg_dataset(
    rescale_height: int = -1,
    rescale_width: int = -1,
    wordy: bool = False,
    archive_dir: str = ARCHIVE_DIR,
    cache_dir: str = CACHE_DIR,
) -> dict[str, np.ndarray]:
    """Per-artist mean image (the 'average'-mode style target, dataset.py:56-87).

    Returns dict artist -> (H, W, 3) float32 BGR [0,255]. Matches the
    reference's pixel-space average of affine-rescaled paintings, including
    its float->uint8 truncation (dataset.py:84).
    """
    paintings = get_painting_dataset(
        for_classifier=False,
        rescale_height=rescale_height,
        rescale_width=rescale_width,
        archive_dir=archive_dir,
        cache_dir=cache_dir,
        wordy=wordy,
    )
    return {
        artist: arr.mean(axis=0).astype(np.uint8).astype(np.float32)
        for artist, arr in paintings.items()
        if len(arr)
    }
