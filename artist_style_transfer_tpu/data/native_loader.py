"""ctypes bindings for the native (C++) JPEG decode + resample thread pool.

Builds ``native/libastloader.so`` on first use (g++ + libjpeg-turbo, both in
the image) and exposes:

- :func:`decode_batch` — parallel decode+resize of JPEG paths straight into
  one pinned float32 NHWC buffer (the reference decodes serially via
  cv2.imread, dataset.py:93-101)
- :func:`resample` — single-image resample (parity testing)

Falls back to None (callers use the cv2 path) if the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libastloader.so"))

MODE_RESIZE = 0  # cv2.resize INTER_LINEAR semantics
MODE_RESCALE = 1  # reference affine rescale semantics (dataset.py:36-52)

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            src = os.path.join(os.path.dirname(_LIB_PATH), "dataloader.cpp")
            if not os.path.exists(src):
                return None
            try:
                subprocess.run(
                    ["make", "-C", os.path.dirname(_LIB_PATH)],
                    check=True,
                    capture_output=True,
                )
            except (subprocess.CalledProcessError, FileNotFoundError):
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.ast_decode_batch.restype = ctypes.c_int
        lib.ast_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
        ]
        lib.ast_resample.restype = None
        lib.ast_resample.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(
    paths: list[str],
    height: int,
    width: int,
    mode: int = MODE_RESIZE,
    num_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode+resample JPEGs in parallel -> ((N,H,W,3) f32 BGR, (N,) ok mask)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (build failed or no toolchain)")
    n = len(paths)
    out = np.zeros((n, height, width, 3), np.float32)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.ast_decode_batch(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height,
        width,
        mode,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        num_threads,
    )
    return out, ok.astype(bool)


def resample(image_bgr_u8: np.ndarray, height: int, width: int, mode: int = MODE_RESIZE) -> np.ndarray:
    """Resample one HWC BGR uint8 image -> (H,W,3) f32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    src = np.ascontiguousarray(image_bgr_u8, np.uint8)
    out = np.zeros((height, width, 3), np.float32)
    lib.ast_resample(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        src.shape[0],
        src.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height,
        width,
        mode,
    )
    return out
