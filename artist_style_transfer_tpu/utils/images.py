"""Image I/O utilities (reference C9: train_cnn.py:111-134).

The reference's helpers operate on NCHW BGR tensors; these are their NHWC
equivalents with the same observable behavior:

- ``to_image``: (H,W,3)/(1,H,W,3) BGR [0,255] -> (H,W,3) RGB float
  (train_cnn.py:118-124)
- ``save_tensor_image``: clip -> uint8 -> BGR -> imwrite (train_cnn.py:111-113)
- ``imshow_array``: the /255-clip display transform; returns the array the
  reference would hand to plt.imshow (train_cnn.py:128-134) and optionally
  writes it to a file instead of blocking on an interactive window
"""

from __future__ import annotations

import os

import numpy as np


def to_image(tensor_bgr: np.ndarray) -> np.ndarray:
    """BGR HWC/NHWC(1) [0,255] -> RGB HWC float, reference to_image semantics."""
    arr = np.asarray(tensor_bgr)
    if arr.ndim == 4:
        arr = arr[0]
    return arr[..., ::-1].astype(np.float64)


def save_tensor_image(filename: str, tensor_bgr: np.ndarray) -> None:
    """Clip to [0,255], uint8, write with cv2 (reference save_tensor_image)."""
    import cv2

    arr = np.asarray(tensor_bgr)
    if arr.ndim == 4:
        arr = arr[0]
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    cv2.imwrite(filename, np.clip(arr, 0, 255).astype(np.uint8))


def imshow_array(img_rgb_255: np.ndarray, out_path: str | None = None, title: str | None = None):
    """[0,255] RGB -> [0,1] clipped display array; optionally save a figure.

    The reference's imshow blocks the training loop on plt.pause
    (train_cnn.py:134); here display is a file write.
    """
    disp = np.clip(np.asarray(img_rgb_255) / 255.0, 0.0, 1.0)
    if out_path is not None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        plt.imshow(disp)
        if title:
            plt.title(title)
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        fig.savefig(out_path)
        plt.close(fig)
    return disp
