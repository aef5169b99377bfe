"""Image-space ops: colour conversion, normalization, resize, affine rescale, crop.

Replaces the reference's scattered mean-juggling and OpenCV calls with one
canonical, jit-compilable module (reference train_cnn.py:84-134,
dataset.py:36-52, inference.py:56-59). All functions take NHWC or HWC
float32 arrays and are shape-polymorphic under jit (shapes static per trace).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Caffe-style VGG mean, BGR order (reference train_cnn.py:164-165).
CAFFE_BGR_MEAN = (103.939, 116.779, 123.68)

# torchvision ImageNet stats, RGB order (reference inference.py:58-59).
# Note the reference's *training* path has a typo (0.546 for the G mean,
# train_cnn.py:272); we use the correct stats and document the divergence.
TORCHVISION_MEAN_RGB = (0.485, 0.456, 0.406)
TORCHVISION_STD_RGB = (0.229, 0.224, 0.225)


def bgr_to_rgb(x: jax.Array) -> jax.Array:
    """Flip the channel axis (last axis, NHWC/HWC) between BGR and RGB.

    Mirrors the reference's ``[:, [2, 1, 0]]`` indexing (train_cnn.py:123,
    inference.py:116) in NHWC layout.
    """
    return x[..., ::-1]


# The flip is an involution; provide both names for call-site clarity.
rgb_to_bgr = bgr_to_rgb


def vgg_caffe_preprocess(x_bgr_255: jax.Array) -> jax.Array:
    """Subtract the BGR ImageNet mean for Caffe-style VGG input.

    Equivalent to the reference's ``x.add(imagenet_neg_mean)``
    (train_cnn.py:164, :300-301): input BGR/[0,255], no scaling, no std.
    """
    mean = jnp.asarray(CAFFE_BGR_MEAN, dtype=x_bgr_255.dtype)
    return x_bgr_255 - mean


def torchvision_normalize(
    x_rgb_01: jax.Array, reference_typo_stats: bool = False
) -> jax.Array:
    """(x - mean) / std with torchvision ImageNet stats, RGB/[0,1] input.

    Equivalent to reference ``transforms.Normalize`` (inference.py:58) /
    the ``Normalize`` helper (train_cnn.py:85-98, classifier.py:28-39).

    ``reference_typo_stats=True`` reproduces the reference *training* path's
    G-mean typo 0.546 (train_cnn.py:272; the correct 0.456 is what the
    classifier's own eval transform uses) — only for strict trajectory
    comparison against the reference's classifier-mode training.
    """
    mean_vals = (0.485, 0.546, 0.406) if reference_typo_stats else TORCHVISION_MEAN_RGB
    mean = jnp.asarray(mean_vals, dtype=x_rgb_01.dtype)
    std = jnp.asarray(TORCHVISION_STD_RGB, dtype=x_rgb_01.dtype)
    return (x_rgb_01 - mean) / std


def resize_bilinear(image: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize to (height, width), half-pixel centres.

    Matches ``cv2.resize(im, (w, h))`` with INTER_LINEAR up to fixed-point
    rounding (reference dataset.py:101, inference.py:74). Works on HWC or
    NHWC input. Note cv2's INTER_LINEAR does NOT antialias when
    downscaling — ``antialias=False`` reproduces that (pure bilinear taps).
    """
    if image.ndim == 3:
        out_shape = (height, width, image.shape[-1])
    elif image.ndim == 4:
        out_shape = (image.shape[0], height, width, image.shape[-1])
    else:
        raise ValueError(f"expected HWC or NHWC, got shape {image.shape}")
    return jax.image.resize(image, out_shape, method="linear", antialias=False)


def _affine_rescale_matrix(src_h: int, src_w: int, dst_h: int, dst_w: int):
    """Forward affine matrix of the reference ``rescale`` (dataset.py:36-52).

    Maps source pixel coords to destination:
      dst_x = w_s * x + (dst_w/2 - w_s*src_w/2)
      dst_y = h_s * y + (dst_h/2 - h_s*src_h/2)
    (an anisotropic scale about the image centre; zero-pads, never crops).
    """
    h_s = dst_h / src_h
    w_s = dst_w / src_w
    tx = dst_w / 2.0 - w_s * src_w / 2.0
    ty = dst_h / 2.0 - h_s * src_h / 2.0
    return w_s, h_s, tx, ty


def affine_warp_inverse(
    image: jax.Array,
    inv_coeffs: tuple[float, float, float, float],
    out_h: int,
    out_w: int,
) -> jax.Array:
    """Inverse-map bilinear affine warp with zero border (cv2.warpAffine semantics).

    ``inv_coeffs = (a_x, a_y, b_x, b_y)`` maps destination pixel (x, y) to
    source coords (a_x*x + b_x, a_y*y + b_y). Samples with bilinear
    interpolation; out-of-bounds taps contribute zero, matching
    cv2.BORDER_CONSTANT(0), the reference default (dataset.py:52).
    """
    a_x, a_y, b_x, b_y = inv_coeffs
    src_h, src_w = image.shape[0], image.shape[1]

    dst_x = jnp.arange(out_w, dtype=jnp.float32) * a_x + b_x  # (out_w,)
    dst_y = jnp.arange(out_h, dtype=jnp.float32) * a_y + b_y  # (out_h,)

    x0 = jnp.floor(dst_x)
    y0 = jnp.floor(dst_y)
    wx = dst_x - x0  # lerp weight toward x0+1
    wy = dst_y - y0

    def gather_axis(img, idx, axis, size):
        valid = (idx >= 0) & (idx <= size - 1)
        idx_c = jnp.clip(idx, 0, size - 1).astype(jnp.int32)
        taken = jnp.take(img, idx_c, axis=axis)
        mask_shape = [1] * img.ndim
        mask_shape[axis] = idx.shape[0]
        return taken * valid.reshape(mask_shape).astype(img.dtype)

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Separable bilinear: gather rows then columns for the 4 taps.
    img = image.astype(jnp.float32)
    top = gather_axis(img, y0i, 0, src_h)
    bot = gather_axis(img, y0i + 1, 0, src_h)
    wy_col = wy.reshape(-1, *([1] * (img.ndim - 1)))
    rows = top * (1.0 - wy_col) + bot * wy_col  # (out_h, src_w, C)

    left = gather_axis(rows, x0i, 1, src_w)
    right = gather_axis(rows, x0i + 1, 1, src_w)
    wx_row = wx.reshape(1, -1, *([1] * (img.ndim - 2)))
    out = left * (1.0 - wx_row) + right * wx_row
    return out


def affine_rescale(image: jax.Array, target_height: int, target_width: int) -> jax.Array:
    """Centered anisotropic affine rescale, matching reference ``rescale``.

    Reference dataset.py:36-52 builds a forward scale-about-centre affine and
    calls cv2.warpAffine (bilinear, zero border). We apply the exact inverse
    map. Input/output are HWC.
    """
    src_h, src_w = image.shape[0], image.shape[1]
    w_s, h_s, tx, ty = _affine_rescale_matrix(src_h, src_w, target_height, target_width)
    # Inverse of dst = s*src + t  =>  src = (dst - t)/s
    inv = (1.0 / w_s, 1.0 / h_s, -tx / w_s, -ty / h_s)
    return affine_warp_inverse(image, inv, target_height, target_width)


def center_crop(image: jax.Array, size: int) -> jax.Array:
    """Center crop to (size, size); pads with zeros if smaller (torchvision semantics).

    Matches ``transforms.CenterCrop(256)`` in the reference eval transform
    (inference.py:57). HWC or NHWC.
    """
    h_axis = image.ndim - 3
    h, w = image.shape[h_axis], image.shape[h_axis + 1]
    pad_h = max(size - h, 0)
    pad_w = max(size - w, 0)
    if pad_h or pad_w:
        pads = [(0, 0)] * image.ndim
        pads[h_axis] = (pad_h // 2 + pad_h % 2, pad_h // 2)
        pads[h_axis + 1] = (pad_w // 2 + pad_w % 2, pad_w // 2)
        image = jnp.pad(image, pads)
        h, w = image.shape[h_axis], image.shape[h_axis + 1]
    top = (h - size) // 2
    left = (w - size) // 2
    idx = [slice(None)] * image.ndim
    idx[h_axis] = slice(top, top + size)
    idx[h_axis + 1] = slice(left, left + size)
    return image[tuple(idx)]
