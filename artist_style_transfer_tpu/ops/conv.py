"""NHWC conv / transpose-conv primitives with exact torch-semantics parity.

These wrap ``lax.conv_general_dilated`` with the dimension numbers and
padding arithmetic needed to reproduce ``nn.Conv2d`` / ``nn.ConvTranspose2d``
bit-for-bit (up to dtype), which is the parity linchpin for importing
reference-trained checkpoints (SURVEY §7 hard parts a, b).

Weight layout is HWIO (TPU-native). Importers convert torch's OIHW
(Conv2d) and IOHW (ConvTranspose2d) layouts; see
:mod:`artist_style_transfer_tpu.utils.torch_import`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.ops.precision import get_precision

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jax.Array,
    w_hwio: jax.Array,
    b: jax.Array | None = None,
    stride: int = 1,
    padding: int | str = 0,
    precision: str | None = None,
) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC, matching ``nn.Conv2d``.

    ``padding`` is symmetric zero padding in pixels (the TransformerNet does
    its own reflection padding outside, reference cnn.py:63 uses pad=0;
    VGG/ResNet convs use pad=k//2). ``precision`` defaults to the global
    policy (see :mod:`artist_style_transfer_tpu.ops.precision`).
    """
    if isinstance(padding, int):
        pad = ((padding, padding), (padding, padding))
    else:
        pad = padding
    y = jax.lax.conv_general_dilated(
        x,
        w_hwio,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
        precision=precision or get_precision(),
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def conv_transpose2d(
    x: jax.Array,
    w_hwio_flipped: jax.Array,
    b: jax.Array | None = None,
    stride: int = 2,
    padding: int = 1,
    output_padding: int = 1,
    precision: str | None = None,
) -> jax.Array:
    """2-D transposed convolution matching ``nn.ConvTranspose2d`` exactly.

    Implemented as a regular convolution over the input dilated by ``stride``
    with asymmetric padding ``(k-1-p, k-1-p+output_padding)`` per spatial dim
    — the textbook gradient-of-conv formulation, giving output size
    ``(H-1)*s - 2p + k + op`` (reference cnn.py:108: k3 s2 p1 op1 = exact x2
    upsample; k1 s1 p0 op0 = 1x1 conv).

    ``w_hwio_flipped`` must already be spatially flipped and transposed to
    HWIO from torch's (I, O, kH, kW); the importer does this once at load.
    """
    k = w_hwio_flipped.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    y = jax.lax.conv_general_dilated(
        x,
        w_hwio_flipped,
        window_strides=(1, 1),
        padding=((lo, hi), (lo, hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
        precision=precision or get_precision(),
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def linear(
    x: jax.Array,
    w_io: jax.Array,
    b: jax.Array | None = None,
    precision: str | None = None,
) -> jax.Array:
    """Dense layer (N, I) @ (I, O) + b with the global precision policy.

    A bare ``@`` would use XLA DEFAULT precision (bf16 multiplier passes);
    this is the policy-respecting equivalent of ``nn.Linear``.
    """
    y = jnp.matmul(x, w_io, precision=precision or get_precision())
    return y + b if b is not None else y


def max_pool2d(x: jax.Array, window: int = 2, stride: int = 2, padding: int = 0) -> jax.Array:
    """Max pooling, NHWC, matching ``nn.MaxPool2d(window, stride, padding)``."""
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )


def avg_pool_global(x: jax.Array) -> jax.Array:
    """Global average pool NHWC -> NC (AdaptiveAvgPool2d(1) + flatten)."""
    return jnp.mean(x, axis=(1, 2))


def max_pool_global(x: jax.Array) -> jax.Array:
    """Global max pool NHWC -> NC (AdaptiveMaxPool2d(1) + flatten)."""
    return jnp.max(x, axis=(1, 2))
