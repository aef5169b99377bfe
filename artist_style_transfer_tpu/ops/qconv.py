"""Int8-MXU convolution for FROZEN feature extractors in the training loss.

The 'cycle'-train profile (BENCH_NOTES round-2 xplane capture) puts the
VGG16 loss half at 78.6 ms of the 154 ms step — the conv FLOPs run fwd at
~162 TFLOPS, i.e. at the chip's bf16 ceiling, so the only lever left that
scales compute is the int8 MXU (2x macs/cycle, half the operand bytes).
Training normally cannot use int8 (weight gradients need real-valued
inputs), but the perceptual-loss extractor is FROZEN (reference
train_cnn.py:60-61): only the *data* gradient flows through it, and the
data gradient of a quantized conv under the straight-through estimator is
itself a conv with the same int8 weights — so both the forward and the
backward of every VGG conv can run on the int8 MXU.

Quantization scheme (symmetric, round-to-nearest):

- weights: per-output-channel int8, folded once at setup
  (:func:`quant_weight`);
- activations: per-tensor DYNAMIC scale (absmax each step) — VGG
  activations on generated images drift over a training run, and a stale
  static scale would clip them; the absmax reduce fuses with the
  producing fusion's output;
- gradients: per-tensor DYNAMIC scale, computed on the weight-scale-folded
  cotangent ``dy * sw`` so the per-channel weight scales stay exact in the
  backward (they factor out of the dgrad contraction).

STE note: the true derivative of ``round(x/s)`` is zero a.e.; the
straight-through estimator passes the cotangent through the rounding
unchanged, and this implementation also passes it through the [-127, 127]
clip (VGG activations at a dynamic absmax scale never clip; the estimator
error is zero in that regime). The returned ``dx`` therefore equals the
exact gradient of the *dequantized* forward up to the int8 rounding of
``dy`` itself.
"""

from __future__ import annotations

import functools as _functools

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NHWC", "HWIO", "NHWC")


def absmax_scale(t: jax.Array) -> jax.Array:
    """Per-tensor symmetric int8 scale: absmax/127 (f32 scalar, never 0)."""
    return jnp.maximum(jnp.max(jnp.abs(t.astype(jnp.float32))), 1e-30) / 127.0


def quant_i8(t: jax.Array, scale: jax.Array) -> jax.Array:
    """round(t/scale) clipped to [-127, 127] as int8."""
    q = jnp.round(t.astype(jnp.float32) * (1.0 / scale))
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def quant_weight(w_hwio: jax.Array):
    """Per-output-channel symmetric int8 weight quantization.

    Returns ``(wq int8 HWIO, sw f32 (C_out,))`` with ``wq * sw ~= w``.
    """
    absmax = jnp.max(jnp.abs(w_hwio.astype(jnp.float32)), axis=(0, 1, 2))
    sw = jnp.maximum(absmax, 1e-30) / 127.0
    wq = jnp.clip(jnp.round(w_hwio.astype(jnp.float32) / sw), -127, 127)
    return wq.astype(jnp.int8), sw


def _conv_i8(xq: jax.Array, wq: jax.Array, pad: int) -> jax.Array:
    """int8 x int8 -> int32 stride-1 convolution on the MXU."""
    return jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )


@_functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def conv2d_frozen_int8(
    x: jax.Array,
    wq: jax.Array,
    sw: jax.Array,
    b: jax.Array | None,
    padding: int = 1,
) -> jax.Array:
    """Stride-1 zero-padded conv of a FROZEN layer on the int8 MXU.

    Forward: ``dequant(conv(quant(x), wq)) + b`` with dynamic per-tensor
    input scale. Backward (STE): the weight/bias cotangents are zero (the
    layer is frozen — do not use for trained convs) and the data gradient
    runs as a second int8 conv with the spatially-flipped transposed
    weights over the dynamically-quantized, weight-scale-folded cotangent.
    Output dtype follows ``x``.
    """
    return _q_fwd(x, wq, sw, b, padding)[0]


def _q_fwd(x, wq, sw, b, padding):
    s_in = absmax_scale(x)
    acc = _conv_i8(quant_i8(x, s_in), wq, padding)
    y = acc.astype(jnp.float32) * (s_in * sw)
    if b is not None:
        y = y + b
    return y.astype(x.dtype), (wq, sw, b)


def _q_bwd(padding, res, dy):
    wq, sw, b = res
    k = wq.shape[0]
    # Fold the per-output-channel weight scales into the cotangent: the
    # dgrad contraction is over C_out, so dy[c] * sw[c] makes the int8
    # weight matrix exact in the backward too.
    dyp = dy.astype(jnp.float32) * sw
    s_dy = absmax_scale(dyp)
    w_t = jnp.transpose(wq[::-1, ::-1], (0, 1, 3, 2))  # flip HW, swap I/O
    acc = _conv_i8(quant_i8(dyp, s_dy), w_t, k - 1 - padding)
    dx = (acc.astype(jnp.float32) * s_dy).astype(dy.dtype)
    return (
        dx,
        np.zeros(wq.shape, jax.dtypes.float0),  # int8 primal -> float0 ct
        jnp.zeros_like(sw),
        None if b is None else jnp.zeros_like(b),
    )


conv2d_frozen_int8.defvjp(_q_fwd, _q_bwd)
