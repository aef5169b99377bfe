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


def _conv_i8(xq: jax.Array, wq: jax.Array, pad: int, stride: int = 1,
             lhs_d: int = 1, pad_hi: int | None = None) -> jax.Array:
    """int8 x int8 -> int32 convolution on the MXU."""
    hi = pad if pad_hi is None else pad_hi
    return jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(stride, stride),
        padding=((pad, hi), (pad, hi)),
        lhs_dilation=(lhs_d, lhs_d) if lhs_d != 1 else None,
        dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )


@_functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv2d_frozen_int8(
    x: jax.Array,
    wq: jax.Array,
    sw: jax.Array,
    b: jax.Array | None,
    padding: int = 1,
    stride: int = 1,
) -> jax.Array:
    """Zero-padded conv of a FROZEN layer on the int8 MXU.

    Forward: ``dequant(conv(quant(x), wq)) + b`` with dynamic per-tensor
    input scale. Backward (STE): the weight/bias cotangents are zero (the
    layer is frozen — do not use for trained convs) and the data gradient
    runs as a second int8 conv with the spatially-flipped transposed
    weights over the dynamically-quantized, weight-scale-folded cotangent
    (``lhs_dilation=stride`` for strided forwards, the standard dgrad
    formulation). Output dtype follows ``x``. Covers the frozen loss
    extractors: VGG16 (stride 1) and the ResNet-50 classifier's 1x1/3x3
    stride-1/2 convs ('classifier' training mode, where style gradients
    flow through the frozen classifier — reference train_cnn.py:311-314).
    """
    return _q_fwd(x, wq, sw, b, padding, stride)[0]


def _q_fwd(x, wq, sw, b, padding, stride):
    s_in = absmax_scale(x)
    acc = _conv_i8(quant_i8(x, s_in), wq, padding, stride=stride)
    y = acc.astype(jnp.float32) * (s_in * sw)
    if b is not None:
        y = y + b
    return y.astype(x.dtype), (wq, sw, b, x.shape[1:3])


def _q_bwd(padding, stride, res, dy):
    wq, sw, b, in_hw = res
    k = wq.shape[0]
    # Fold the per-output-channel weight scales into the cotangent: the
    # dgrad contraction is over C_out, so dy[c] * sw[c] makes the int8
    # weight matrix exact in the backward too.
    dyp = dy.astype(jnp.float32) * sw
    s_dy = absmax_scale(dyp)
    w_t = jnp.transpose(wq[::-1, ::-1], (0, 1, 3, 2))  # flip HW, swap I/O
    if stride == 1:
        acc = _conv_i8(quant_i8(dyp, s_dy), w_t, k - 1 - padding)
    else:
        # Strided forward: dgrad is the lhs-dilated conv over dy with
        # asymmetric high padding solving the output size to the input's.
        pads = tuple(
            _dgrad_pad(i, o, k, stride, 1, padding)
            for i, o in zip(in_hw, dy.shape[1:3])
        )
        acc = jax.lax.conv_general_dilated(
            quant_i8(dyp, s_dy),
            w_t,
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=(stride, stride),
            dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
    dx = (acc.astype(jnp.float32) * s_dy).astype(dy.dtype)
    return (
        dx,
        np.zeros(wq.shape, jax.dtypes.float0),  # int8 primal -> float0 ct
        jnp.zeros_like(sw),
        None if b is None else jnp.zeros_like(b),
    )


conv2d_frozen_int8.defvjp(_q_fwd, _q_bwd)


# ---------------------------------------------------------------------------
# QAT conv for TRAINED layers (the TransformerNet interior convs).
# ---------------------------------------------------------------------------


def _dgrad_pad(i_size: int, o_size: int, k: int, stride: int, lhs_d: int,
               lo: int) -> tuple[int, int]:
    """Padding pair for the data-gradient conv of a forward
    ``conv(x, w, window_strides=stride, padding=(lo, hi), lhs_dilation=lhs_d)``.

    The dgrad runs ``conv(dy, flipT(w), window_strides=lhs_d,
    padding=(k-1-lo, p_hi), lhs_dilation=stride)``; ``p_hi`` is solved so the
    output spatial size equals the forward input's ``i_size`` exactly:
    ``floor((stride*(o-1)+1 + p_lo + p_hi - k)/lhs_d) + 1 == i`` with the
    numerator made exactly divisible.
    """
    p_lo = k - 1 - lo
    dil_o = stride * (o_size - 1) + 1
    p_hi = lhs_d * (i_size - 1) + k - dil_o - p_lo
    return p_lo, p_hi


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv2d_qat_int8(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    stride: int = 1,
    padding: tuple = ((0, 0), (0, 0)),
    lhs_dilation: int = 1,
) -> jax.Array:
    """Int8-MXU convolution of a TRAINED layer (QAT, straight-through).

    Forward: symmetric dynamic per-tensor activation quantization +
    per-output-channel weight quantization, int8 conv, dequantize, + bias —
    i.e. ``conv(dequant(quant(x)), dequant(quant(w))) + b`` computed on the
    int8 MXU (2x bf16 macs/cycle, half the operand bytes). Covers the three
    conv classes of the TransformerNet interior (reference cnn.py:15-38):
    stride-1/2 zero-padded convs (callers reflect-pad outside — the pad
    fuses with the quantize into one int8-producing fusion) and the
    lhs-dilated ConvTranspose2d formulation (``lhs_dilation=stride`` with
    the pre-flipped HWIO weights, see :func:`ops.conv.conv_transpose2d`).

    Backward (straight-through estimator through both quantizers):

    - ``dw``/``db`` are the EXACT real-dtype gradients of the dequantized
      forward — the weight gradient contracts the dequantized int8 input
      residual (``xq * s_x``; the int8 residual also halves the saved
      activation bytes vs the bf16 path) against ``dy`` on the bf16 MXU,
      so weight updates see no gradient quantization noise;
    - ``dx`` runs as a second int8 conv: the per-channel weight scales fold
      into the cotangent (exact), which is then dynamically quantized —
      the same scheme :func:`conv2d_frozen_int8` uses for the frozen VGG.

    Quality rationale: every quantized conv feeds an InstanceNorm, which
    re-centers and re-scales per channel, so forward quantization error is
    rounding noise (never bias) — measured ~64 dB PSNR on the int8 serving
    path (models/transformer_q.py) and <=0.5% relative trajectory deviation
    in training (tests/test_qat.py, BENCH_NOTES).
    """
    return _qat_fwd(x, w, b, stride, padding, lhs_dilation)[0]


def _conv_cfg(xq, wq, stride, padding, lhs_d, accum=jnp.int32):
    return jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(stride, stride),
        padding=padding,
        lhs_dilation=(lhs_d, lhs_d) if lhs_d != 1 else None,
        dimension_numbers=_DN,
        preferred_element_type=accum,
    )


def _qat_fwd(x, w, b, stride, padding, lhs_dilation):
    s_x = absmax_scale(x)
    xq = quant_i8(x, s_x)
    wq, sw = quant_weight(w)
    acc = _conv_cfg(xq, wq, stride, padding, lhs_dilation)
    y = acc.astype(jnp.float32) * (s_x * sw) + b
    # dtype witnesses: bwd must emit cotangents in the primal dtypes.
    wit = (jnp.zeros((), w.dtype), jnp.zeros((), b.dtype))
    return y.astype(x.dtype), (xq, s_x, wq, sw, wit)


def _qat_bwd(stride, padding, lhs_dilation, res, dy):
    xq, s_x, wq, sw, (w_wit, b_wit) = res
    k = wq.shape[0]

    # Weight/bias gradients: exact real-dtype wgrad against the dequantized
    # int8 input residual (STE through the weight quantizer). Delegating the
    # conv transposition to jax.vjp of the (linear-in-w) forward conv keeps
    # every stride/dilation case correct by construction; the unused primal
    # output is dead code XLA removes.
    cdt = dy.dtype
    xhat = (xq.astype(jnp.float32) * s_x).astype(cdt)

    def conv_w(wv):
        return _conv_cfg(
            xhat, wv, stride, padding, lhs_dilation,
            accum=jnp.float32 if cdt == jnp.float32 else cdt,
        )

    _, pull = jax.vjp(conv_w, jnp.zeros(wq.shape, cdt))
    (dw,) = pull(dy)
    db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2))

    # Data gradient on the int8 MXU: fold per-channel weight scales into the
    # cotangent (exact — they factor out of the C_out contraction), quantize
    # dynamically, run the transposed conv in int8.
    dyp = dy.astype(jnp.float32) * sw
    s_dy = absmax_scale(dyp)
    w_t = jnp.transpose(wq[::-1, ::-1], (0, 1, 3, 2))
    pads = tuple(
        _dgrad_pad(i, o, k, stride, lhs_dilation, p[0])
        for i, o, p in zip(xq.shape[1:3], dy.shape[1:3], padding)
    )
    acc = _conv_cfg(
        quant_i8(dyp, s_dy), w_t, lhs_dilation, pads, stride
    )
    dx = (acc.astype(jnp.float32) * s_dy).astype(dy.dtype)
    return dx, dw.astype(w_wit.dtype), db.astype(b_wit.dtype)


conv2d_qat_int8.defvjp(_qat_fwd, _qat_bwd)
