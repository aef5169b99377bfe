"""Quantization-aware TRAINING forward for the TransformerNet.

The round-2 op profile (BENCH_NOTES) leaves the single-chip 'cycle' train
step bounded by the transformer half (~75 ms of ~143): memory-bound C<128
convs whose N-minor layouts XLA pins. Int8 is the one remaining lever that
both doubles MXU macs/cycle and halves the activation bytes — and unlike
the frozen loss VGG (ops/qconv.py), the transformer's weights TRAIN, so
this is QAT: the forward runs the 16 interior convolutions (reference
cnn.py:15-38 — encoder convs 2-4, all 10 residual convs, all 3 transpose
convs) through :func:`ops.qconv.conv2d_qat_int8` with straight-through
gradients. Weight/bias gradients stay exact real-dtype wgrads (no gradient
quantization noise reaches the optimizer); the data gradient rides the
int8 MXU like the frozen-VGG path.

The C=3 endpoints (9x9 stem / 9x9 output) keep the factored bf16 forms —
XLA:TPU's int8 tiling pads C=3 operands catastrophically (measured 16 GB
staging copy, models/transformer_q.py docstring) — which also keeps the
output image entirely free of endpoint quantization error.

Semantics: this optimizes the loss of the QUANTIZED forward — the same
numerics ``infer.stylize_int8`` serves — so QAT-trained weights are
train/serve-consistent for the int8 serving path. Trajectory deviation vs
the bf16 forward is measured in tests/test_qat.py and BENCH_NOTES.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.models.transformer import (
    DECODER_SPEC,
    ENCODER_SPEC,
)
from artist_style_transfer_tpu.ops.conv import (
    conv2d_reflect_cinfactored,
    conv2d_reflect_dxfactored,
)
from artist_style_transfer_tpu.ops.norm import instance_norm_act
from artist_style_transfer_tpu.ops.pad import reflect_pad_hw
from artist_style_transfer_tpu.ops.qconv import conv2d_qat_int8

_Z = ((0, 0), (0, 0))


def _qconv_in(p: dict, x: jax.Array, k: int, s: int, relu: bool) -> jax.Array:
    """Reflect-pad -> int8 QAT conv -> IN(+ReLU) (reference ConvLayer).

    The reflect pad happens in real dtype BEFORE the quantizer; XLA fuses
    pad+quantize into one int8-producing fusion (the padded real tensor is
    never materialized), and autodiff folds the pad's border adjoint back
    exactly.
    """
    xp = reflect_pad_hw(x, k // 2) if k > 1 else x
    y = conv2d_qat_int8(xp, p["w"], p["b"], s, _Z, 1)
    return instance_norm_act(y, p["gamma"], p["beta"], relu)


def _qdeconv_in(p: dict, x: jax.Array, k: int, s: int, op: int) -> jax.Array:
    """ConvTranspose2d (lhs-dilated conv, pre-flipped HWIO weights) -> IN+ReLU.

    Same formulation as :func:`ops.conv.conv_transpose2d`; the inserted
    dilation zeros are exact in int8.
    """
    lo = k - 1 - k // 2
    hi = lo + op
    y = conv2d_qat_int8(x, p["w"], p["b"], 1, ((lo, hi), (lo, hi)), s)
    return instance_norm_act(y, p["gamma"], p["beta"], True)


def _conv_in_bf(p: dict, x: jax.Array, s: int, relu: bool) -> jax.Array:
    """bf16 reflect conv -> IN(+ReLU) — the unquantized fast-path layer."""
    from artist_style_transfer_tpu.ops.conv import conv2d_reflect

    y = conv2d_reflect(x, p["w"], p["b"], stride=s)
    return instance_norm_act(y, p["gamma"], p["beta"], relu)


def _deconv_in_bf(p: dict, x: jax.Array, k: int, s: int, op: int) -> jax.Array:
    from artist_style_transfer_tpu.ops.conv import conv_transpose2d

    y = conv_transpose2d(x, p["w"], p["b"], stride=s, padding=k // 2,
                         output_padding=op)
    return instance_norm_act(y, p["gamma"], p["beta"], True)


def transformer_apply_qat(params: dict, x: jax.Array,
                          layers: str = "trunk") -> jax.Array:
    """QAT forward: NHWC BGR [0,255] -> NHWC BGR unbounded (cnn.py:45-49).

    Same parameter pytree as :func:`transformer_apply`; fast-precision
    (bf16) training path only — parity mode has no business quantizing.

    ``layers='trunk'`` quantizes only the 12 quarter-resolution convs
    (encoder conv4, the 10 residual convs, decoder conv1 — all 128-channel
    at H/4): those are compute-bound, so int8 is a pure MXU-rate win. The
    half/full-resolution C<=64 convs stay bf16 — measured on chip, their
    dynamic-quant/requant passes on 822/411 MB activations cost more than
    the conv win (full QAT 774.6 vs 896.1 img/s with the trunk's same
    int8-loss config; the exact analog of quantize_loss 'deep' beating
    'all', BENCH_NOTES). ``layers='all'`` quantizes all 16 interior convs.
    """
    trunk_only = layers == "trunk"
    enc = params["encoder"]
    h = conv2d_reflect_cinfactored(x, enc[0]["w"], enc[0]["b"])
    x = instance_norm_act(h, enc[0]["gamma"], enc[0]["beta"], True)
    for p, (k, s, _, cout) in zip(enc[1:], ENCODER_SPEC[1:]):
        if trunk_only and cout < 128:
            x = _conv_in_bf(p, x, s, relu=True)
        else:
            x = _qconv_in(p, x, k, s, relu=True)
    for r in params["residual"]:
        identity = x
        h = _qconv_in(r["conv1"], x, 3, 1, relu=True)
        h = _qconv_in(r["conv2"], h, 3, 1, relu=False)
        x = h + identity
    for p, (k, s, op, _, cout) in zip(params["decoder"], DECODER_SPEC):
        if trunk_only and cout < 128:
            x = _deconv_in_bf(p, x, k, s, op)
        else:
            x = _qdeconv_in(p, x, k, s, op)
    return conv2d_reflect_dxfactored(x, params["output"]["w"], params["output"]["b"])
