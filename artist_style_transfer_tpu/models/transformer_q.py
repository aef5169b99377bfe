"""Int8-quantized TransformerNet inference path (serving fast path).

Same topology as :mod:`artist_style_transfer_tpu.models.transformer`
(reference cnn.py:10-49). The 16 interior convolutions (encoder convs 2-4,
all 10 residual convs, all 3 transpose convs) run on the TPU's int8 MXU —
2x the bf16 macs/cycle and half the HBM bytes on the activation reads
(measured 2.4x on the lane-bound C=32 @512^2 conv shapes that dominate the
bf16 stylize profile, BENCH_NOTES). The two C=3 endpoint convs (9x9 stem
and 9x9 output) stay in the factored bf16 forms the fast path already
uses: XLA:TPU's int8 tiling pads C=3 tensors ~40x (a measured 16 GB s32
staging copy at b128/512^2 — compile-time OOM), so int8 there loses on
memory alone, and keeping the output conv in bf16 also removes its
quantization error entirely.

Why this quantization is unusually benign for this architecture: every
quantized convolution feeds an InstanceNorm, and IN is invariant to any
positive per-channel scaling of its input (the scale multiplies mean and
std alike) and to any per-channel additive constant (absorbed by the mean
subtraction). Consequences:

- int8 conv outputs go into IN **as raw int32 accumulators** — no dequant
  multiplies, and per-output-channel weight scales cancel exactly, so
  static calibration error can never bias the result, only round it;
- conv biases cancel under IN (the reference applies them, cnn.py:63-78,
  but mathematically they are no-ops before InstanceNorm) — the quantized
  path skips them inside the int8 convs.

Activations are re-quantized before each int8 conv with static per-tensor
scales from :func:`calibrate_transformer` (one forward over sample
content); the residual trunk stream stays in real-unit bf16 between
blocks so skip-adds are unaffected. Measured quality on the committed
oracle-trained golden net: ~64 dB PSNR vs the f32 'highest' parity path
(identical to 0.1 dB under bf16 accumulation) even with random
calibration images (tests/test_quant.py) — the large conv fan-in
averages the rounding noise and IN re-centers every layer. Measured
throughput at the 512^2 b128 headline config: 1418 img/s vs 1018 bf16
(+39%, BENCH_NOTES).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.models.transformer import (
    DECODER_SPEC,
    ENCODER_SPEC,
)
from artist_style_transfer_tpu.ops.conv import (
    conv2d_reflect,
    conv2d_reflect_cinfactored,
    conv2d_reflect_dxfactored,
    conv_transpose2d,
)
from artist_style_transfer_tpu.ops.norm import INSTANCE_NORM_EPS, instance_norm
from artist_style_transfer_tpu.ops.pad import reflect_pad_hw

_DN = ("NHWC", "HWIO", "NHWC")
_REAL_DTYPE = jnp.bfloat16  # real-unit stream between quantized convs


def _conv_i8(
    x_i8: jax.Array,
    wq: jax.Array,
    stride: int = 1,
    padding=((0, 0), (0, 0)),
    lhs_dilation=None,
    accum=jnp.int32,
) -> jax.Array:
    """int8 x int8 -> int32 convolution on the MXU.

    ``accum=bfloat16`` converts the s32 accumulator to bf16 in the conv's
    output emission — the MXU still accumulates exactly in int32, but the
    materialized tensor (which the following IN reads twice: stats +
    normalize) halves from 4 to 2 bytes/elem. Costs ~0.2% relative noise
    on the accumulator (bf16 mantissa vs ~1e5 magnitudes) — measured
    PSNR in tests/test_quant.py; the int32 default keeps the exact path.
    """
    y = jax.lax.conv_general_dilated(
        x_i8,
        wq,
        (stride, stride),
        padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    return y if accum == jnp.int32 else y.astype(accum)


def _quant_act(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric per-tensor activation quantization: round(x/s) in [-127,127].

    Fuses into the producing IN's output fusion, so the real-unit
    intermediate is only materialized where a second consumer needs it
    (the residual skip stream)."""
    q = jnp.round(x.astype(jnp.float32) * (1.0 / scale))
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def _in_act(
    y_acc: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    relu: bool,
) -> jax.Array:
    """InstanceNorm(+ReLU) directly on the conv accumulator (s32 or bf16).

    The input's per-channel scale (s_act * s_w[c]) cancels in the
    normalization, so the result is in real units without any dequant
    (eps is relative to the scaled variance — int accumulator units,
    typically >> 1 — so it is even more negligible than in real units).
    Returns the real-unit bf16 activation.
    """
    x32 = y_acc.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    y = ((x32 - mean) * jax.lax.rsqrt(var + INSTANCE_NORM_EPS)) * gamma + beta
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(_REAL_DTYPE)


def _quant_w(w: jax.Array):
    """Per-output-channel symmetric int8 weight quantization (HWIO)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
    sw = jnp.maximum(absmax, 1e-30) / 127.0
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / sw), -127, 127).astype(jnp.int8)
    return wq, sw


# ---------------------------------------------------------------------------
# Calibration: absmax of every quantized conv's input on sample content.
# ---------------------------------------------------------------------------


def _forward_collect(params: dict, x: jax.Array) -> dict:
    """f32 forward mirroring transformer_apply's parity path, returning the
    per-quant-point absmax (batch-reduced) in the scales pytree layout."""

    def absmax(t):
        return jnp.max(jnp.abs(t.astype(jnp.float32)))

    scales: dict = {"encoder": [None], "residual": [], "decoder": []}
    x = x.astype(jnp.float32)
    enc = params["encoder"]
    for i, (p, (k, s, _, _)) in enumerate(zip(enc, ENCODER_SPEC)):
        if i > 0:
            scales["encoder"].append(absmax(x))
        x = conv2d_reflect(x, p["w"], p["b"], stride=s)
        x = jax.nn.relu(instance_norm(x, p["gamma"], p["beta"]))
    for r in params["residual"]:
        s1 = absmax(x)
        h = conv2d_reflect(x, r["conv1"]["w"], r["conv1"]["b"], stride=1)
        h = jax.nn.relu(instance_norm(h, r["conv1"]["gamma"], r["conv1"]["beta"]))
        s2 = absmax(h)
        h = conv2d_reflect(h, r["conv2"]["w"], r["conv2"]["b"], stride=1)
        h = instance_norm(h, r["conv2"]["gamma"], r["conv2"]["beta"])
        x = h + x
        scales["residual"].append({"conv1": s1, "conv2": s2})
    for p, (k, s, op, _, _) in zip(params["decoder"], DECODER_SPEC):
        scales["decoder"].append(absmax(x))
        x = conv_transpose2d(x, p["w"], p["b"], stride=s, padding=k // 2, output_padding=op)
        x = jax.nn.relu(instance_norm(x, p["gamma"], p["beta"]))
    return scales


def calibrate_transformer(params: dict, images, margin: float = 1.0) -> dict:
    """Per-tensor activation scales from sample content images.

    ``images``: NHWC BGR [0,255] (a handful of representative images).
    Returns the scales pytree consumed by :func:`quantize_transformer`.
    Static scales are safe here because every IN re-centers the ranges —
    miscalibration costs rounding/clipping only, never a scale bias.
    """
    amax = jax.jit(_forward_collect)(params, jnp.asarray(images))
    return jax.tree.map(lambda a: jnp.float32(a) * margin / 127.0, amax)


# ---------------------------------------------------------------------------
# Quantized parameter pytree + forward.
# ---------------------------------------------------------------------------


def quantize_transformer(params: dict, images_or_scales) -> dict:
    """Quantize TransformerNet params for int8 inference.

    ``images_or_scales``: either calibration images (NHWC BGR [0,255]) or a
    scales pytree from :func:`calibrate_transformer`. The stem and output
    conv keep their original (bf16-cast) weights — see module docstring.
    """
    if isinstance(images_or_scales, dict):
        scales = images_or_scales
    else:
        scales = calibrate_transformer(params, images_or_scales)

    def bf(p):
        return jax.tree.map(lambda a: a.astype(_REAL_DTYPE), p)

    def in_conv(p, sin):
        wq, _ = _quant_w(p["w"])  # per-channel scale cancels in IN
        return {
            "wq": wq,
            "gamma": p["gamma"].astype(jnp.float32),
            "beta": p["beta"].astype(jnp.float32),
            "sin": jnp.float32(sin),
        }

    return {
        "stem": bf(params["encoder"][0]),  # bf16 factored (C_in = 3)
        "encoder": [
            in_conv(p, s)
            for p, s in zip(params["encoder"][1:], scales["encoder"][1:])
        ],
        "residual": [
            {
                "conv1": in_conv(r["conv1"], s["conv1"]),
                "conv2": in_conv(r["conv2"], s["conv2"]),
            }
            for r, s in zip(params["residual"], scales["residual"])
        ],
        "decoder": [
            in_conv(p, s) for p, s in zip(params["decoder"], scales["decoder"])
        ],
        "output": bf(params["output"]),  # bf16 factored (C_out = 3)
    }


def _in_relu_bf16(h: jax.Array, gamma: jax.Array, beta: jax.Array) -> jax.Array:
    """One-pass f32-stats IN + ReLU on a real-unit activation -> bf16."""
    h32 = h.astype(jnp.float32)
    mean = jnp.mean(h32, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(jnp.square(h32), axis=(1, 2), keepdims=True)
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    return jnp.maximum(
        ((h32 - mean) * jax.lax.rsqrt(var + INSTANCE_NORM_EPS))
        * gamma.astype(jnp.float32)
        + beta.astype(jnp.float32),
        0.0,
    ).astype(_REAL_DTYPE)


def transformer_apply_int8(
    qparams: dict, x: jax.Array, accum=jnp.int32
) -> jax.Array:
    """Quantized forward: NHWC BGR [0,255] (uint8 or float) -> NHWC bf16.

    Same contract as :func:`transformer_apply` (unbounded output, clip at
    save time — reference inference.py:116). ``accum`` selects the
    materialized conv-accumulator dtype (see :func:`_conv_i8`).

    A batch->H folded int8 variant (fold the batch so the C<128 int8 convs
    run batch-1, the win the bf16 path gets from
    ``transformer._transformer_apply_folded``) was BUILT AND MEASURED in
    round 3 and REMOVED: XLA:TPU's int8 tile layout for the folded
    ``s8[1, N*(H+2p), W, 32]`` tensor pads ~16x (a 17.4 GB staging copy at
    the b128/512^2 headline shape — compile-time OOM; the same pathology
    that keeps the C=3 endpoints bf16, see the module docstring). The
    direct path keeps N=128 in the lane dimension, which IS the int8
    layout fix. Endpoint-only folding also loses: the folded bf16 output
    conv measured 15.0 ms vs 11.3 ms for the unfolded dx-factored leg
    (BENCH_NOTES round 3).
    """
    x = x.astype(_REAL_DTYPE)

    # Stem 9x9/1 3->32 in bf16 (widen-factored — conv2d_reflect_cinfactored).
    stem = qparams["stem"]
    h = conv2d_reflect_cinfactored(x, stem["w"], stem["b"])
    xr = _in_relu_bf16(h, stem["gamma"], stem["beta"])

    # Encoder convs 2-4 (int8): reflect pad, stride per spec.
    for p, (k, s, _, _) in zip(qparams["encoder"], ENCODER_SPEC[1:]):
        xq = _quant_act(xr, p["sin"])
        y = _conv_i8(reflect_pad_hw(xq, k // 2), p["wq"], stride=s, accum=accum)
        xr = _in_act(y, p["gamma"], p["beta"], relu=True)

    # Residual trunk (real-unit bf16 stream, int8 convs inside each block).
    for r in qparams["residual"]:
        p1, p2 = r["conv1"], r["conv2"]
        hq = _quant_act(xr, p1["sin"])
        h = _conv_i8(reflect_pad_hw(hq, 1), p1["wq"], accum=accum)
        hq = _quant_act(_in_act(h, p1["gamma"], p1["beta"], relu=True), p2["sin"])
        h = _conv_i8(reflect_pad_hw(hq, 1), p2["wq"], accum=accum)
        xr = _in_act(h, p2["gamma"], p2["beta"], relu=False) + xr

    # Decoder (ConvTranspose2d = zero-insert dilated conv; inserted zeros
    # are exact in int8, and the stored weights are already flipped HWIO).
    for p, (k, s, op, _, _) in zip(qparams["decoder"], DECODER_SPEC):
        xq = _quant_act(xr, p["sin"])
        lo = k - 1 - k // 2
        hi = lo + op
        y = _conv_i8(
            xq,
            p["wq"],
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(s, s) if s != 1 else None,
            accum=accum,
        )
        xr = _in_act(y, p["gamma"], p["beta"], relu=True)

    # Output 9x9/1 32->3 in bf16 (dy/dx-factored) — no quantization error.
    out = qparams["output"]
    return conv2d_reflect_dxfactored(xr, out["w"], out["b"])
