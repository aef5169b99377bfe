"""TransformerNet — the Johnson-style feed-forward stylization network.

Topology matches reference ``StyleTransfer`` (cnn.py:10-49) exactly,
1,712,771 parameters:

  encoder:  conv9x9/1 3->32, conv3x3/2 32->64, conv3x3/2 64->128,
            conv1x1/1 128->128            (each: reflect-pad, conv,
                                           instance norm, ReLU)
  residual: 5 x [conv3x3/1 -> IN -> ReLU -> conv3x3/1 -> IN] + skip
  decoder:  convT1x1/1 128->128, convT3x3/2 128->64, convT3x3/2 64->32
            (each + IN + ReLU), then conv9x9/1 32->3 reflect-padded,
            no norm, no activation (output unbounded; clip at save time,
            reference train_cnn.py:112, inference.py:116)

Input/output: NHWC, BGR, [0, 255], float32. Fully convolutional — any even
H, W gives an output of identical spatial size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.ops.conv import (
    _ci_selector,
    _dx_selector,
    conv2d,
    conv2d_reflect,
    conv2d_reflect_cinfactored,
    conv2d_reflect_dxfactored,
    conv2d_wreflect_hzero,
    conv_transpose2d,
)
from artist_style_transfer_tpu.ops.norm import instance_norm, instance_norm_act
from artist_style_transfer_tpu.ops.pad import reflect_pad_hw, reflect_pad_w  # noqa: F401 (bit-exact alternative)
from artist_style_transfer_tpu.ops.precision import get_precision

# (kernel, stride, in_ch, out_ch) for the four encoder conv layers (cnn.py:15-24).
ENCODER_SPEC = ((9, 1, 3, 32), (3, 2, 32, 64), (3, 2, 64, 128), (1, 1, 128, 128))
NUM_RESIDUAL = 5
RES_CHANNELS = 128
# (kernel, stride, output_padding, in_ch, out_ch) for the three transpose convs (cnn.py:32-38).
DECODER_SPEC = ((1, 1, 0, 128, 128), (3, 2, 1, 128, 64), (3, 2, 1, 64, 32))
OUTPUT_CONV = (9, 1, 32, 3)  # final conv, norm="None" (cnn.py:39)

TRANSFORMER_PARAM_COUNT = 1_712_771  # verified against reference (SURVEY §2 C1)


def _torch_conv_init(key, k, cin, cout, transpose=False):
    """torch default Conv2d/ConvTranspose2d init: kaiming_uniform(a=sqrt(5)).

    Reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias,
    fan_in = cin*k*k (Conv2d) / cout*k*k (ConvTranspose2d). Weight layout is
    HWIO, already in the orientation ``conv2d``/``conv_transpose2d`` expect.
    """
    kw, kb = jax.random.split(key)
    fan_in = (cout if transpose else cin) * k * k
    bound = 1.0 / (fan_in ** 0.5)
    w = jax.random.uniform(kw, (k, k, cin, cout), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return w, b


def _conv_layer_params(key, k, cin, cout, norm=True, transpose=False):
    w, b = _torch_conv_init(key, k, cin, cout, transpose=transpose)
    p = {"w": w, "b": b}
    if norm:
        p["gamma"] = jnp.ones((cout,), jnp.float32)
        p["beta"] = jnp.zeros((cout,), jnp.float32)
    return p


def init_transformer_params(key: jax.Array) -> dict:
    """Randomly initialize TransformerNet params (torch-default distributions)."""
    n_keys = len(ENCODER_SPEC) + 2 * NUM_RESIDUAL + len(DECODER_SPEC) + 1
    keys = iter(jax.random.split(key, n_keys))
    params = {
        "encoder": [
            _conv_layer_params(next(keys), k, cin, cout)
            for (k, s, cin, cout) in ENCODER_SPEC
        ],
        "residual": [
            {
                "conv1": _conv_layer_params(next(keys), 3, RES_CHANNELS, RES_CHANNELS),
                "conv2": _conv_layer_params(next(keys), 3, RES_CHANNELS, RES_CHANNELS),
            }
            for _ in range(NUM_RESIDUAL)
        ],
        "decoder": [
            _conv_layer_params(next(keys), k, cin, cout, transpose=True)
            for (k, s, op, cin, cout) in DECODER_SPEC
        ],
        "output": dict(
            zip(("w", "b"), _torch_conv_init(next(keys), OUTPUT_CONV[0], OUTPUT_CONV[2], OUTPUT_CONV[3]))
        ),
    }
    return params


def _in_maybe_act(p: dict, x: jax.Array, relu: bool, fast: bool) -> jax.Array:
    """IN (+ReLU) after a conv: parity mode composes the exact ops; fast mode
    uses :func:`instance_norm_act` (same math, one fewer residual array)."""
    if fast:
        return instance_norm_act(x, p["gamma"], p["beta"], relu)
    y = instance_norm(x, p["gamma"], p["beta"])
    return jax.nn.relu(y) if relu else y


def _conv_in(p: dict, x: jax.Array, k: int, s: int, relu: bool = False,
             fast: bool = False) -> jax.Array:
    """Reflect-pad conv -> instance norm (reference ConvLayer, cnn.py:52-79).

    Uses :func:`conv2d_reflect` — bit-identical to pad-then-conv but without
    materializing the padded activation (a full HBM round trip per layer).
    """
    x = conv2d_reflect(x, p["w"], p["b"], stride=s)
    return _in_maybe_act(p, x, relu, fast)


def _deconv_in(p: dict, x: jax.Array, k: int, s: int, op: int, relu: bool = False,
               fast: bool = False) -> jax.Array:
    """Transpose conv -> instance norm (reference DeconvLayer, cnn.py:102-124)."""
    x = conv_transpose2d(x, p["w"], p["b"], stride=s, padding=k // 2, output_padding=op)
    return _in_maybe_act(p, x, relu, fast)


def transformer_fold_ok(x_shape) -> bool:
    """Batch->H folding needs N>=2 (else nothing to fold), H % 4 == 0
    (stride-2 block alignment at both downsamples) and enough rows for the
    9x9 reflect fix-up slices at every resolution."""
    return x_shape[0] >= 2 and x_shape[1] % 4 == 0 and x_shape[1] >= 20


def _fold_rows(c: jax.Array, p: int, reflect: bool) -> jax.Array:
    """(N, H, W, C) per-image content -> (1, N*(H+2p), W, C) folded along H.

    Each image's block is [sep_lo(p), content(H), sep_hi(p)]; separator rows
    are either the image's ReflectionPad2d rows (``reflect=True`` — rows
    p..1 / H-2..H-p-1, edge row not repeated, reference cnn.py:58) or zeros
    (``reflect=False`` — the zero padding ConvTranspose2d assumes).
    """
    n, h, w, ch = c.shape
    if reflect:
        lo = c[:, p:0:-1]
        hi = c[:, h - 2 : h - 2 - p : -1]
    else:
        lo = hi = jnp.zeros((n, p, w, ch), c.dtype)
    blk = jnp.concatenate([lo, c, hi], axis=1)
    return blk.reshape(1, n * (h + 2 * p), w, ch)


def _unfold_rows(y: jax.Array, n: int, p: int, h: int) -> jax.Array:
    """Inverse of :func:`_fold_rows`: slice the per-image content rows."""
    return y.reshape(n, h + 2 * p, y.shape[2], y.shape[3])[:, p : p + h]


def _transformer_apply_folded(params: dict, x: jax.Array) -> jax.Array:
    """Fast-mode forward with the batch folded into H for the C<128 layers.

    XLA assigns N-minor (batch-in-lanes) layouts to C<128 convs, and every
    neighboring op pays full-tensor relayout copies (round-2 op profile:
    the analogous shallow-VGG cluster cost ~23 ms/step). Folding the batch
    into H makes the encoder/decoder's shallow convs batch-1. Exactness:

    - reflect-padded convs (stem, two stride-2 encoder convs, 9x9 output)
      read per-image ReflectionPad rows from the separator (``_fold_rows``
      with ``reflect=True``); stride-2 convs only ever read the low-side
      fix-up row, and block offsets stay even so per-image windows align;
    - transpose convs assume ZERO padding (cnn.py:108), which zero
      separator rows provide; their stride-2 upsample maps a block of
      H/4+2 rows at offset 1 to 2x rows at offset 2 with cross-image
      contributions confined to separator rows;
    - instance norms are computed on the content slice only (stats over
      the true H, W — identical math to the unfolded path), and the next
      layer's folded input is rebuilt from the normalized content.

    The 128-channel trunk (encoder conv4, residual blocks, decoder conv1)
    runs unfolded — its layouts are already healthy (BENCH_NOTES: trunk
    convs at ~MXU peak). Per-image results match the unfolded fast path
    up to float reassociation noise.
    """
    n, h, w, _ = x.shape
    enc = params["encoder"]

    # Stem 9x9/1 3->32: widen-factored (conv2d_reflect_cinfactored) on the
    # folded tensor — 1xK widen conv consumes the W reflect pad, then the
    # Kx1 real-weight conv runs SAME over the folded axis, reading the
    # separator reflect rows as the per-image H padding.
    xf = _fold_rows(x, 4, reflect=True)
    selw = _ci_selector(9, 3, x.dtype.name)
    p1 = conv2d(reflect_pad_w(xf, 4), selw, None, stride=1, padding=0)
    w0 = enc[0]["w"].reshape(9, 1, 27, 32)
    y = conv2d(p1, w0, enc[0]["b"], stride=1, padding=((4, 4), (0, 0)))
    c = _unfold_rows(y, n, 4, h)
    c = instance_norm_act(c, enc[0]["gamma"], enc[0]["beta"], True)

    # Encoder conv2 3x3/2 32->64 @ H: low-side reflect fix-up row, even
    # offset 4; output block H/2+4, content offset 2.
    y = conv2d_wreflect_hzero(_fold_rows(c, 4, reflect=True), enc[1]["w"], enc[1]["b"], stride=2)
    c = _unfold_rows(y, n, 2, h // 2)
    c = instance_norm_act(c, enc[1]["gamma"], enc[1]["beta"], True)

    # Encoder conv3 3x3/2 64->128 @ H/2: offset 2 -> quarter-res offset 1.
    y = conv2d_wreflect_hzero(_fold_rows(c, 2, reflect=True), enc[2]["w"], enc[2]["b"], stride=2)
    c = _unfold_rows(y, n, 1, h // 4)
    x = instance_norm_act(c, enc[2]["gamma"], enc[2]["beta"], True)

    # 128-channel trunk, unfolded: encoder conv4 (1x1), residuals, decoder conv1 (1x1).
    x = _conv_in(enc[3], x, 1, 1, relu=True, fast=True)
    for r in params["residual"]:
        identity = x
        hh = _conv_in(r["conv1"], x, 3, 1, relu=True, fast=True)
        hh = _conv_in(r["conv2"], hh, 3, 1, relu=False, fast=True)
        x = hh + identity
    dec = params["decoder"]
    x = _deconv_in(dec[0], x, 1, 1, 0, relu=True, fast=True)

    # Decoder convT2 3x3/2 128->64: zero separators (ConvTranspose2d zero
    # padding); input offset 1 -> output offset 2, block H/2+4.
    y = conv_transpose2d(_fold_rows(x, 1, reflect=False), dec[1]["w"], dec[1]["b"],
                         stride=2, padding=1, output_padding=1)
    c = _unfold_rows(y, n, 2, h // 2)
    c = instance_norm_act(c, dec[1]["gamma"], dec[1]["beta"], True)

    # Decoder convT3 3x3/2 64->32: offset 2 -> output offset 4, block H+8.
    y = conv_transpose2d(_fold_rows(c, 2, reflect=False), dec[2]["w"], dec[2]["b"],
                         stride=2, padding=1, output_padding=1)
    c = _unfold_rows(y, n, 4, h)
    c = instance_norm_act(c, dec[2]["gamma"], dec[2]["beta"], True)

    # Output 9x9/1 32->3, reflect-padded, dy/dx-factored for tiny C_out:
    # Kx1 real conv SAME over the folded axis, 1xK selector along W.
    xf = _fold_rows(c, 4, reflect=True)
    wo = params["output"]["w"]
    wp = jnp.transpose(wo, (0, 2, 1, 3)).reshape(9, 1, 32, 27)
    p2 = conv2d(reflect_pad_w(xf, 4), wp, None, stride=1, padding=((4, 4), (0, 0)))
    sel = _dx_selector(9, 3, x.dtype.name)
    yo = conv2d(p2, sel, params["output"]["b"], stride=1, padding=0)
    return _unfold_rows(yo, n, 4, h)


def transformer_apply(params: dict, x: jax.Array, fold_batch: bool = False) -> jax.Array:
    """Forward pass: NHWC BGR [0,255] -> NHWC BGR unbounded (reference cnn.py:45-49).

    ``fold_batch=True`` dispatches the batch->H folded fast path (see
    :func:`_transformer_apply_folded`) when the precision mode and shape
    allow; identical results up to float reassociation.
    """
    fast = get_precision() != "highest"
    if fold_batch and fast and transformer_fold_ok(x.shape):
        return _transformer_apply_folded(params, x)
    for li, (p, (k, s, _, _)) in enumerate(zip(params["encoder"], ENCODER_SPEC)):
        if li == 0 and fast:
            # Fast mode: C_in=3 stem via the widen-factored form (see
            # conv2d_reflect_cinfactored; ~2x fwd+wgrad, fwd also faster).
            h = conv2d_reflect_cinfactored(x, p["w"], p["b"])
            x = _in_maybe_act(p, h, relu=True, fast=True)
        else:
            x = _conv_in(p, x, k, s, relu=True, fast=fast)
    for r in params["residual"]:
        identity = x
        h = _conv_in(r["conv1"], x, 3, 1, relu=True, fast=fast)
        h = _conv_in(r["conv2"], h, 3, 1, relu=False, fast=fast)
        x = h + identity
    for p, (k, s, op, _, _) in zip(params["decoder"], DECODER_SPEC):
        x = _deconv_in(p, x, k, s, op, relu=True, fast=fast)
    k = OUTPUT_CONV[0]
    if get_precision() != "highest":
        # Fast mode: dy/dx-factored output conv — same math, MXU-healthy
        # shapes for C_out=3 (see conv2d_reflect_dxfactored; 2.1x fwd+bwd).
        return conv2d_reflect_dxfactored(
            x, params["output"]["w"], params["output"]["b"]
        )
    x = reflect_pad_hw(x, k // 2)
    return conv2d(x, params["output"]["w"], params["output"]["b"], stride=1, padding=0)


def transformer_param_count(params: dict) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
