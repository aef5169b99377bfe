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
    conv2d,
    conv2d_reflect,
    conv2d_reflect_cinfactored,
    conv2d_reflect_dxfactored,
    conv_transpose2d,
)
from artist_style_transfer_tpu.ops.norm import instance_norm, instance_norm_act
from artist_style_transfer_tpu.ops.pad import reflect_pad_hw  # noqa: F401 (bit-exact alternative)
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


def transformer_apply(params: dict, x: jax.Array) -> jax.Array:
    """Forward pass: NHWC BGR [0,255] -> NHWC BGR unbounded (reference cnn.py:45-49)."""
    fast = get_precision() != "highest"
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
