"""VGG16 feature extractor (Caffe-style weights) for perceptual/style losses.

Matches reference ``VGG16`` (train_cnn.py:50-78): the torchvision vgg16
``features`` stack truncated at relu4_3, returning activations
{'relu1_2', 'relu2_2', 'relu3_3', 'relu4_3'} (torchvision features indices
3, 8, 15, 22). The ``just_content`` variant returns only relu2_2
(train_cnn.py:64-68).

Input: NHWC, **BGR**, [0, 255] minus the Caffe ImageNet mean (apply
:func:`artist_style_transfer_tpu.ops.image.vgg_caffe_preprocess` first) —
the weights are Justin Johnson's Caffe conversion (reference
models/vgg16-00b39a1b.pth, train_cnn.py:51).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.ops.conv import (
    conv2d,
    conv2d_frozen_smallcin,
    max_pool2d,
    max_pool2d_2x2_fast,
    relu_fast,
    relu_max_pool2x2_fast,
)
from artist_style_transfer_tpu.ops.precision import get_precision

VGG_LAYER_NAMES = ("relu1_2", "relu2_2", "relu3_3", "relu4_3")

# Conv stack through relu4_3: (in_ch, out_ch) per 3x3/1 pad-1 conv; "M" = 2x2/2 maxpool.
# torchvision vgg16.features indices of these convs: 0,2, 5,7, 10,12,14, 17,19,21.
_VGG_CFG = (
    (3, 64), (64, 64), "M",
    (64, 128), (128, 128), "M",
    (128, 256), (256, 256), (256, 256), "M",
    (256, 512), (512, 512), (512, 512),
)
# Positions (index into conv counter, 0-based, after which conv+relu to tap).
_TAP_AFTER_CONV = {1: "relu1_2", 3: "relu2_2", 6: "relu3_3", 9: "relu4_3"}


def init_vgg16_params(key: jax.Array) -> list[dict]:
    """Random VGG16 conv params (for tests; real use imports Caffe weights)."""
    convs = [c for c in _VGG_CFG if c != "M"]
    keys = jax.random.split(key, len(convs))
    params = []
    for k, (cin, cout) in zip(keys, convs):
        fan_in = cin * 9
        bound = 1.0 / (fan_in ** 0.5)
        kw, kb = jax.random.split(k)
        params.append(
            {
                "w": jax.random.uniform(kw, (3, 3, cin, cout), jnp.float32, -bound, bound),
                "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
            }
        )
    return params


def vgg16_features(
    params: list[dict],
    x: jax.Array,
    just_content: bool = False,
) -> dict[str, jax.Array] | jax.Array:
    """Run the truncated VGG16 stack; returns the 4 tap activations (or relu2_2 only).

    ``x`` is NHWC BGR, already Caffe-mean-subtracted. Early-exits after
    relu2_2 when ``just_content`` (reference train_cnn.py:64-68) and after
    relu4_3 otherwise (train_cnn.py:76-77).
    """
    taps: dict[str, jax.Array] = {}
    fast = get_precision() != "highest"
    relu = relu_fast if fast else jax.nn.relu
    conv_i = 0
    i = 0
    while i < len(_VGG_CFG):
        c = _VGG_CFG[i]
        if c == "M":
            if fast and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                x = max_pool2d_2x2_fast(x)
            else:
                x = max_pool2d(x, 2, 2)
            i += 1
            continue
        p = params[conv_i]
        name = _TAP_AFTER_CONV.get(conv_i)
        if conv_i == 0 and fast:
            # VGG is always frozen here (train_cnn.py:60-61); in fast mode
            # route conv1_1 through the frozen-layer op so the gradient back
            # into the generated image avoids the C=3 MXU-lane pathology.
            pre = conv2d_frozen_smallcin(x, p["w"], p["b"], 1)
        else:
            pre = conv2d(x, p["w"], p["b"], stride=1, padding=1)
        if (
            fast
            and i + 1 < len(_VGG_CFG)
            and _VGG_CFG[i + 1] == "M"
            and pre.shape[1] % 2 == 0
            and pre.shape[2] % 2 == 0
            and not (just_content and name == "relu2_2")
        ):
            # conv -> relu -> tap -> pool: fused relu+pool with a uint8
            # argmax-code backward (no full-res activation re-read).
            tap, x = relu_max_pool2x2_fast(pre)
            i += 2  # the pool is consumed by the fused op
        else:
            tap = x = relu(pre)
            i += 1
        if name is not None:
            if just_content and name == "relu2_2":
                return tap
            taps[name] = tap
        conv_i += 1
    return taps
