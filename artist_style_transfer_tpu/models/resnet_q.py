"""Int8-quantized ResNet-50 artist classifier (forward-only eval fast path).

The classifier is ALWAYS frozen in this framework's reference-parity
surfaces (the reference runs it in ``eval()``: train_cnn.py:158,
inference.py:62), and the quantitative-eval pipeline
(:mod:`artist_style_transfer_tpu.infer.evaluate`, reference
inference.py:153-166) uses it forward-only — so, like the frozen-VGG
training loss (ops/qconv.py), its convs can ride the int8 MXU (2x bf16
macs/cycle, half the operand bytes). This module is for that forward-only
path; 'classifier'-mode TRAINING differentiates through the classifier
and keeps the real-dtype :func:`models.resnet.classifier_apply`.

Scheme (mirrors the transformer/VGG int8 paths):

- Inference-mode BatchNorm is an affine map with frozen stats, so it
  folds into the preceding conv once at setup: ``w' = w * inv[c_out]``,
  ``b' = beta - mean * inv`` with ``inv = gamma / sqrt(var + eps)``
  (exactly :func:`ops.norm.batch_norm_inference` composed with the conv).
- Folded weights quantize per-output-channel int8; activations quantize
  with DYNAMIC per-tensor scales (absmax each call — no calibration pass
  needed, and eval inputs vary wildly across stylized artists).
- The 7x7 stem conv keeps bf16 (C_in=3 int8 pads ~40x on this toolchain —
  same wall as the transformer endpoints, models/transformer_q.py) with
  its BN folded the same way; the fastai head (BN1d/Linear on 4096/512
  vectors) is tiny and stays bf16.

Unlike the TransformerNet (where InstanceNorm re-centers after every conv,
making quantization bias-free), ResNet's folded BN means activation
quantization error propagates — but it is rounding noise on a 19-way
argmax; tests bound the logit deviation and top-1 agreement vs the
real-dtype forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.models.resnet import _RESNET50_STAGES
from artist_style_transfer_tpu.ops.conv import (
    avg_pool_global,
    conv2d,
    linear,
    max_pool2d,
    max_pool_global,
)
from artist_style_transfer_tpu.ops.norm import BATCH_NORM_EPS
from artist_style_transfer_tpu.ops.qconv import conv2d_frozen_int8, quant_weight

_REAL_DTYPE = jnp.bfloat16


def _fold_bn(w_hwio: jax.Array, bn: dict):
    """Fold inference-mode BN into the conv: returns (w', b') in f32."""
    inv = bn["gamma"] / jnp.sqrt(bn["var"] + BATCH_NORM_EPS)
    w = w_hwio.astype(jnp.float32) * inv  # broadcast over the C_out axis
    b = bn["beta"] - bn["mean"] * inv
    return w, b


def _quant_conv_params(conv: dict, bn: dict) -> dict:
    w, b = _fold_bn(conv["w"], bn)
    wq, sw = quant_weight(w)
    return {"wq": wq, "sw": sw, "b": b.astype(jnp.float32)}


def quantize_classifier(params: dict) -> dict:
    """Quantize ResNet-50+head params for int8 forward-only inference.

    ``params`` is the pytree :func:`models.resnet.init_classifier_params` /
    the best-2.pth importer produce. Stateless — safe to call per load in
    the serving/eval paths.
    """
    def bf(p):
        return jax.tree.map(lambda a: a.astype(_REAL_DTYPE), p)

    stem_w, stem_b = _fold_bn(params["stem"]["conv"]["w"], params["stem"]["bn"])
    out: dict = {
        # bf16 stem with the BN pre-folded (one fewer elementwise pass too)
        "stem": {"w": stem_w.astype(_REAL_DTYPE), "b": stem_b.astype(jnp.float32)},
        "stages": [],
        "head": bf(params["head"]),
    }
    for stage in params["stages"]:
        qstage = []
        for block in stage:
            qblock = {
                "conv1": _quant_conv_params(block["conv1"], block["bn1"]),
                "conv2": _quant_conv_params(block["conv2"], block["bn2"]),
                "conv3": _quant_conv_params(block["conv3"], block["bn3"]),
            }
            if "down_conv" in block:
                qblock["down"] = _quant_conv_params(
                    block["down_conv"], block["down_bn"]
                )
            qstage.append(qblock)
        out["stages"].append(qstage)
    return out


def classifier_is_quantized(params) -> bool:
    """True for pytrees produced by :func:`quantize_classifier`."""
    return (
        isinstance(params, dict)
        and "stages" in params
        and bool(params["stages"])
        and "wq" in params["stages"][0][0].get("conv1", {})
    )


def _conv_i8_dyn(x: jax.Array, p: dict, stride: int, padding: int) -> jax.Array:
    """Dynamic per-tensor int8 conv + folded-BN bias -> bf16.

    Routed through :func:`ops.qconv.conv2d_frozen_int8`, whose custom VJP
    gives the STE data gradient on the int8 MXU — so the same forward
    serves both the eval pipeline (no gradients) and 'classifier'-mode
    training, where style gradients flow through the frozen classifier
    into the stylizer (reference train_cnn.py:311-314).
    """
    return conv2d_frozen_int8(x, p["wq"], p["sw"], p["b"], padding, stride)


def classifier_apply_int8(
    qparams: dict, x: jax.Array, return_features: bool = False
) -> jax.Array:
    """Logits (N, num_classes) from NHWC RGB torchvision-normalized input.

    Same contract as :func:`models.resnet.classifier_apply`; every
    bottleneck conv runs on the int8 MXU with its BN folded in.
    """
    x = x.astype(_REAL_DTYPE)
    stem = qparams["stem"]
    h = conv2d(x, stem["w"], None, stride=2, padding=3)
    x = jnp.maximum(h.astype(jnp.float32) + stem["b"], 0.0).astype(_REAL_DTYPE)
    x = max_pool2d(x, 3, 2, padding=1)
    for stage, (_, _, stride) in zip(qparams["stages"], _RESNET50_STAGES):
        for b, block in enumerate(stage):
            s = stride if b == 0 else 1
            identity = x
            h = jnp.maximum(_conv_i8_dyn(x, block["conv1"], 1, 0), 0)
            h = jnp.maximum(_conv_i8_dyn(h, block["conv2"], s, 1), 0)
            h = _conv_i8_dyn(h, block["conv3"], 1, 0)
            if "down" in block:
                identity = _conv_i8_dyn(x, block["down"], s, 0)
            x = jnp.maximum(h + identity, 0)
    feats = jnp.concatenate([max_pool_global(x), avg_pool_global(x)], axis=-1)
    head = qparams["head"]

    def bn1d(v, p):
        inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + BATCH_NORM_EPS)
        inv = inv * p["gamma"].astype(jnp.float32)
        return v.astype(jnp.float32) * inv + (
            p["beta"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * inv
        )

    h = bn1d(feats, head["bn1"]).astype(_REAL_DTYPE)
    h = jax.nn.relu(linear(h, head["fc1"]["w"], head["fc1"]["b"]))
    if return_features:
        return h
    h = bn1d(h, head["bn2"]).astype(_REAL_DTYPE)
    return linear(h, head["fc2"]["w"], head["fc2"]["b"])
