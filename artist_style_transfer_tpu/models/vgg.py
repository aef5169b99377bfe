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

import functools as _functools

import jax
import jax.numpy as jnp
import numpy as np

from artist_style_transfer_tpu.ops.conv import (
    conv2d,
    conv2d_frozen_smallcin,
    max_pool2d,
    max_pool2d_2x2_fast,
    relu_fast,
    relu_max_pool2x2_fast,
)
from artist_style_transfer_tpu.ops.qconv import conv2d_frozen_int8
from artist_style_transfer_tpu.ops.precision import get_precision

VGG_LAYER_NAMES = ("relu1_2", "relu2_2", "relu3_3", "relu4_3")

# Batch->H folding (fast-mode training path): zero separator rows inserted
# between images when the batch is folded into the H axis for the C<128
# shallow blocks. FOLD_SEP rows at full resolution (split half above / half
# below each image), FOLD_SEP//2 at the 112-res block — so relu1_2 taps are
# (N, H+FOLD_SEP, W, 64) and relu2_2 taps (N, H//2+FOLD_SEP//2, W//2, 128).
FOLD_SEP = 8
# Fold pad rows per tap name (0 = tap is never folded).
FOLD_PAD = {"relu1_2": FOLD_SEP, "relu2_2": FOLD_SEP // 2, "relu3_3": 0, "relu4_3": 0}

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


@_functools.lru_cache(maxsize=None)
def _fold_mask_np(n: int, h: int, sep: int):
    """(n*(h+sep), 1) 0/1 row mask: content rows at i*(h+sep) + sep//2."""
    b = h + sep
    m = np.zeros((n * b, 1), np.float32)
    for i in range(n):
        m[i * b + sep // 2 : i * b + sep // 2 + h] = 1.0
    return m


def _fold_mask(n: int, h: int, sep: int, dtype) -> jax.Array:
    return jnp.asarray(_fold_mask_np(n, h, sep).astype(dtype))[None, :, :, None]


def _vgg16_features_folded(
    params: list[dict], x: jax.Array, just_content: bool
) -> dict[str, jax.Array] | jax.Array:
    """The conv1/conv2 blocks with the batch folded into H (fast mode).

    At C<128 XLA assigns N-minor (batch-in-lanes) conv layouts, and every
    non-conv consumer (gram dots, pool reshapes) pays full-tensor layout
    copies to get a C-minor layout back — the round-2 op profile attributed
    ~23 ms/step of a 154 ms 'cycle' train step to the relu1_2 cluster alone.
    Folding the batch into H with ``FOLD_SEP`` zero separator rows per image
    makes these convs batch-1 (N-minor impossible) while staying exact: the
    zero rows ARE each image's SAME zero padding (VGG convs are zero-padded,
    torchvision vgg16 / reference train_cnn.py:50-78), and masking the
    separator rows after each conv restores them to zero before they are
    read as padding by the next one.

    Returned relu1_2/relu2_2 taps KEEP the zero separator rows
    (``FOLD_PAD[name]`` extra H rows): Gram sums are unaffected by zero rows,
    and the style/content losses rescale their mean-normalizations by the
    true row count (see ops.losses). relu3_3/relu4_3 continue unfolded after
    a quarter-resolution slice at pool2.
    """
    n, h, w, _ = x.shape
    taps: dict[str, jax.Array] = {}
    fold = FOLD_SEP
    b1 = h + fold
    m1 = _fold_mask(n, h, fold, x.dtype)
    xf = jnp.pad(x, ((0, 0), (fold // 2, fold // 2), (0, 0), (0, 0)))
    xf = xf.reshape(1, n * b1, w, x.shape[3])
    y = relu_fast(conv2d_frozen_smallcin(xf, params[0]["w"], params[0]["b"], 1) * m1)
    pre = conv2d(y, params[1]["w"], params[1]["b"], stride=1, padding=1)
    pre = (pre * m1).reshape(n, b1, w, 64)
    tap1, pool1 = relu_max_pool2x2_fast(pre)
    taps["relu1_2"] = tap1  # folded: (n, h+FOLD_SEP, w, 64)

    h2, w2, b2 = h // 2, w // 2, b1 // 2
    m2 = _fold_mask(n, h2, fold // 2, x.dtype)
    y = pool1.reshape(1, n * b2, w2, 64)
    y = relu_fast(conv2d(y, params[2]["w"], params[2]["b"], stride=1, padding=1) * m2)
    pre = conv2d(y, params[3]["w"], params[3]["b"], stride=1, padding=1)
    pre = pre * m2
    if just_content:
        # relu2_2 only (reference train_cnn.py:64-68), folded.
        return relu_fast(pre).reshape(n, b2, w2, 128)
    pre = pre.reshape(n, b2, w2, 128)
    tap2, pool2 = relu_max_pool2x2_fast(pre)
    taps["relu2_2"] = tap2  # folded: (n, h//2+FOLD_SEP//2, w//2, 128)

    # Unfold at quarter resolution (cheap: C=128 from here on, no pathology)
    # and continue with the standard composition for blocks 3-4. Content
    # rows sit at fold//2 at full res, fold//4 at half, fold//8 at quarter.
    x = pool2[:, fold // 8 : fold // 8 + h // 4]
    relu = relu_fast
    conv_i = 4
    i = 6  # _VGG_CFG index of conv3_1 (after (3,64),(64,64),"M",(64,128),(128,128),"M")
    while i < len(_VGG_CFG):
        c = _VGG_CFG[i]
        if c == "M":
            x = max_pool2d_2x2_fast(x) if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0 else max_pool2d(x, 2, 2)
            i += 1
            continue
        p = params[conv_i]
        name = _TAP_AFTER_CONV.get(conv_i)
        if "wq" in p:
            # int8-quantized frozen conv (quantize_vgg16_loss 'deep'): the
            # folded shallow blocks compose with the int8 MXU deep blocks —
            # the fold fixes the C<128 layout pathology where it lives
            # (blocks 1-2), the int8 convs take the compute-bound 56^2/28^2
            # blocks, and they meet at the pool2 unfold.
            pre = conv2d_frozen_int8(x, p["wq"], p["sw"], p["b"], 1)
        else:
            pre = conv2d(x, p["w"], p["b"], stride=1, padding=1)
        if i + 1 < len(_VGG_CFG) and _VGG_CFG[i + 1] == "M" and pre.shape[1] % 2 == 0 and pre.shape[2] % 2 == 0:
            tap, x = relu_max_pool2x2_fast(pre)
            i += 2
        else:
            tap = x = relu(pre)
            i += 1
        if name is not None:
            taps[name] = tap
        conv_i += 1
    return taps


def fold_batch_ok(x_shape) -> bool:
    """Folding needs H % 4 == 0 (pool alignment at both folded blocks)."""
    return x_shape[1] % 4 == 0 and x_shape[2] % 4 == 0


def fold_params_ok(params) -> bool:
    """Folding covers conv1_1..conv2_2 in bf16 — those four must be
    un-quantized (quantize_vgg16_loss 'deep' qualifies, 'all' does not)."""
    return not any("wq" in p for p in params[:4])


def vgg_is_quantized(params) -> bool:
    """True for param lists produced by :func:`quantize_vgg16_loss`."""
    return isinstance(params, (list, tuple)) and any("wq" in p for p in params)


def quantize_vgg16_loss(
    params: list[dict], layers: str | int = "deep", dtype=jnp.bfloat16
) -> list[dict]:
    """Quantize the frozen VGG's convs to int8 for the training-loss path.

    VGG is always frozen here (reference train_cnn.py:60-61), so both its
    forward and its data gradient can run on the int8 MXU — see
    :mod:`artist_style_transfer_tpu.ops.qconv` for the scheme and the STE
    backward. ``layers`` selects which convs are quantized:

    - ``"deep"``: conv3_1..conv4_3 — the compute-bound 64% of the VGG
      FLOPs at 56^2/28^2, where int8 is a pure MXU-rate win and the
      dynamic-scale quant passes touch only small tensors. The relu1_2 /
      relu2_2 taps (content loss + the two shallow gram terms) stay exact
      bf16.
    - ``"all"``: every conv except conv1_1 (C_in=3 int8 pads ~40x on this
      toolchain — see models/transformer_q.py; it keeps the factored bf16
      frozen path).

    Unquantized convs keep real weights cast to ``dtype`` (the training
    compute dtype); quantized convs carry int8 ``wq`` + f32 per-channel
    ``sw`` and f32 bias. The result is a drop-in replacement for the f32
    params everywhere :func:`vgg16_features` is used (style-target
    builders, content-feature precompute, the train step), which keeps the
    loss a consistent metric: targets and generated images pass through
    the SAME quantized extractor.

    An integer ``layers`` selects the first quantized conv index directly
    (0 = conv1_1 .. 9 = conv4_3; conv1_1 is never quantized).
    """
    from artist_style_transfer_tpu.ops.qconv import quant_weight

    first_q = (
        max(1, int(layers))
        if not isinstance(layers, str)
        else {"deep": 4, "all": 1}[layers]
    )
    out = []
    for i, p in enumerate(params):
        if i < first_q:
            out.append({"w": p["w"].astype(dtype), "b": p["b"].astype(dtype)})
        else:
            wq, sw = quant_weight(p["w"])
            out.append({"wq": wq, "sw": sw, "b": p["b"].astype(jnp.float32)})
    return out


def vgg16_features(
    params: list[dict],
    x: jax.Array,
    just_content: bool = False,
    fold_batch: bool = False,
) -> dict[str, jax.Array] | jax.Array:
    """Run the truncated VGG16 stack; returns the 4 tap activations (or relu2_2 only).

    ``x`` is NHWC BGR, already Caffe-mean-subtracted. Early-exits after
    relu2_2 when ``just_content`` (reference train_cnn.py:64-68) and after
    relu4_3 otherwise (train_cnn.py:76-77).
    """
    taps: dict[str, jax.Array] = {}
    if vgg_is_quantized(params):
        # The quantized extractor is self-contained: it runs in the dtype
        # its real-unit leaves were materialized in (quantize_vgg16_loss's
        # ``dtype``), whatever the caller feeds it — so style-target
        # builders (f32 paintings) and the bf16 train step see the SAME
        # feature function.
        x = x.astype(params[0]["w"].dtype)
    fast = get_precision() != "highest"
    if fold_batch and fast and fold_batch_ok(x.shape) and fold_params_ok(params):
        return _vgg16_features_folded(params, x, just_content)
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
        if "wq" in p:
            # int8-quantized frozen conv (quantize_vgg16_loss): fwd AND the
            # STE data gradient run on the int8 MXU (ops/qconv.py).
            pre = conv2d_frozen_int8(x, p["wq"], p["sw"], p["b"], 1)
        elif conv_i == 0 and fast:
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
