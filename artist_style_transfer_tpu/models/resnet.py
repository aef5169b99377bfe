"""ResNet-50 artist classifier with fastai-style head (19 classes).

Matches reference ``ArtistClassifier`` (classifier.py:43-66): torchvision
resnet50 body (avgpool+fc removed), then
AdaptiveConcatPool2d(1) [max first, then avg — classifier.py:25] -> Flatten
-> BatchNorm1d(4096) -> Dropout(0) -> Linear(4096, 512) -> ReLU ->
BatchNorm1d(512) -> Dropout(0) -> Linear(512, 19).

Always inference-mode: BN uses frozen running statistics, exactly as the
reference runs the classifier in ``eval()`` (train_cnn.py:158,
inference.py:62). Gradients still flow through it into the stylizer in
'classifier' training mode (train_cnn.py:311-314).

Input: NHWC, **RGB**, [0,1] torchvision-normalized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.ops.conv import (
    avg_pool_global,
    conv2d,
    linear,
    max_pool2d,
    max_pool_global,
)
from artist_style_transfer_tpu.ops.norm import batch_norm_inference, batch_norm_train

# The 19 artist classes, reference train_cnn.py:262-266 / inference.py:15-19.
ARTISTS_19 = (
    "Alfred_Sisley", "Amedeo_Modigliani", "Andy_Warhol", "Edgar_Degas",
    "Francisco_Goya", "Henri_Matisse", "Leonardo_da_Vinci", "Marc_Chagall",
    "Mikhail_Vrubel", "Pablo_Picasso", "Paul_Gauguin", "Paul_Klee",
    "Peter_Paul_Rubens", "Pierre-Auguste_Renoir", "Rembrandt", "Rene_Magritte",
    "Sandro_Botticelli", "Titian", "Vincent_van_Gogh",
)

# (num_blocks, bottleneck_width, stride_of_first_block) per stage; out = width*4.
_RESNET50_STAGES = ((3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2))


def _bn_params(key, c):
    return {
        "gamma": jnp.ones((c,), jnp.float32),
        "beta": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        # Random-ish variance in tests exercises the running-stats path.
        "var": jnp.ones((c,), jnp.float32),
    }


def _conv_params(key, k, cin, cout):
    fan_in = cin * k * k
    bound = 1.0 / (fan_in ** 0.5)
    return {"w": jax.random.uniform(key, (k, k, cin, cout), jnp.float32, -bound, bound)}


def _linear_params(key, cin, cout):
    kw, kb = jax.random.split(key)
    bound = 1.0 / (cin ** 0.5)
    return {
        "w": jax.random.uniform(kw, (cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def init_classifier_params(key: jax.Array, num_classes: int = 19) -> dict:
    """Random ResNet-50+head params (tests; real use imports best-2.pth)."""
    keys = iter(jax.random.split(key, 256))
    params: dict = {
        "stem": {"conv": _conv_params(next(keys), 7, 3, 64), "bn": _bn_params(next(keys), 64)},
        "stages": [],
    }
    cin = 64
    for num_blocks, width, stride in _RESNET50_STAGES:
        stage = []
        for b in range(num_blocks):
            cout = width * 4
            s = stride if b == 0 else 1
            block = {
                "conv1": _conv_params(next(keys), 1, cin, width),
                "bn1": _bn_params(next(keys), width),
                "conv2": _conv_params(next(keys), 3, width, width),
                "bn2": _bn_params(next(keys), width),
                "conv3": _conv_params(next(keys), 1, width, cout),
                "bn3": _bn_params(next(keys), cout),
            }
            if b == 0:
                block["down_conv"] = _conv_params(next(keys), 1, cin, cout)
                block["down_bn"] = _bn_params(next(keys), cout)
            stage.append(block)
            cin = cout
        params["stages"].append(stage)
    params["head"] = {
        "bn1": _bn_params(next(keys), 4096),
        "fc1": _linear_params(next(keys), 4096, 512),
        "bn2": _bn_params(next(keys), 512),
        "fc2": _linear_params(next(keys), 512, num_classes),
    }
    return params


def _bn(x, p):
    return batch_norm_inference(x, p["gamma"], p["beta"], p["mean"], p["var"])


def _bottleneck(p: dict, x: jax.Array, stride: int, bn, prefix: str) -> jax.Array:
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1, BN+ReLU, projection skip."""
    identity = x
    h = jax.nn.relu(bn(conv2d(x, p["conv1"]["w"], stride=1, padding=0), p["bn1"], f"{prefix}.bn1"))
    h = jax.nn.relu(bn(conv2d(h, p["conv2"]["w"], stride=stride, padding=1), p["bn2"], f"{prefix}.bn2"))
    h = bn(conv2d(h, p["conv3"]["w"], stride=1, padding=0), p["bn3"], f"{prefix}.bn3")
    if "down_conv" in p:
        identity = bn(
            conv2d(x, p["down_conv"]["w"], stride=stride, padding=0),
            p["down_bn"], f"{prefix}.down_bn",
        )
    return jax.nn.relu(h + identity)


def _forward(params: dict, x: jax.Array, bn, return_features: bool) -> jax.Array:
    """Shared trunk; ``bn(x, bn_params, path_key)`` supplies the BN behavior."""
    p = params["stem"]
    x = jax.nn.relu(bn(conv2d(x, p["conv"]["w"], stride=2, padding=3), p["bn"], "stem.bn"))
    x = max_pool2d(x, 3, 2, padding=1)
    for si, (stage, (num_blocks, _, stride)) in enumerate(
        zip(params["stages"], _RESNET50_STAGES)
    ):
        for b, block in enumerate(stage):
            x = _bottleneck(block, x, stride if b == 0 else 1, bn, f"stages.{si}.{b}")
    # fastai AdaptiveConcatPool2d: max pool first, then avg (classifier.py:25).
    feats = jnp.concatenate([max_pool_global(x), avg_pool_global(x)], axis=-1)  # (N, 4096)
    h = bn(feats, params["head"]["bn1"], "head.bn1")
    h = jax.nn.relu(linear(h, params["head"]["fc1"]["w"], params["head"]["fc1"]["b"]))
    if return_features:
        return h
    h = bn(h, params["head"]["bn2"], "head.bn2")
    return linear(h, params["head"]["fc2"]["w"], params["head"]["fc2"]["b"])


def classifier_apply(
    params: dict, x: jax.Array, return_features: bool = False
) -> jax.Array:
    """Logits (N, num_classes) from NHWC RGB torchvision-normalized input.

    Inference mode: BN uses the frozen running statistics, exactly as the
    reference runs the classifier in ``eval()`` (train_cnn.py:158).

    ``return_features=True`` returns the 512-dim penultimate representation
    (post-ReLU fc1 output) instead — the embedding the Fréchet eval metric
    uses (:mod:`artist_style_transfer_tpu.diffusion.evaluate`).
    """
    return _forward(params, x, lambda h, p, _key: _bn(h, p), return_features)


def classifier_apply_train(
    params: dict, x: jax.Array, return_features: bool = False
) -> tuple[jax.Array, dict]:
    """Training-mode forward: BN normalizes by *batch* statistics.

    Returns ``(logits, bn_stats)`` where ``bn_stats`` maps each BN layer's
    params-pytree path (e.g. ``"stages.0.1.bn2"``) to its
    ``(batch_mean, batch_var_unbiased)`` — feed to
    :func:`update_running_stats` for the torch-momentum running-stat update.
    This is the mode for training the classifier itself
    (:mod:`artist_style_transfer_tpu.train.classifier`); style-transfer
    training always uses the frozen :func:`classifier_apply`.
    """
    stats: dict = {}

    def bn(h, p, key):
        y, mean, var = batch_norm_train(h, p["gamma"], p["beta"])
        stats[key] = (mean, var)
        return y

    out = _forward(params, x, bn, return_features)
    return out, stats


def update_running_stats(params: dict, bn_stats: dict, momentum: float = 0.1) -> dict:
    """New params pytree with BN running stats updated torch-style.

    ``running = (1 - momentum) * running + momentum * batch_stat`` with
    torch's default ``momentum=0.1`` (unbiased batch variance), matching
    ``nn.BatchNorm{1,2}d.forward`` in train mode.
    """

    def upd(path, leaf):
        parts = [
            str(getattr(p, "key", getattr(p, "idx", ""))) for p in path
        ]
        if parts[-1] not in ("mean", "var"):
            return leaf
        key = ".".join(parts[:-1])
        if key not in bn_stats:
            return leaf
        batch = bn_stats[key][0 if parts[-1] == "mean" else 1]
        return (1.0 - momentum) * leaf + momentum * batch

    return jax.tree_util.tree_map_with_path(upd, params)
