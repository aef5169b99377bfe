"""Import reference ``.pth`` checkpoints into this framework's param pytrees.

Converts the three pretrained artifact families the reference depends on
(SURVEY §5 'Checkpoint / resume'):

- ``models/vgg16-00b39a1b.pth`` — Johnson's Caffe-converted VGG-16
  (reference train_cnn.py:51-55)
- ``models/best-2.pth`` — ResNet-50 artist classifier, state dict nested
  under key ``'model'`` (reference classifier.py:62-63)
- ``models/<artist>/<method>/transfer*_<cw>-<sw>_<epoch>.pth`` — trained
  TransformerNets (reference train_cnn.py:173-178, cnn.py:41-42)

Layout conversions (torch -> TPU-native NHWC):

- Conv2d weight  OIHW -> HWIO  (transpose 2,3,1,0)
- ConvTranspose2d weight (I,O,kH,kW) -> spatially flipped HWIO
  (the one-time flip lets :func:`ops.conv.conv_transpose2d` run as a plain
  dilated convolution)
- Linear weight (out,in) -> (in,out)
- Norm layers: weight->gamma, bias->beta, running_mean->mean, running_var->var
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a ``.pth`` state dict as {key: numpy array}.

    Uses torch (CPU build available in this environment) for the zip/pickle
    parsing; everything downstream is numpy/JAX only.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and not any(
        hasattr(v, "numpy") for v in list(sd.values())[:3] if not isinstance(v, dict)
    ):
        # fastai-style wrapper: {'model': state_dict, 'opt': ...} (classifier.py:62-63)
        sd = sd["model"]
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def _conv_w(a: np.ndarray) -> jnp.ndarray:
    """OIHW -> HWIO."""
    return jnp.asarray(np.transpose(a, (2, 3, 1, 0)), jnp.float32)


def _convT_w(a: np.ndarray) -> jnp.ndarray:
    """torch ConvTranspose2d (I,O,kH,kW) -> spatially-flipped HWIO."""
    return jnp.asarray(np.transpose(a[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy(), jnp.float32)


def _vec(a: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(a, jnp.float32)


def transformer_params_from_torch(sd: dict[str, np.ndarray]) -> dict:
    """Reference ``StyleTransfer`` state dict (cnn.py:10-49 naming) -> pytree."""

    def conv_layer(prefix, norm=True):
        p = {"w": _conv_w(sd[f"{prefix}.conv_layer.weight"]),
             "b": _vec(sd[f"{prefix}.conv_layer.bias"])}
        if norm:
            p["gamma"] = _vec(sd[f"{prefix}.norm_layer.weight"])
            p["beta"] = _vec(sd[f"{prefix}.norm_layer.bias"])
        return p

    def deconv_layer(prefix):
        return {
            "w": _convT_w(sd[f"{prefix}.conv_transpose.weight"]),
            "b": _vec(sd[f"{prefix}.conv_transpose.bias"]),
            "gamma": _vec(sd[f"{prefix}.norm_layer.weight"]),
            "beta": _vec(sd[f"{prefix}.norm_layer.bias"]),
        }

    return {
        # ConvBlock indices 0,2,4,6 (ReLUs at odd indices; cnn.py:15-24)
        "encoder": [conv_layer(f"ConvBlock.{i}") for i in (0, 2, 4, 6)],
        "residual": [
            {"conv1": conv_layer(f"ResidualBlock.{i}.conv1"),
             "conv2": conv_layer(f"ResidualBlock.{i}.conv2")}
            for i in range(5)
        ],
        # DeconvBlock indices 0,2,4 are DeconvLayers; 6 is the output ConvLayer (cnn.py:32-39)
        "decoder": [deconv_layer(f"DeconvBlock.{i}") for i in (0, 2, 4)],
        "output": {
            "w": _conv_w(sd["DeconvBlock.6.conv_layer.weight"]),
            "b": _vec(sd["DeconvBlock.6.conv_layer.bias"]),
        },
    }


# torchvision vgg16.features conv indices through relu4_3 (train_cnn.py:70).
_VGG_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21)


def vgg16_params_from_torch(sd: dict[str, np.ndarray]) -> list[dict]:
    """torchvision vgg16 ``features.N.weight/bias`` state dict -> conv param list."""
    return [
        {"w": _conv_w(sd[f"features.{i}.weight"]), "b": _vec(sd[f"features.{i}.bias"])}
        for i in _VGG_CONV_IDX
    ]


def _bn_from(sd, prefix):
    return {
        "gamma": _vec(sd[f"{prefix}.weight"]),
        "beta": _vec(sd[f"{prefix}.bias"]),
        "mean": _vec(sd[f"{prefix}.running_mean"]),
        "var": _vec(sd[f"{prefix}.running_var"]),
    }


def classifier_params_from_torch(sd: dict[str, np.ndarray]) -> dict:
    """Reference ``ArtistClassifier`` state dict -> pytree.

    Key layout comes from classifier.py:48-60: body is ``0.*`` (resnet50
    children sans avgpool/fc: 0.0 conv1, 0.1 bn1, 0.4-0.7 layer1-4), head is
    ``1.*`` (1.2 BN4096, 1.4 Linear, 1.6 BN512, 1.8 Linear).
    """
    params: dict = {
        "stem": {"conv": {"w": _conv_w(sd["0.0.weight"])}, "bn": _bn_from(sd, "0.1")},
        "stages": [],
    }
    from artist_style_transfer_tpu.models.resnet import _RESNET50_STAGES

    for s_i, (num_blocks, _, _) in enumerate(_RESNET50_STAGES):
        base = f"0.{4 + s_i}"
        stage = []
        for b in range(num_blocks):
            pre = f"{base}.{b}"
            block = {
                "conv1": {"w": _conv_w(sd[f"{pre}.conv1.weight"])},
                "bn1": _bn_from(sd, f"{pre}.bn1"),
                "conv2": {"w": _conv_w(sd[f"{pre}.conv2.weight"])},
                "bn2": _bn_from(sd, f"{pre}.bn2"),
                "conv3": {"w": _conv_w(sd[f"{pre}.conv3.weight"])},
                "bn3": _bn_from(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                block["down_conv"] = {"w": _conv_w(sd[f"{pre}.downsample.0.weight"])}
                block["down_bn"] = _bn_from(sd, f"{pre}.downsample.1")
            stage.append(block)
        params["stages"].append(stage)
    params["head"] = {
        "bn1": _bn_from(sd, "1.2"),
        "fc1": {"w": jnp.asarray(sd["1.4.weight"].T, jnp.float32),
                "b": _vec(sd["1.4.bias"])},
        "bn2": _bn_from(sd, "1.6"),
        "fc2": {"w": jnp.asarray(sd["1.8.weight"].T, jnp.float32),
                "b": _vec(sd["1.8.bias"])},
    }
    return params


def transformer_params_to_torch(params: dict) -> dict[str, np.ndarray]:
    """Inverse of :func:`transformer_params_from_torch` — export a trained
    TransformerNet pytree as a reference-loadable state dict (cnn.py:41-42)."""
    sd: dict[str, np.ndarray] = {}

    def put_conv(prefix, p, norm=True):
        sd[f"{prefix}.conv_layer.weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
        sd[f"{prefix}.conv_layer.bias"] = np.asarray(p["b"])
        if norm:
            sd[f"{prefix}.norm_layer.weight"] = np.asarray(p["gamma"])
            sd[f"{prefix}.norm_layer.bias"] = np.asarray(p["beta"])

    def put_deconv(prefix, p):
        w = np.transpose(np.asarray(p["w"]), (2, 3, 0, 1))[:, :, ::-1, ::-1].copy()
        sd[f"{prefix}.conv_transpose.weight"] = w
        sd[f"{prefix}.conv_transpose.bias"] = np.asarray(p["b"])
        sd[f"{prefix}.norm_layer.weight"] = np.asarray(p["gamma"])
        sd[f"{prefix}.norm_layer.bias"] = np.asarray(p["beta"])

    for i, idx in enumerate((0, 2, 4, 6)):
        put_conv(f"ConvBlock.{idx}", params["encoder"][i])
    for i in range(5):
        put_conv(f"ResidualBlock.{i}.conv1", params["residual"][i]["conv1"])
        put_conv(f"ResidualBlock.{i}.conv2", params["residual"][i]["conv2"])
    for i, idx in enumerate((0, 2, 4)):
        put_deconv(f"DeconvBlock.{idx}", params["decoder"][i])
    put_conv("DeconvBlock.6", params["output"], norm=False)
    return sd


def classifier_params_to_torch(params: dict) -> dict[str, np.ndarray]:
    """Inverse of :func:`classifier_params_from_torch` — export a trained
    classifier pytree in the reference ``ArtistClassifier`` state-dict key
    layout (classifier.py:48-60), so a torch user can
    ``load_state_dict(sd['model'])`` it as a drop-in ``best-2.pth``.

    Includes each BN's ``num_batches_tracked`` (0) so a strict torch load
    succeeds.
    """
    sd: dict[str, np.ndarray] = {}

    def put_bn(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["gamma"])
        sd[f"{prefix}.bias"] = np.asarray(p["beta"])
        sd[f"{prefix}.running_mean"] = np.asarray(p["mean"])
        sd[f"{prefix}.running_var"] = np.asarray(p["var"])
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)

    def put_conv(key, p):
        sd[key] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))  # HWIO -> OIHW

    put_conv("0.0.weight", params["stem"]["conv"])
    put_bn("0.1", params["stem"]["bn"])
    for s_i, stage in enumerate(params["stages"]):
        base = f"0.{4 + s_i}"
        for b, block in enumerate(stage):
            pre = f"{base}.{b}"
            put_conv(f"{pre}.conv1.weight", block["conv1"])
            put_bn(f"{pre}.bn1", block["bn1"])
            put_conv(f"{pre}.conv2.weight", block["conv2"])
            put_bn(f"{pre}.bn2", block["bn2"])
            put_conv(f"{pre}.conv3.weight", block["conv3"])
            put_bn(f"{pre}.bn3", block["bn3"])
            if "down_conv" in block:
                put_conv(f"{pre}.downsample.0.weight", block["down_conv"])
                put_bn(f"{pre}.downsample.1", block["down_bn"])
    head = params["head"]
    put_bn("1.2", head["bn1"])
    sd["1.4.weight"] = np.asarray(head["fc1"]["w"]).T
    sd["1.4.bias"] = np.asarray(head["fc1"]["b"])
    put_bn("1.6", head["bn2"])
    sd["1.8.weight"] = np.asarray(head["fc2"]["w"]).T
    sd["1.8.bias"] = np.asarray(head["fc2"]["b"])
    return sd
