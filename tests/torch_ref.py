"""From-scratch PyTorch implementations of the three architectures, used as
numerical oracles in the test suite (and for measuring the PyTorch-CPU
baseline in bench.py).

These are written from the architecture specs in SURVEY.md §2 — NOT copied
from the reference — but deliberately reproduce the reference models'
*state-dict key naming* (cnn.py / classifier.py / torchvision conventions)
so the importers in ``utils/torch_import.py`` are exercised against
realistic checkpoints. torchvision itself is not installed here.
"""

from __future__ import annotations

import torch
import torch.nn as nn


# ---------------------------------------------------------------------------
# TransformerNet oracle (key naming per reference cnn.py:10-124)
# ---------------------------------------------------------------------------
class _ConvLayer(nn.Module):
    def __init__(self, cin, cout, k, s, norm="instance"):
        super().__init__()
        self.pad = k // 2
        self.conv_layer = nn.Conv2d(cin, cout, k, s)
        self.norm_type = norm
        if norm == "instance":
            self.norm_layer = nn.InstanceNorm2d(cout, affine=True)

    def forward(self, x):
        if self.pad:
            x = nn.functional.pad(x, (self.pad,) * 4, mode="reflect")
        x = self.conv_layer(x)
        if self.norm_type == "instance":
            x = self.norm_layer(x)
        return x


class _ResidualLayer(nn.Module):
    def __init__(self, c=128, k=3):
        super().__init__()
        self.conv1 = _ConvLayer(c, c, k, 1)
        self.conv2 = _ConvLayer(c, c, k, 1)

    def forward(self, x):
        return self.conv2(torch.relu(self.conv1(x))) + x


class _DeconvLayer(nn.Module):
    def __init__(self, cin, cout, k, s, op):
        super().__init__()
        self.conv_transpose = nn.ConvTranspose2d(cin, cout, k, s, k // 2, op)
        self.norm_layer = nn.InstanceNorm2d(cout, affine=True)

    def forward(self, x):
        return self.norm_layer(self.conv_transpose(x))


class TorchTransformerNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.ConvBlock = nn.Sequential(
            _ConvLayer(3, 32, 9, 1), nn.ReLU(),
            _ConvLayer(32, 64, 3, 2), nn.ReLU(),
            _ConvLayer(64, 128, 3, 2), nn.ReLU(),
            _ConvLayer(128, 128, 1, 1), nn.ReLU(),
        )
        self.ResidualBlock = nn.Sequential(*[_ResidualLayer() for _ in range(5)])
        self.DeconvBlock = nn.Sequential(
            _DeconvLayer(128, 128, 1, 1, 0), nn.ReLU(),
            _DeconvLayer(128, 64, 3, 2, 1), nn.ReLU(),
            _DeconvLayer(64, 32, 3, 2, 1), nn.ReLU(),
            _ConvLayer(32, 3, 9, 1, norm="None"),
        )

    def forward(self, x):
        return self.DeconvBlock(self.ResidualBlock(self.ConvBlock(x)))


# ---------------------------------------------------------------------------
# Truncated VGG16 oracle (torchvision features naming through index 21)
# ---------------------------------------------------------------------------
class TorchVGG16Features(nn.Module):
    """Conv stack through relu4_3 with torchvision ``features.N`` key naming."""

    CFG = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
           (10, 128, 256), (12, 256, 256), (14, 256, 256),
           (17, 256, 512), (19, 512, 512), (21, 512, 512)]
    POOL_BEFORE = {5, 10, 17}  # a 2x2 maxpool precedes these conv indices
    TAPS = {3: "relu1_2", 8: "relu2_2", 15: "relu3_3", 22: "relu4_3"}

    def __init__(self):
        super().__init__()
        self.features = nn.Module()
        for idx, cin, cout in self.CFG:
            self.features.add_module(str(idx), nn.Conv2d(cin, cout, 3, padding=1))

    def forward(self, x):
        taps = {}
        for idx, _, _ in self.CFG:
            if idx in self.POOL_BEFORE:
                x = nn.functional.max_pool2d(x, 2, 2)
            x = torch.relu(getattr(self.features, str(idx))(x))
            if idx + 1 in self.TAPS:
                taps[self.TAPS[idx + 1]] = x
        return taps


# ---------------------------------------------------------------------------
# ResNet-50 + fastai head oracle (key naming per reference classifier.py:43-60)
# ---------------------------------------------------------------------------
class _Bottleneck(nn.Module):
    def __init__(self, cin, width, stride):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return torch.relu(h + idt)


class _ConcatPool(nn.Module):
    def forward(self, x):
        mp = nn.functional.adaptive_max_pool2d(x, 1)
        ap = nn.functional.adaptive_avg_pool2d(x, 1)
        return torch.cat([mp, ap], 1)


class _Flatten(nn.Module):
    def forward(self, x):
        return x.reshape(x.size(0), -1)


def make_torch_classifier(num_classes: int = 19) -> nn.Sequential:
    """nn.Sequential with the exact key layout of reference ArtistClassifier."""

    def stage(cin, width, blocks, stride):
        mods = [_Bottleneck(cin, width, stride)]
        for _ in range(blocks - 1):
            mods.append(_Bottleneck(width * 4, width, 1))
        return nn.Sequential(*mods)

    body = nn.Sequential(
        nn.Conv2d(3, 64, 7, 2, 3, bias=False),
        nn.BatchNorm2d(64),
        nn.ReLU(),
        nn.MaxPool2d(3, 2, 1),
        stage(64, 64, 3, 1),
        stage(256, 128, 4, 2),
        stage(512, 256, 6, 2),
        stage(1024, 512, 3, 2),
    )
    head = nn.Sequential(
        _ConcatPool(), _Flatten(), nn.BatchNorm1d(4096), nn.Dropout(0.0),
        nn.Linear(4096, 512), nn.ReLU(), nn.BatchNorm1d(512), nn.Dropout(0.0),
        nn.Linear(512, num_classes),
    )
    return nn.Sequential(body, head)


def randomize_bn_stats(model: nn.Module, seed: int = 0) -> None:
    """Give BN layers non-trivial running stats so parity tests catch
    stats-handling bugs (fresh BN has mean 0 / var 1 which hides them)."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.5)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 2.0 + 0.5)
