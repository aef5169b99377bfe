"""Training stack: the five artist-representation modes, jit-compiled end to end.

- :mod:`styles` — per-mode style-target builders (reference train_cnn.py:181-244)
- :mod:`loop` — the jitted train step / epoch scan (reference hot loop
  train_cnn.py:290-359, rebuilt with zero host traffic per step)
- :mod:`api` — the ``train()`` entry point mirroring train_cnn.py:144-146
- :mod:`gatys` — iterative pixel-space optimization (BASELINE config 1)
- :mod:`classifier` — train the ResNet-50 artist classifier itself (the
  upstream Kaggle workflow behind ``models/best-2.pth``, reference
  README.md:34-35)
"""

from artist_style_transfer_tpu.train.api import train  # noqa: F401
