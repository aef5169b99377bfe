"""Config dataclasses replacing the reference's module-level constant blocks.

Field names and defaults mirror the reference ``train()`` kwargs
(train_cnn.py:144-146) and hyperparameter block (train_cnn.py:25-44), and
``inference.py``'s module constants (inference.py:24-52), satisfying the
public-API-parity requirement while providing an actual config system
(the reference has none — SURVEY §5 'Config / flag system').
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class TrainConfig:
    """Training configuration. Defaults = reference defaults (train_cnn.py:25-44)."""

    style_method: str = "random"  # 'random'|'average'|'smartaverage'|'cycle'|'classifier'
    artist: str = "Albrecht_Dürer"
    num_epochs: int = 200
    batch_size: int = 4
    content_data_size: int = 256
    seed: int = 2
    num_steps: int = 2  # LR halvings: StepLR(step=num_epochs//num_steps, gamma=0.5)
    content_weight: float = 17.0
    style_weight: float = 25.0
    lr: float = 0.0024
    save_every: int = 10
    weight_decay: float = 1e-4  # reference train_cnn.py:247
    train_size: int = 224  # reference TRAIN_SIZE (gpu default), train_cnn.py:28

    # TPU-native knobs (no reference equivalent)
    compute_dtype: str = "float32"  # 'float32' for parity, 'bfloat16' for speed
    data_dir: str = "images"
    model_dir: str = "models"
    log_every_batches: int = 12  # reference BATCH_INFO_EVERY, train_cnn.py:29
    mesh_shape: tuple[int, ...] | None = None  # None = all local devices on 'data'


@dataclasses.dataclass
class InferenceConfig:
    """Inference configuration, mirroring inference.py:24-52 constants."""

    style_method: str = "random"
    artist: str = "Pablo_Picasso"
    model_filename: str | None = None
    display: bool = True
    # opt-in blocking interactive window (reference inference.py:152
    # plt.show()); headless hosts degrade to the figure file alone
    show: bool = False
    content_img: str = "cuteimages/landscape.jpg"
    content_size_w: int = 1024
    sharpen: bool = False
    blur: bool = False
    sharpen_val: float = 50.0
    blur_sigma: float = 1.0
    blur_kernel: int = 3
    content_dir: str = "images/content/"
    resize_imgs: bool = True
    resize_size: int = 1024
    num_images: int = 133
    fig_dir: str = "figs"
    model_dir: str = "models"
    classifier_path: str = "models/best-2.pth"
    seed: int | None = None  # shuffle seed for eval image selection
    # int8-MXU eval pipeline (quantized stylizer + quantized frozen
    # classifier) — throughput fast path, no reference equivalent
    quantize: bool = False
