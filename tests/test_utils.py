"""Utility tests: image helpers (C9), config-driven train, metric logger."""

import json
import os

import numpy as np

from artist_style_transfer_tpu.utils.images import imshow_array, save_tensor_image, to_image
from artist_style_transfer_tpu.utils.logging import MetricLogger


def test_to_image_bgr_to_rgb():
    bgr = np.zeros((2, 3, 3), np.float32)
    bgr[..., 0] = 255.0  # blue channel
    rgb = to_image(bgr)
    assert rgb.shape == (2, 3, 3)
    assert rgb[0, 0, 2] == 255.0 and rgb[0, 0, 0] == 0.0
    # batch-1 NHWC accepted (reference squeezes, train_cnn.py:119-122)
    assert to_image(bgr[None]).shape == (2, 3, 3)


def test_save_tensor_image_clips(tmp_path):
    import cv2

    arr = np.full((4, 4, 3), 300.0, np.float32)  # out of range
    path = str(tmp_path / "x.jpg")
    save_tensor_image(path, arr)
    back = cv2.imread(path)
    assert back.min() >= 250  # clipped to 255, jpeg-lossy


def test_imshow_array(tmp_path):
    disp = imshow_array(np.full((4, 4, 3), 510.0), out_path=str(tmp_path / "f.png"), title="t")
    assert disp.max() <= 1.0
    assert os.path.exists(tmp_path / "f.png")


def test_metric_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricLogger(jsonl_path=path, stdout=False)
    log.log("epoch", epoch=1, loss=2.5)
    log.log("epoch", epoch=2, loss=1.5)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert [l["epoch"] for l in lines] == [1, 2]
    assert lines[0]["event"] == "epoch"


def test_train_from_config(tmp_path):
    import jax

    from artist_style_transfer_tpu.models.vgg import init_vgg16_params
    from artist_style_transfer_tpu.train.api import train_from_config
    from artist_style_transfer_tpu.utils.config import TrainConfig

    rng = np.random.default_rng(0)
    cfg = TrainConfig(
        style_method="random",
        artist="A",
        num_epochs=2,
        batch_size=2,
        content_data_size=2,
        model_dir=str(tmp_path),
    )
    params, losses = train_from_config(
        cfg,
        content_images=(rng.random((2, 32, 32, 3)) * 255).astype(np.float32),
        paintings=(rng.random((1, 32, 32, 3)) * 255).astype(np.float32),
        vgg_params=init_vgg16_params(jax.random.key(0)),
        export_pth=False,
        wordy=False,
        use_pallas=False,
    )
    assert losses.shape == (2, 3)
    assert np.all(np.isfinite(losses))
