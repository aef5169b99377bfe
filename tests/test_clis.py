"""CLI entry-point tests (argument wiring + end-to-end on tiny CPU runs)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture()
def cli_workspace(tmp_path, monkeypatch):
    """images/ + dicts/ + models/ with synthetic weights, reference layout."""
    import torch

    from tests.torch_ref import TorchVGG16Features, make_torch_classifier

    rng = np.random.default_rng(0)
    (tmp_path / "images" / "content").mkdir(parents=True)
    (tmp_path / "images" / "archive" / "resized" / "resized").mkdir(parents=True)
    (tmp_path / "dicts").mkdir()
    (tmp_path / "models").mkdir()
    (tmp_path / "figs").mkdir()

    with open(tmp_path / "images" / "archive" / "artists.csv", "w") as f:
        f.write("id,name,paintings\n0,Alfred Sisley,2\n")
    for i in (1, 2):
        img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "images" / "archive" / "resized" / "resized" / f"Alfred_Sisley_{i}.jpg"), img)
    for i in range(4):
        img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "images" / "content" / f"c{i}.jpg"), img)

    torch.manual_seed(0)
    torch.save(TorchVGG16Features().state_dict(), tmp_path / "models" / "vgg16-00b39a1b.pth")
    torch.save({"model": make_torch_classifier(19).state_dict()}, tmp_path / "models" / "best-2.pth")

    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_train_cli_end_to_end(cli_workspace):
    from artist_style_transfer_tpu.train_style_transfer import main

    main([
        "--style_method", "random", "--artist", "Alfred_Sisley",
        "--num_epochs", "1", "--batch_size", "2", "--content_data_size", "2",
        "--train_size", "32", "--save_every", "1", "--num_steps", "1", "--quiet",
        "--preview_every", "1",
    ])
    d = cli_workspace / "models" / "Alfred_Sisley" / "random"
    assert any(p.name.endswith("_1.pth") for p in d.iterdir())
    assert (d / "style.jpg").exists()
    assert (d / "preview_0.png").exists()


def test_train_cli_quantize_gram_flag():
    from artist_style_transfer_tpu.train_style_transfer import build_parser

    p = build_parser()
    assert p.parse_args([]).quantize_gram == "auto"
    assert p.parse_args(["--quantize_gram", "off"]).quantize_gram == "off"
    with pytest.raises(SystemExit):
        p.parse_args(["--quantize_gram", "bogus"])


def test_train_cli_fold_and_slicing_flags():
    from artist_style_transfer_tpu.train_style_transfer import build_parser

    p = build_parser()
    d = p.parse_args([])
    assert d.fold_batch == "auto" and d.max_epochs_this_run is None
    a = p.parse_args(["--fold_batch", "vgg", "--max_epochs_this_run", "2",
                      "--profile_dir", "/tmp/prof"])
    assert (a.fold_batch, a.max_epochs_this_run, a.profile_dir) == ("vgg", 2, "/tmp/prof")
    with pytest.raises(SystemExit):
        p.parse_args(["--fold_batch", "bogus"])


def test_inference_cli_display(cli_workspace):
    # reuse the checkpoint from a fresh tiny train
    from artist_style_transfer_tpu.inference import main as infer_main
    from artist_style_transfer_tpu.train_style_transfer import main as train_main

    train_main([
        "--style_method", "average", "--artist", "Alfred_Sisley",
        "--num_epochs", "1", "--batch_size", "2", "--content_data_size", "2",
        "--train_size", "32", "--save_every", "1", "--num_steps", "1", "--quiet",
    ])
    fig = infer_main([
        "--style_method", "average", "--artist", "Alfred_Sisley",
        "--model_filename", "transfer_17-25_1.npz",
        "--content_img", "images/content/c0.jpg", "--content_size_w", "32",
    ])
    assert os.path.exists(fig)


def test_inference_cli_eval_mode(cli_workspace):
    """--no-display: stylize -> classifier -> 'Acc=' (inference.py:153-166)."""
    from artist_style_transfer_tpu.inference import main as infer_main
    from artist_style_transfer_tpu.train_style_transfer import main as train_main

    train_main([
        "--style_method", "smartaverage", "--artist", "Alfred_Sisley",
        "--num_epochs", "1", "--batch_size", "2", "--content_data_size", "2",
        "--train_size", "32", "--save_every", "1", "--num_steps", "1", "--quiet",
    ])
    acc = infer_main([
        "--style_method", "smartaverage", "--artist", "Alfred_Sisley",
        "--model_filename", "transfer_17-25_1.npz", "--no-display",
        "--num_images", "1", "--resize_size", "64", "--seed", "0",
    ])
    assert 0.0 <= acc <= 100.0


def test_gatys_cli(cli_workspace):
    from artist_style_transfer_tpu.stylize_gatys import main

    out = main([
        "--content_img", "images/content/c0.jpg",
        "--style_img", "images/content/c1.jpg",
        "--size", "32", "--num_steps", "5", "--out", "figs/g.png",
    ])
    assert os.path.exists(out)


@pytest.mark.slow
def test_diffusion_cli_train_and_sample(cli_workspace):
    from artist_style_transfer_tpu.diffusion.cli import main

    model_path = main([
        "train", "--image_size", "16", "--num_epochs", "1", "--batch_size", "2",
        "--num_timesteps", "8", "--base_channels", "32",
        "--out", "models/diffusion/diff_model.npz",
    ])
    assert os.path.exists(model_path)
    # the label-space sidecar pins class id -> artist for sample/eval
    import json

    with open(model_path + ".labels.json") as f:
        assert json.load(f)["names"] == ["Alfred_Sisley"]

    out = main([
        "sample", "--model", model_path, "--artist", "Alfred_Sisley",
        "--num_samples", "2", "--image_size", "16", "--num_timesteps", "8",
        "--base_channels", "32", "--out", "figs/dsamp.png",
    ])
    assert os.path.exists(out)

    # DDIM fast path: 4 steps instead of the 8-step DDPM chain
    out_ddim = main([
        "sample", "--model", model_path, "--artist", "Alfred_Sisley",
        "--num_samples", "2", "--image_size", "16", "--num_timesteps", "8",
        "--base_channels", "32", "--ddim_steps", "4", "--out", "figs/dsamp_ddim.png",
    ])
    assert os.path.exists(out_ddim)

    # DPM-Solver++(2M) fast path
    out_dpm = main([
        "sample", "--model", model_path, "--artist", "Alfred_Sisley",
        "--num_samples", "2", "--image_size", "16", "--num_timesteps", "8",
        "--base_channels", "32", "--dpmpp_steps", "4", "--out", "figs/dsamp_dpm.png",
    ])
    assert os.path.exists(out_dpm)

    # conditioning on an artist outside the model's label space must fail
    # loudly, not silently sample the wrong class (class-id space mismatch)
    with pytest.raises(SystemExit):
        main([
            "sample", "--model", model_path, "--artist", "Claude_Monet",
            "--num_samples", "1", "--image_size", "16", "--num_timesteps", "8",
            "--base_channels", "32", "--out", "figs/dsamp2.png",
        ])

    score = main([
        "eval", "--model", model_path, "--artist", "Alfred_Sisley",
        "--num_samples", "2", "--sample_batch", "2", "--image_size", "16",
        "--num_timesteps", "8", "--base_channels", "32",
    ])
    assert np.isfinite(score) and score >= 0.0
