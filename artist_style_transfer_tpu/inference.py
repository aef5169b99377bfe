"""Inference CLI — ``python -m artist_style_transfer_tpu.inference``.

Function+flag API replacing the reference's edit-the-source script
(inference.py:24-52 constants; the module runs on import there). Two modes,
as in the reference:

- display (default): stylize one content image, optional blur/sharpen,
  write a 2/3-panel figure to figs/<artist>_<method>.png
  (inference.py:70-152)
- --no-display: quantitative eval — stylize up to --num_images content
  images and report classifier accuracy 'Acc=...' (inference.py:153-166)
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from artist_style_transfer_tpu.models.resnet import ARTISTS_19
from artist_style_transfer_tpu.utils.config import InferenceConfig

_DEFAULTS = InferenceConfig()


def build_parser() -> argparse.ArgumentParser:
    """Flags mirror :class:`InferenceConfig` fields 1:1 (the dataclass is the
    single source of defaults, mirroring reference inference.py:24-52)."""
    d = _DEFAULTS
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--style_method", default=d.style_method)
    p.add_argument("--artist", default=d.artist)
    p.add_argument("--model_filename", default=d.model_filename,
                   help="checkpoint inside models/<artist>/<method>/ (.pth or .ckpt)")
    p.add_argument("--model_dir", default=d.model_dir)
    p.add_argument("--no-display", dest="display", action="store_false",
                   help="run quantitative classifier evaluation instead")
    p.add_argument("--show", action="store_true", default=d.show,
                   help="also open the reference's blocking interactive "
                   "figure window (inference.py:152) when a GUI backend is "
                   "available; headless hosts just get the figure file")
    p.add_argument("--content_img", default=d.content_img)
    p.add_argument("--content_size_w", type=int, default=d.content_size_w)
    p.add_argument("--sharpen", action="store_true", default=d.sharpen)
    p.add_argument("--sharpen_val", type=float, default=d.sharpen_val)
    p.add_argument("--blur", action="store_true", default=d.blur)
    p.add_argument("--blur_sigma", type=float, default=d.blur_sigma)
    p.add_argument("--blur_kernel", type=int, default=d.blur_kernel)
    p.add_argument("--content_dir", default=d.content_dir)
    p.add_argument("--resize_imgs", action="store_true", default=d.resize_imgs)
    p.add_argument("--no-resize_imgs", dest="resize_imgs", action="store_false")
    p.add_argument("--resize_size", type=int, default=d.resize_size)
    p.add_argument("--num_images", type=int, default=d.num_images)
    p.add_argument("--fig_dir", default=d.fig_dir)
    p.add_argument("--classifier_path", default=d.classifier_path)
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--quantize", action="store_true", default=d.quantize,
                   help="eval mode: run the whole stylize->classify "
                        "pipeline on the int8 MXU (quantized stylizer + "
                        "quantized frozen classifier)")
    return p


def run_display(args, params) -> str:
    """Stylize one image + write the figure; returns the figure path."""
    import cv2

    from artist_style_transfer_tpu.infer.stylize import (
        gaussian_blur,
        save_figure,
        sharpen,
        stylize_batched,
    )

    im = cv2.imread(args.content_img)
    if im is None:
        raise FileNotFoundError(args.content_img)
    if args.content_size_w > 0:  # inference.py:72-76
        h, w, _ = im.shape
        im = cv2.resize(im, (args.content_size_w, int(h * args.content_size_w / w)))

    out = stylize_batched(params, [im.astype(np.float32)])[0]

    if args.blur:
        out = gaussian_blur(out, args.blur_sigma, args.blur_kernel)
    if args.sharpen:
        out = sharpen(out, args.sharpen_val)

    style_img = None
    if args.style_method in ("random", "artist", "average"):  # inference.py:77-78
        style_path = os.path.join(args.model_dir, args.artist, args.style_method, "style.jpg")
        if os.path.exists(style_path):
            style_img = cv2.imread(style_path)

    fig_path = os.path.join(args.fig_dir, f"{args.artist}_{args.style_method}.png")
    save_figure(fig_path, im, out, style_img, show=args.show)
    print(f"wrote {fig_path}")
    return fig_path


def run_eval(args, params) -> float:
    """Classifier-accuracy evaluation (inference.py:79-166)."""
    import random as _random

    import cv2

    from artist_style_transfer_tpu.infer.evaluate import evaluate_with_classifier
    from artist_style_transfer_tpu.utils.torch_import import (
        classifier_params_from_torch,
        load_torch_state_dict,
    )

    clf_params = classifier_params_from_torch(load_torch_state_dict(args.classifier_path))

    files = [f for f in os.listdir(args.content_dir) if ".jpg" in f or ".JPEG" in f]
    rng = _random.Random(args.seed) if args.seed is not None else _random
    rng.shuffle(files)

    content = []
    if args.resize_imgs:
        # Fixed-size path: the native C++ decode+resize thread pool (same
        # INTER_LINEAR semantics as the cv2 call below, golden-tested in
        # tests/test_native_loader.py) amortizes the host decode of up to
        # 133 images; falls back to the serial cv2 loop without the
        # toolchain. Unreadable files are skipped either way
        # (inference.py:88-89).
        try:
            from artist_style_transfer_tpu.data import native_loader

            i = 0
            while len(content) < args.num_images and i < len(files):
                chunk = files[i : i + (args.num_images - len(content))]
                i += len(chunk)
                out, ok = native_loader.decode_batch(
                    [os.path.join(args.content_dir, f) for f in chunk],
                    args.resize_size,
                    args.resize_size,
                )
                content.extend(out[k] for k in range(len(chunk)) if ok[k])
        except RuntimeError:
            content = []
    if not content:
        for fname in files:
            im = cv2.imread(os.path.join(args.content_dir, fname))
            if im is None:
                continue
            if args.resize_imgs:
                content.append(cv2.resize(im, (args.resize_size, args.resize_size)))
            else:  # inference.py:93-98: skip weird sizes
                h, w, _ = im.shape
                if h > 1600 or w > 1024 or h < 224 or w < 224:
                    continue
                content.append(im)
            if len(content) == args.num_images:
                break
    print(f"Grabbed {len(content)} images!\n")  # inference.py:102

    index = ARTISTS_19.index(args.artist)
    # Pass the (possibly mixed-size, under --no-resize_imgs) image list:
    # evaluate_with_classifier groups by exact shape internally.
    return evaluate_with_classifier(
        params,
        clf_params,
        [im.astype(np.float32) for im in content],
        index,
        artists=ARTISTS_19,
        quantize=args.quantize,
    )


def run_from_config(config: InferenceConfig, **overrides):
    """Programmatic entry: run inference from an :class:`InferenceConfig`.

    Fields map 1:1 onto the CLI flags; keyword overrides win.
    """
    import dataclasses

    return _run(argparse.Namespace(**{**dataclasses.asdict(config), **overrides}))


def main(argv=None):
    args = build_parser().parse_args(argv)
    return _run(args)


def _run(args):
    from artist_style_transfer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from artist_style_transfer_tpu.infer.stylize import load_transfer_params

    model_dir = os.path.join(args.model_dir, args.artist, args.style_method)
    if args.model_filename is None or not os.path.exists(
        os.path.join(model_dir, args.model_filename)
    ):
        raise NotImplementedError(args.model_filename)  # inference.py:63-64
    params = load_transfer_params(os.path.join(model_dir, args.model_filename))

    if args.display:
        return run_display(args, params)
    return run_eval(args, params)


if __name__ == "__main__":
    main()
