"""Diffusion CLI — ``python -m artist_style_transfer_tpu.diffusion.cli``.

Subcommands:
- ``train``: fit `diff_model` on the painting corpus (artist-labeled)
- ``sample``: class-conditional sampling, optionally classifier-guided
  via the pretrained artist classifier (models/best-2.pth)
- ``eval``: classifier Fréchet distance (CFID) between samples drawn from
  a trained model and the artist's real paintings
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--image_size", type=int, default=64)
    t.add_argument("--num_epochs", type=int, default=50)
    t.add_argument("--batch_size", type=int, default=32)
    t.add_argument("--num_timesteps", type=int, default=1000)
    t.add_argument("--base_channels", type=int, default=64)
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--schedule", choices=("linear", "cosine"), default="linear")
    t.add_argument("--ema_decay", type=float, default=0.999,
                   help="EMA decay for returned weights; 0 disables")
    t.add_argument("--archive_dir", default="images/archive/")
    t.add_argument("--cache_dir", default="dicts/")
    t.add_argument("--out", default="models/diffusion/diff_model.npz")

    s = sub.add_parser("sample")
    s.add_argument("--model", default="models/diffusion/diff_model.npz")
    s.add_argument("--artist", default="Vincent_van_Gogh")
    s.add_argument("--num_samples", type=int, default=4)
    s.add_argument("--image_size", type=int, default=64)
    s.add_argument("--num_timesteps", type=int, default=1000)
    s.add_argument("--base_channels", type=int, default=64)
    s.add_argument("--guidance_scale", type=float, default=0.0)
    s.add_argument("--classifier_path", default="models/best-2.pth")
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--schedule", choices=("linear", "cosine"), default="linear")
    s.add_argument("--dpmpp_steps", type=int, default=0,
                   help=">0: DPM-Solver++(2M) fast sampling with this many "
                        "steps (second-order multistep; 10-20 steps reach "
                        "DDIM-50 quality — MEASURED: the committed CFID "
                        "curve tests/goldens/diffusion_cfid_curve.json has "
                        "dpmpp-12 == ddim-50 and even dpmpp-4 holding where "
                        "ddim-5 slips). Takes precedence over --ddim_steps")
    s.add_argument("--ddim_steps", type=int, default=0,
                   help=">0: DDIM fast sampling with this many steps "
                        "instead of the full T-step DDPM chain")
    s.add_argument("--ddim_eta", type=float, default=0.0,
                   help="DDIM stochasticity (0 = deterministic ODE)")
    s.add_argument("--out", default="figs/diffusion_samples.png")

    e = sub.add_parser("eval")
    e.add_argument("--model", default="models/diffusion/diff_model.npz")
    e.add_argument("--artist", default="Vincent_van_Gogh")
    e.add_argument("--num_samples", type=int, default=64)
    e.add_argument("--image_size", type=int, default=64)
    e.add_argument("--num_timesteps", type=int, default=1000)
    e.add_argument("--base_channels", type=int, default=64)
    e.add_argument("--guidance_scale", type=float, default=0.0)
    e.add_argument("--classifier_path", default="models/best-2.pth")
    e.add_argument("--seed", type=int, default=0)
    e.add_argument("--schedule", choices=("linear", "cosine"), default="linear")
    e.add_argument("--sample_batch", type=int, default=16)
    e.add_argument("--archive_dir", default="images/archive/")
    e.add_argument("--cache_dir", default="dicts/")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from artist_style_transfer_tpu.models.resnet import ARTISTS_19
    from artist_style_transfer_tpu.train.checkpoint import load_params_npz, save_params_npz
    from artist_style_transfer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.cmd == "train":
        from artist_style_transfer_tpu.data import get_painting_dataset
        from artist_style_transfer_tpu.diffusion import train_diffusion
        from artist_style_transfer_tpu.data.datasets import load_artist_names

        corpus = get_painting_dataset(
            for_classifier=False,
            rescale_height=args.image_size,
            rescale_width=args.image_size,
            archive_dir=args.archive_dir,
            cache_dir=args.cache_dir,
        )
        names, _ = load_artist_names(args.archive_dir)
        images, labels = [], []
        for i, n in enumerate(names):
            arr = corpus.get(n)
            if arr is None or not len(arr):
                continue
            images.append(arr)
            labels.extend([i] * len(arr))
        images = np.concatenate(images)
        params, diffusion, losses = train_diffusion(
            images,
            np.asarray(labels),
            num_classes=len(names),
            num_timesteps=args.num_timesteps,
            num_epochs=args.num_epochs,
            batch_size=args.batch_size,
            base_channels=args.base_channels,
            lr=args.lr,
            seed=args.seed,
            schedule=args.schedule,
            ema_decay=args.ema_decay or None,
        )
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        save_params_npz(args.out, params)
        # Persist the label space: class id i = names[i] (artists.csv row
        # order) — sample/eval must condition in THIS space, which is not
        # ARTISTS_19's order or size.
        import json

        with open(args.out + ".labels.json", "w") as f:
            json.dump({"names": names}, f)
        print(f"wrote {args.out} (+ .labels.json); final loss {losses[-1]:.4f}")
        return args.out

    # sample / eval share the model + sampler setup
    import json
    import warnings

    from artist_style_transfer_tpu.diffusion import (
        GaussianDiffusion,
        diff_sample,
        init_diff_model,
    )

    # The model's class-id space comes from its training sidecar (artists.csv
    # row order at train time); falling back to ARTISTS_19 only for legacy
    # checkpoints saved without one.
    labels_path = args.model + ".labels.json"
    if os.path.exists(labels_path):
        with open(labels_path) as f:
            model_names = json.load(f)["names"]
    else:
        warnings.warn(
            f"{labels_path} not found; assuming the model was trained with "
            "the 19-artist label space (ARTISTS_19)",
            stacklevel=1,
        )
        model_names = list(ARTISTS_19)
    if args.artist not in model_names:
        raise SystemExit(
            f"artist {args.artist!r} is not in the model's label space; "
            f"trained artists: {', '.join(model_names)}"
        )
    model_cls_id = model_names.index(args.artist)

    template = init_diff_model(
        jax.random.key(0),
        num_classes=len(model_names),
        base_channels=args.base_channels,
    )
    params = load_params_npz(args.model, template)
    diffusion = GaussianDiffusion.make(args.num_timesteps, schedule=args.schedule)

    # Guidance uses the fixed 19-class classifier head (classifier.py:43-66)
    # — its label space is ARTISTS_19 regardless of the model's.
    clf_y_id = None
    if args.guidance_scale > 0:
        if args.artist not in ARTISTS_19:
            raise SystemExit(
                f"classifier guidance requires an ARTISTS_19 artist; "
                f"{args.artist!r} is not one of them"
            )
        clf_y_id = ARTISTS_19.index(args.artist)

    clf_params = None
    if args.guidance_scale > 0 or args.cmd == "eval":
        from artist_style_transfer_tpu.utils.torch_import import (
            classifier_params_from_torch,
            load_torch_state_dict,
        )

        clf_params = classifier_params_from_torch(load_torch_state_dict(args.classifier_path))

    if args.cmd == "eval":
        from artist_style_transfer_tpu.data import get_painting_dataset
        from artist_style_transfer_tpu.diffusion import cfid

        chunks = []
        key = jax.random.key(args.seed)
        for i in range(0, args.num_samples, args.sample_batch):
            n = min(args.sample_batch, args.num_samples - i)
            key, k = jax.random.split(key)
            y = jnp.full((n,), model_cls_id, jnp.int32)
            chunks.append(np.asarray(diff_sample(
                params, diffusion, k, y,
                shape=(args.image_size, args.image_size),
                classifier_params=clf_params if args.guidance_scale > 0 else None,
                guidance_scale=args.guidance_scale,
                classifier_y=None if clf_y_id is None else jnp.full((n,), clf_y_id, jnp.int32),
            )))
        gen = np.concatenate(chunks)
        corpus = get_painting_dataset(
            for_classifier=False,
            rescale_height=args.image_size,
            rescale_width=args.image_size,
            archive_dir=args.archive_dir,
            cache_dir=args.cache_dir,
        )
        real = np.asarray(corpus[args.artist])  # (n, H, W, 3) BGR [0,255]
        score = cfid(clf_params, real, gen)
        print(f"CFID={score:.3f} (artist={args.artist}, n_gen={len(gen)}, n_real={len(real)})")
        return score

    y = jnp.full((args.num_samples,), model_cls_id, jnp.int32)
    sample_kwargs = dict(
        shape=(args.image_size, args.image_size),
        classifier_params=clf_params,
        guidance_scale=args.guidance_scale,
        classifier_y=None
        if clf_y_id is None
        else jnp.full((args.num_samples,), clf_y_id, jnp.int32),
    )
    if getattr(args, "dpmpp_steps", 0) > 0:
        from artist_style_transfer_tpu.diffusion import diff_sample_dpmpp

        out = diff_sample_dpmpp(
            params, diffusion, jax.random.key(args.seed), y,
            steps=args.dpmpp_steps, **sample_kwargs,
        )
    elif getattr(args, "ddim_steps", 0) > 0:
        from artist_style_transfer_tpu.diffusion import diff_sample_ddim

        out = diff_sample_ddim(
            params, diffusion, jax.random.key(args.seed), y,
            steps=args.ddim_steps, eta=args.ddim_eta, **sample_kwargs,
        )
    else:
        out = diff_sample(
            params, diffusion, jax.random.key(args.seed), y, **sample_kwargs
        )
    import cv2

    grid = np.concatenate(np.asarray(out).astype(np.uint8), axis=1)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    cv2.imwrite(args.out, grid)
    print(f"wrote {args.out}")
    return args.out


if __name__ == "__main__":
    main()
