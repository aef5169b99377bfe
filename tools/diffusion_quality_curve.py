"""CFID-vs-steps sampler quality curve for the diffusion subsystem (C20).

VERDICT r4 #8: the DDPM/DDIM/DPM++ quality ordering was pinned only by the
analytic-dynamics solver-order test; the "12-20 DPM++ steps reach DDIM-50
quality" claim (diffusion/cli.py) was cited, not measured. This tool
trains a tiny class-conditional UNet on SYNTHETIC structured data on the
chip, samples with every sampler at several step counts, and records the
CFID of each sample set against a held-out real set as a committed
artifact (tests/goldens/diffusion_cfid_curve.json) + BENCH_NOTES table;
tests/test_diffusion.py locks the recorded trend.

Synthetic data (32x32, 2 classes): class-dependent oriented gradient +
class-colored Gaussian blob at a random position, plus pixel noise — a
distribution with enough structure that bad samplers measurably miss it.
CFID features come from the FIXED random-init ResNet-50 (random-feature
Frechet distances are standard when no domain feature net exists; the
number compares sampler configs under ONE extractor, which is all the
trend needs).

HAZARD (BENCH_NOTES round-4): the full DDPM T=1000 chain above b32 is a
~100 s single device execution that faults the relayed TPU worker — DDPM
sampling stays at b<=32 here.

Usage: python tools/diffusion_quality_curve.py [--epochs N] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
SIZE = 32
NUM_CLASSES = 2
N_REAL = 256
N_GEN = 128
DDPM_CHUNK = 32  # relay execution-length limit (BENCH_NOTES round 4)


def make_synthetic(n: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(images NHWC BGR [0,255], labels) — class-structured distribution.

    High-frequency class-oriented gratings (random frequency/phase) under
    a class-colored Gaussian blob. The fine texture is deliberate: a
    first-draft smooth-gradient dataset measured a FLAT CFID curve across
    DDIM step counts (every sampler reproduces a blur trivially); few-step
    samplers measurably degrade high-frequency content, which is what a
    quality-vs-steps curve needs to expose.
    """
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, NUM_CLASSES, size=n)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32) / (SIZE - 1)
    imgs = np.zeros((n, SIZE, SIZE, 3), np.float32)
    for i in range(n):
        c = labels[i]
        axis = yy if c == 0 else xx  # class-dependent grating orientation
        freq = rng.uniform(5.0, 9.0)
        phase = rng.uniform(0.0, 2 * np.pi)
        grating = np.sin(2 * np.pi * freq * axis + phase)
        img = np.stack([110 + 70 * grating] * 3, axis=-1)
        # class-colored blob at a random position (B, G, R channel order)
        cy, cx = rng.uniform(0.25, 0.75, size=2)
        sig = rng.uniform(0.10, 0.18)
        blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig * sig)))
        chan = 0 if c == 0 else 2  # class 0: blue blob; class 1: red blob
        img[..., chan] += 120 * blob
        img += rng.normal(0.0, 4.0, img.shape)
        imgs[i] = np.clip(img, 0, 255)
    return imgs, labels.astype(np.int64)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=80)  # the committed artifact config
    ap.add_argument("--base-channels", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "tests", "goldens",
                                                  "diffusion_cfid_curve.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from artist_style_transfer_tpu.diffusion.evaluate import cfid
    from artist_style_transfer_tpu.diffusion.sample import (
        diff_sample,
        diff_sample_ddim,
        diff_sample_dpmpp,
    )
    from artist_style_transfer_tpu.diffusion.train import train_diffusion
    from artist_style_transfer_tpu.models.resnet import init_classifier_params
    from artist_style_transfer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    real, labels = make_synthetic(N_REAL, seed=0)
    held_out, _ = make_synthetic(N_REAL, seed=100)  # real-vs-real floor
    clf = init_classifier_params(jax.random.key(7))  # FIXED random features

    t0 = time.time()
    params, diffusion, losses = train_diffusion(
        real, labels,
        num_classes=NUM_CLASSES, num_timesteps=1000,
        num_epochs=args.epochs, batch_size=32, lr=2e-4, seed=0,
        base_channels=args.base_channels, schedule="cosine", wordy=True,
    )
    train_s = time.time() - t0
    print(f"trained {args.epochs} epochs in {train_s:.0f}s, "
          f"loss {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)

    y = jnp.asarray(np.arange(N_GEN) % NUM_CLASSES, jnp.int32)
    key = jax.random.key(42)

    def sample_with(name: str):
        t0 = time.time()
        if name == "ddpm-1000":
            outs = []
            for i in range(0, N_GEN, DDPM_CHUNK):  # b<=32: relay exec limit
                outs.append(np.asarray(diff_sample(
                    params, diffusion, jax.random.fold_in(key, i),
                    y[i : i + DDPM_CHUNK], shape=(SIZE, SIZE),
                )))
            out = np.concatenate(outs, axis=0)
        else:
            sampler, steps = name.split("-")
            fn = diff_sample_ddim if sampler == "ddim" else diff_sample_dpmpp
            out = np.asarray(fn(
                params, diffusion, key, y, shape=(SIZE, SIZE), steps=int(steps)
            ))
        return out, time.time() - t0

    configs = [
        "ddpm-1000",
        "ddim-50", "ddim-20", "ddim-10", "ddim-5", "ddim-3", "ddim-2",
        "dpmpp-20", "dpmpp-12", "dpmpp-8", "dpmpp-4", "dpmpp-2",
    ]
    curve: dict[str, dict] = {}
    floor = cfid(clf, real, held_out)
    print(f"real-vs-real CFID floor: {floor:.3f}", flush=True)
    for name in configs:
        out, secs = sample_with(name)
        score = cfid(clf, real, out)
        curve[name] = {"cfid": round(float(score), 3), "sample_secs": round(secs, 1)}
        print(f"{name:11s} CFID {score:9.3f}   ({secs:.1f}s)", flush=True)

    artifact = {
        "config": {
            "size": SIZE, "num_classes": NUM_CLASSES, "n_real": N_REAL,
            "n_gen": N_GEN, "epochs": args.epochs,
            "base_channels": args.base_channels, "schedule": "cosine",
            "features": "random-init ResNet-50 (512-d penultimate)",
            "train_secs": round(train_s, 1),
            "final_train_loss": round(float(losses[-1]), 5),
        },
        "real_vs_real_floor": round(float(floor), 3),
        "curve": curve,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"artifact written to {args.out}")


if __name__ == "__main__":
    main()
