#!/usr/bin/env python
"""Validate the real pretrained reference artifacts against this framework.

The reference pipeline rides three pretrained .pth artifacts that cannot be
fetched in this container (zero egress): the torchvision VGG16 perceptual
backbone ``models/vgg16-00b39a1b.pth`` (reference train_cnn.py:51), the
fastai artist classifier ``models/best-2.pth`` (reference
classifier.py:62-63), and reference-trained transfer nets (reference
inference.py:27). This harness makes that parity claim a one-command check
the moment the artifacts are present:

    python tools/validate_pretrained.py \
        --vgg models/vgg16-00b39a1b.pth \
        --classifier models/best-2.pth \
        --transfer models/<artist>/<method>/transfer_17-25_2.pth \
        [--content some_image.jpg] [--report report.json]

Each provided artifact is imported through the production importers
(utils/torch_import.py), run through the jitted JAX forward, and compared
against the float64 torch oracle (tests/torch_ref.py) evaluating the SAME
weights — activation relative error for the VGG taps, logit error + argmax
agreement for the classifier, stylization PSNR for the transfer net. A
pass/fail report is printed (and written as JSON with --report); exit code
0 iff every check passes.

    python tools/validate_pretrained.py --selftest

proves the harness end-to-end without the real artifacts: it writes
random-weight fixtures in the reference formats (same shapes/key layouts),
validates them, and additionally locks the committed golden transfer net
(tests/goldens/golden_transfer.pth, trained with the f64 oracle) against
its committed stylized output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# Thresholds: the f32-vs-f64-oracle bars the committed parity suite holds
# (tests/test_models_parity.py); PSNR bar is the reference's >35 dB
# perceptual-identity north star (BASELINE.md).
VGG_REL_TOL = 1e-4
CLF_REL_TOL = 2e-3
PSNR_MIN_DB = 35.0


def _psnr(a, b, peak=255.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(peak * peak / mse) if mse > 0 else float("inf")


def _load_content(path: str | None) -> np.ndarray:
    """HWC BGR [0,255] float32 content image, even/4-divisible dims."""
    if path is None:
        path = os.path.join(REPO, "tests", "goldens", "content_landscape_256.png")
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    h, w = (img.shape[0] // 4) * 4, (img.shape[1] // 4) * 4
    return img[:h, :w].astype(np.float32)


def check_vgg(path: str, content: np.ndarray) -> dict:
    """VGG16 perceptual backbone: all four taps vs the f64 torch oracle."""
    import torch

    import jax
    import jax.numpy as jnp

    from artist_style_transfer_tpu.models.vgg import vgg16_features
    from artist_style_transfer_tpu.ops.image import vgg_caffe_preprocess
    from artist_style_transfer_tpu.utils.torch_import import (
        load_torch_state_dict,
        vgg16_params_from_torch,
    )
    from torch_ref import TorchVGG16Features

    sd = load_torch_state_dict(path)
    params = vgg16_params_from_torch(sd)

    oracle = TorchVGG16Features().double().eval()
    # The real vgg16-00b39a1b.pth carries the full torchvision net
    # (features.24..28 + classifier.*); the perceptual stack stops at
    # relu4_3, so load exactly the oracle's keys.
    oracle.load_state_dict(
        {k: torch.from_numpy(np.asarray(sd[k])) for k in oracle.state_dict()}
    )

    x = vgg_caffe_preprocess(jnp.asarray(content[None]))
    ours = jax.jit(vgg16_features)(params, x)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(np.asarray(x)).double().permute(0, 3, 1, 2))

    worst = 0.0
    for key, got in ours.items():
        theirs = ref[key].permute(0, 2, 3, 1).numpy()
        rel = float(np.abs(np.asarray(got) - theirs).max() / (np.abs(theirs).max() + 1e-6))
        worst = max(worst, rel)
    return {
        "check": "vgg16",
        "path": path,
        "metric": "max tap relative error (4 taps, real content image)",
        "value": worst,
        "threshold": VGG_REL_TOL,
        "pass": bool(worst < VGG_REL_TOL),
    }


def check_classifier(path: str, content: np.ndarray) -> dict:
    """ResNet-50 + fastai head: logits + argmax vs the f64 torch oracle."""
    import torch

    import jax
    import jax.numpy as jnp

    from artist_style_transfer_tpu.models.resnet import classifier_apply
    from artist_style_transfer_tpu.ops.image import (
        bgr_to_rgb,
        center_crop,
        torchvision_normalize,
    )
    from artist_style_transfer_tpu.utils.torch_import import (
        classifier_params_from_torch,
        load_torch_state_dict,
    )
    from torch_ref import make_torch_classifier

    sd = load_torch_state_dict(path)  # unwraps the fastai {'model': ...} wrapper
    params = classifier_params_from_torch(sd)
    n_classes = int(np.asarray(params["head"]["fc2"]["b"]).shape[0])

    oracle = make_torch_classifier(n_classes)
    # Load exactly the oracle's own keys (as check_vgg does): a real fastai
    # best-2.pth may carry extra bookkeeping keys that a strict full-dict
    # load would reject; a key the oracle needs but sd lacks raises KeyError,
    # which the per-check harness turns into a FAIL entry.
    oracle.load_state_dict(
        {k: torch.from_numpy(np.asarray(sd[k])) for k in oracle.state_dict()}
    )
    oracle = oracle.double().eval()

    # The eval-pipeline transform (reference inference.py:154): crop 256,
    # RGB, torchvision normalization — plus a couple of noise probes.
    crop = center_crop(jnp.asarray(content[None]), min(256, *content.shape[:2]))
    x_img = torchvision_normalize(bgr_to_rgb(crop) / 255.0)
    rng = np.random.default_rng(0)
    x_noise = jnp.asarray(rng.standard_normal((2, 224, 224, 3)), jnp.float32)

    worst, agree = 0.0, True
    for x in (x_img, x_noise):
        ours = np.asarray(jax.jit(classifier_apply)(params, x))
        with torch.no_grad():
            ref = (
                oracle(torch.from_numpy(np.asarray(x)).double().permute(0, 3, 1, 2))
                .numpy()
            )
        worst = max(worst, float(np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-6)))
        agree = agree and bool((ours.argmax(-1) == ref.argmax(-1)).all())
    return {
        "check": "classifier",
        "path": path,
        "n_classes": n_classes,
        "metric": "max logit relative error (argmax agreement required)",
        "value": worst,
        "threshold": CLF_REL_TOL,
        "argmax_agree": agree,
        "pass": bool(worst < CLF_REL_TOL and agree),
    }


def check_transfer(path: str, content: np.ndarray, golden_png: str | None = None) -> dict:
    """Transfer net: jitted stylization PSNR vs the f64 torch oracle (or a
    committed golden stylized image) on a real content image."""
    import jax.numpy as jnp

    from artist_style_transfer_tpu.infer.stylize import load_transfer_params, stylize

    params = load_transfer_params(path)
    ours = np.asarray(stylize(params, jnp.asarray(content[None])))[0]

    if golden_png is not None:
        import cv2

        ref = cv2.imread(golden_png, cv2.IMREAD_COLOR)
        if ref is None:
            raise FileNotFoundError(golden_png)
        ref = ref.astype(np.float64)
        metric = f"stylize PSNR vs committed golden ({os.path.basename(golden_png)})"
    else:
        import torch

        from artist_style_transfer_tpu.utils.torch_import import load_torch_state_dict
        from torch_ref import TorchTransformerNet

        oracle = TorchTransformerNet()
        oracle.load_state_dict(
            {k: torch.from_numpy(np.asarray(v))
             for k, v in load_torch_state_dict(path).items()}
        )
        oracle = oracle.double().eval()
        with torch.no_grad():
            ref = (
                oracle(torch.from_numpy(content[None]).double().permute(0, 3, 1, 2))
                .permute(0, 2, 3, 1)
                .numpy()[0]
            )
        ref = np.clip(ref, 0.0, 255.0)  # match stylize()'s save-time clip
        metric = "stylize PSNR vs f64 torch oracle (real content image)"

    p = _psnr(ours, ref)
    return {
        "check": "transfer",
        "path": path,
        "metric": metric,
        "value": p,
        "threshold": PSNR_MIN_DB,
        "pass": bool(p > PSNR_MIN_DB),
    }


def _run_check(fn, path: str, *args, **kwargs) -> dict:
    """Run one check; any exception becomes a pass=False report entry.

    A malformed real artifact (unexpected keys, truncated file, wrong
    shapes) must produce a FAIL line in the report, not crash the harness
    mid-way — the other artifacts' checks still run.
    """
    try:
        return fn(path, *args, **kwargs)
    except Exception as e:
        return {
            "check": fn.__name__.removeprefix("check_"),
            "path": path,
            "metric": "check raised",
            "value": float("nan"),
            "threshold": float("nan"),
            "error": f"{type(e).__name__}: {e}",
            "pass": False,
        }


def _write_selftest_fixtures(d: str) -> tuple[str, str]:
    """Random-weight artifacts in the exact reference formats (the verify
    workspace fixture): torchvision-keyed VGG dict, fastai-wrapped
    classifier dict."""
    import torch

    from torch_ref import TorchVGG16Features, make_torch_classifier, randomize_bn_stats

    torch.manual_seed(0)
    vgg_path = os.path.join(d, "vgg16-00b39a1b.pth")
    torch.save(TorchVGG16Features().state_dict(), vgg_path)

    torch.manual_seed(1)
    clf = make_torch_classifier(19)
    randomize_bn_stats(clf, seed=2)
    clf_path = os.path.join(d, "best-2.pth")
    torch.save({"model": clf.state_dict(), "opt": {}}, clf_path)
    return vgg_path, clf_path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--vgg", help="path to vgg16-00b39a1b.pth")
    ap.add_argument("--classifier", help="path to best-2.pth")
    ap.add_argument("--transfer", help="path to a reference-trained transfer net .pth")
    ap.add_argument("--content", help="content image for the forward passes "
                    "(default: the committed golden content image)")
    ap.add_argument("--report", help="write the JSON report here")
    ap.add_argument("--selftest", action="store_true",
                    help="prove the harness on generated fixtures + the "
                    "committed golden transfer net")
    ap.add_argument("--cpu", action="store_true",
                    help="force the JAX CPU backend in-process (this "
                    "container's sitecustomize pre-initializes the TPU "
                    "backend, so an env var alone is not enough)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        if jax.default_backend() != "cpu":
            from jax._src import xla_bridge as _xb

            _xb._clear_backends()

    content = _load_content(args.content)
    results: list[dict] = []

    if args.selftest:
        with tempfile.TemporaryDirectory() as d:
            vgg_path, clf_path = _write_selftest_fixtures(d)
            results.append(_run_check(check_vgg, vgg_path, content))
            results.append(_run_check(check_classifier, clf_path, content))
        golden = os.path.join(REPO, "tests", "goldens")
        results.append(
            _run_check(check_transfer, os.path.join(golden, "golden_transfer.pth"), content)
        )
        results.append(
            _run_check(
                check_transfer,
                os.path.join(golden, "golden_transfer.pth"),
                _load_content(None),
                golden_png=os.path.join(golden, "golden_stylized.png"),
            )
        )
    else:
        if not (args.vgg or args.classifier or args.transfer):
            ap.error("provide --vgg/--classifier/--transfer (or --selftest)")
        if args.vgg:
            results.append(_run_check(check_vgg, args.vgg, content))
        if args.classifier:
            results.append(_run_check(check_classifier, args.classifier, content))
        if args.transfer:
            results.append(_run_check(check_transfer, args.transfer, content))

    ok = all(r["pass"] for r in results)
    for r in results:
        status = "PASS" if r["pass"] else "FAIL"
        detail = (
            r["error"]
            if "error" in r
            else f"{r['metric']} = {r['value']:.6g} (threshold {r['threshold']:g})"
        )
        print(f"[{status}] {r['check']}: {detail} — {r['path']}")
    print(f"validate_pretrained: {'PASS' if ok else 'FAIL'} "
          f"({sum(r['pass'] for r in results)}/{len(results)} checks)")
    if args.report:
        with open(args.report, "w") as f:
            json.dump({"ok": ok, "results": results}, f, indent=2)
        print(f"report written to {args.report}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
