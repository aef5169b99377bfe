"""Quantitative evaluation via the artist classifier (reference inference.py:153-166).

The repo's only quantitative quality metric: stylize content images, center
crop 256, torchvision-normalize, classify, report top-1 accuracy against
the target artist. The reference runs image-by-image with host round-trips;
here the whole stylize->crop->normalize->classify pipeline is one jitted
batched graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from artist_style_transfer_tpu.models.resnet import classifier_apply
from artist_style_transfer_tpu.models.transformer import transformer_apply
from artist_style_transfer_tpu.ops.image import (
    bgr_to_rgb,
    center_crop,
    torchvision_normalize,
)


def _classify_stylized(out, clf_params, classify, crop_size: int = 256) -> jax.Array:
    # The reference quantizes to uint8 before the classifier transform
    # (inference.py:116 -> :154); reproduce the rounding.
    out = jnp.floor(jnp.clip(out.astype(jnp.float32), 0.0, 255.0))
    crop = center_crop(out, crop_size)
    rgb01 = bgr_to_rgb(crop) / 255.0
    logits = classify(clf_params, torchvision_normalize(rgb01))
    return jnp.argmax(logits, axis=-1)


def _eval_core(params, clf_params, images_bgr_255: jax.Array,
               fold_batch: bool = False, crop_size: int = 256) -> jax.Array:
    """Predicted class per image: stylize -> uint8 clip -> crop -> classify.

    ``fold_batch``: batch->H folded shallow transformer layers (fast
    precision only; no-op for unfoldable shapes). Off by default — the
    direct path is the dispatched winner (715.8 vs 644 img/s, BENCH_NOTES)
    and fresh folded compiles crash the round-3/4 TPU compile helper.
    ``crop_size``: reference parity is 256 (inference.py:56-59); smaller
    values exist for sharding dry-runs/tests at tiny static shapes."""
    out = transformer_apply(params, images_bgr_255, fold_batch=fold_batch)
    return _classify_stylized(out, clf_params, classifier_apply, crop_size)


def _eval_core_int8(qparams, qclf_params, images_bgr_255: jax.Array,
                    crop_size: int = 256) -> jax.Array:
    """Int8-MXU eval: quantized stylizer + quantized frozen classifier.

    Both halves of the pipeline are forward-only here, so both ride the
    int8 MXU (models/transformer_q.py, models/resnet_q.py). Predictions
    deviate from the real-dtype pipeline only by quantization rounding on
    a 19-way argmax (logit deviation bounded in tests/test_resnet_q.py).
    """
    from artist_style_transfer_tpu.models.resnet_q import classifier_apply_int8
    from artist_style_transfer_tpu.models.transformer_q import transformer_apply_int8

    out = transformer_apply_int8(qparams, images_bgr_255, accum=jnp.bfloat16)
    return _classify_stylized(out, qclf_params, classifier_apply_int8, crop_size)


_eval_batch = jax.jit(_eval_core, static_argnames=("fold_batch", "crop_size"))
_eval_batch_int8 = jax.jit(_eval_core_int8, static_argnames=("crop_size",))


def quantize_eval_pipeline(params, classifier_params, calib_images):
    """(quantized stylizer, quantized classifier) for the int8 eval path.

    ``calib_images``: a few NHWC BGR [0,255] content images — the
    stylizer's static activation scales come from one forward over them
    (models/transformer_q.calibrate_transformer); the classifier uses
    dynamic scales and needs no calibration.
    """
    from artist_style_transfer_tpu.models.resnet_q import quantize_classifier
    from artist_style_transfer_tpu.models.transformer_q import quantize_transformer

    return (
        quantize_transformer(params, jnp.asarray(calib_images, jnp.float32)),
        quantize_classifier(classifier_params),
    )


@functools.lru_cache(maxsize=None)
def _eval_batch_sharded(mesh, crop_size: int = 256):
    """Mesh variant: batch sharded over 'data', params replicated, and each
    device runs the batch->H fold on its LOCAL shard under shard_map (a
    global fold would merge the sharded batch axis into H and force
    gathers — same scheme as train.loop grad_fn_sharded)."""
    from jax.sharding import PartitionSpec as P

    def local(params, clf_params, images):
        return _eval_core(params, clf_params, images, True, crop_size)

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P("data")), out_specs=P("data"),
        )
    )


def evaluate_with_classifier(
    params,
    classifier_params,
    content_images,
    artist_index: int,
    batch_size: int = 4,
    wordy: bool = True,
    artists: tuple[str, ...] | None = None,
    mesh=None,
    quantize: bool = False,
    fold_batch: bool = False,
    crop_size: int = 256,
) -> float:
    """Top-1 accuracy of the classifier recognizing the target artist.

    ``content_images``: (N, H, W, 3) BGR [0,255], or a list of HWC images
    of possibly different sizes — the reference's ``RESIZE_IMGS=False``
    path evaluates raw sizes image-by-image (inference.py:93-98, :108);
    here mixed sizes batch per exact (H, W) so each distinct shape costs
    one compilation (same policy as ``stylize_batched``). Returns accuracy
    in % rounded to 2 decimals, as the reference prints (inference.py:166).

    With ``mesh``, each batch is sharded over the mesh's data axis and the
    (replicated) params stay put — the eval pipeline scales across chips
    the same way the train step does.

    ``quantize=True`` runs the whole pipeline on the int8 MXU (quantized
    stylizer + quantized frozen classifier, calibrated on the first few
    content images) — the eval throughput fast path; predictions may
    differ from the real-dtype pipeline by quantization rounding.

    ``fold_batch=True`` opts into the batch->H folded stylizer (per-shard
    under shard_map when a mesh divides the batch). Opt-in since round 4:
    direct measured faster (715.8 vs 644 img/s bf16-b16, BENCH_NOTES) and
    fresh folded compiles crash this toolchain's TPU compile helper — a
    crash matching that known signature latches the process-wide direct
    fallback (``infer.stylize._fold_broken``); other runtime errors
    propagate.

    ``crop_size``: the eval transform's center crop. Reference parity is
    256 (inference.py:56-59) — leave it there for real evaluations;
    smaller values exist so the multi-chip dry-run and its pytest twin
    can exercise the identical GSPMD int8 pipeline composition at tiny
    static shapes (the machinery is shape-independent).
    """
    if quantize:
        calib = [np.asarray(content_images[i]) for i in range(min(2, len(content_images)))]
        # Calibrate on same-shape images (mixed-size lists can't stack).
        calib = [c for c in calib if c.shape == calib[0].shape] or [calib[0]]
        params, classifier_params = quantize_eval_pipeline(
            params, classifier_params, np.stack(calib)
        )
    if mesh is not None:
        from artist_style_transfer_tpu.parallel.mesh import (
            batch_sharding,
            replicated_sharding,
        )

        params = jax.device_put(params, replicated_sharding(mesh))
        classifier_params = jax.device_put(classifier_params, replicated_sharding(mesh))
    # One eval callable per call: int8 pipeline when quantized (no fold —
    # the int8 layouts are already healthy, and GSPMD shards the batch via
    # the input sharding alone). The direct bf16 path is the default
    # (dispatched winner: 715.8 vs 644 folded img/s, BENCH_NOTES) and
    # GSPMD shards it via the input sharding alone under a mesh. With
    # ``fold_batch=True``: per-shard folded under shard_map when the mesh
    # divides the batch, folded single-device otherwise; ``fallback``
    # covers the round-3 toolchain regression where fresh folded compiles
    # crash the TPU compile helper — only a crash matching the known
    # signature latches the process-wide direct path
    # (infer.stylize._fold_broken); other runtime errors propagate.
    # NOTE: ``from ...infer import stylize`` would bind the re-exported
    # *function* (infer/__init__ shadows the submodule attribute).
    import importlib

    _stylize_mod = importlib.import_module("artist_style_transfer_tpu.infer.stylize")

    fallback = None
    direct = functools.partial(_eval_batch, fold_batch=False, crop_size=crop_size)
    if quantize:
        run = functools.partial(_eval_batch_int8, crop_size=crop_size)
    elif not fold_batch or _stylize_mod._fold_broken:
        run = direct
    elif mesh is not None and batch_size % mesh.devices.size == 0:
        run = _eval_batch_sharded(mesh, crop_size)
        fallback = direct
    elif mesh is not None:
        run = direct
    else:
        run = functools.partial(_eval_batch, fold_batch=True, crop_size=crop_size)
        fallback = direct
    n = len(content_images)
    preds = np.zeros((n,), np.int64)
    by_shape: dict[tuple, list[int]] = {}
    for i in range(n):
        by_shape.setdefault(tuple(content_images[i].shape[:2]), []).append(i)
    for idxs in by_shape.values():
        for j in range(0, len(idxs), batch_size):
            take = idxs[j : j + batch_size]
            chunk = np.stack([content_images[i] for i in take])
            pad = batch_size - len(take)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            chunk = jnp.asarray(chunk, jnp.float32)
            if mesh is not None:
                chunk = jax.device_put(chunk, batch_sharding(mesh))
            try:
                p = np.asarray(run(params, classifier_params, chunk))
            except jax.errors.JaxRuntimeError as e:
                if fallback is None or not _stylize_mod._is_fold_compile_crash(e):
                    raise
                _stylize_mod._fold_broken = True
                run, fallback = fallback, None
                p = np.asarray(run(params, classifier_params, chunk))
            preds[take] = p[: len(take)]
    correct = int((preds == artist_index).sum())
    if wordy and artists is not None:
        for i, p in enumerate(preds):
            print(f"Pred={artists[p]}\tActual={artists[artist_index]}\timage_num={i + 1}")
    acc = round(100.0 * correct / max(1, n), 2)
    if wordy:
        print(f"Acc={acc}")  # inference.py:166
    return acc
