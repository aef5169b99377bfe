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


def _eval_core(params, clf_params, images_bgr_255: jax.Array,
               fold_batch: bool = True) -> jax.Array:
    """Predicted class per image: stylize -> uint8 clip -> crop -> classify.

    ``fold_batch``: batch->H folded shallow transformer layers (fast
    precision only; no-op for unfoldable shapes)."""
    out = transformer_apply(params, images_bgr_255, fold_batch=fold_batch)
    # The reference quantizes to uint8 before the classifier transform
    # (inference.py:116 -> :154); reproduce the rounding.
    out = jnp.floor(jnp.clip(out, 0.0, 255.0))
    crop = center_crop(out, 256)
    rgb01 = bgr_to_rgb(crop) / 255.0
    logits = classifier_apply(clf_params, torchvision_normalize(rgb01))
    return jnp.argmax(logits, axis=-1)


_eval_batch = jax.jit(_eval_core, static_argnames=("fold_batch",))


@functools.lru_cache(maxsize=None)
def _eval_batch_sharded(mesh):
    """Mesh variant: batch sharded over 'data', params replicated, and each
    device runs the batch->H fold on its LOCAL shard under shard_map (a
    global fold would merge the sharded batch axis into H and force
    gathers — same scheme as train.loop grad_fn_sharded)."""
    from jax.sharding import PartitionSpec as P

    def local(params, clf_params, images):
        return _eval_core(params, clf_params, images, True)

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
    """
    if mesh is not None:
        from artist_style_transfer_tpu.parallel.mesh import (
            batch_sharding,
            replicated_sharding,
        )

        params = jax.device_put(params, replicated_sharding(mesh))
        classifier_params = jax.device_put(classifier_params, replicated_sharding(mesh))
    # One eval callable per call: per-shard folded under shard_map when the
    # mesh divides the batch; unfolded global otherwise; folded single-device.
    if mesh is not None and batch_size % mesh.devices.size == 0:
        run = _eval_batch_sharded(mesh)
    elif mesh is not None:
        run = functools.partial(_eval_batch, fold_batch=False)
    else:
        run = functools.partial(_eval_batch, fold_batch=True)
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
