"""Style-target builders for the five training modes (reference train_cnn.py:172-275).

Each builder returns a ``StyleTargets`` whose arrays are device-resident for
the whole run:

- 'random'       one painting's per-tap Grams                 (train_cnn.py:181-196)
- 'average'      the artist's mean image's Grams              (train_cnn.py:197-205)
- 'cycle'        per-painting Grams for the full corpus,
                 stacked (P, C, C) per tap and indexed inside
                 jit by ``step %% P`` — the reference keeps
                 these on CPU and copies one to the GPU every
                 step (train_cnn.py:218, :323); here they live
                 in HBM once                                  (train_cnn.py:206-223)
- 'smartaverage' mean of raw VGG *features* over the corpus,
                 then one Gram (average of features, NOT of
                 Grams — train_cnn.py:224-244)
- 'classifier'   no Grams; an integer label vector            (train_cnn.py:260-272)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from artist_style_transfer_tpu.models.vgg import VGG_LAYER_NAMES, vgg16_features
from artist_style_transfer_tpu.ops.gram import gram_matrix
from artist_style_transfer_tpu.ops.image import vgg_caffe_preprocess

MODES = ("random", "average", "smartaverage", "cycle", "classifier")


@dataclasses.dataclass
class StyleTargets:
    """Device-resident targets for one training run."""

    mode: str
    # Gram modes: {tap: (C,C)} — or for 'cycle': {tap: (P,C,C)}.
    grams: dict[str, jax.Array] | None = None
    num_cycle: int = 0  # P for 'cycle', else 0
    labels: jax.Array | None = None  # (B,) int32 for 'classifier'
    style_preview_bgr: np.ndarray | None = None  # HWC [0,255] for style.jpg

    def gram_for_step(self, step: jax.Array) -> dict[str, jax.Array]:
        """Select this step's target Grams (jit-safe dynamic index for 'cycle')."""
        return select_step_grams(
            self.grams, step, self.num_cycle if self.mode == "cycle" else 0
        )


def select_step_grams(
    grams: dict[str, jax.Array], step: jax.Array, num_cycle: int
) -> dict[str, jax.Array]:
    """This step's target Grams: for 'cycle' (``num_cycle > 0``) dynamic-index
    the per-tap (P, C, C) stacks by ``step % P`` (jit-safe), else pass through.

    The single source of the cycle-selection rule — both
    :meth:`StyleTargets.gram_for_step` and the training loss (which receives
    ``grams`` as a jit argument rather than through ``self``) call this.
    """
    if not num_cycle:
        return grams
    idx = jnp.mod(step, num_cycle)
    return {
        k: jax.lax.dynamic_index_in_dim(v, idx, axis=0, keepdims=False)
        for k, v in grams.items()
    }


def _grams_of_image(vgg_params, image_bgr_255: jax.Array) -> dict[str, jax.Array]:
    """Per-tap normalized Grams of one image (HWC BGR [0,255]) -> {tap: (C,C)}."""
    x = vgg_caffe_preprocess(image_bgr_255)[None]
    feats = vgg16_features(vgg_params, x)
    return {k: gram_matrix(v)[0] for k, v in feats.items()}


@jax.jit
def _grams_of_batch(vgg_params, images_bgr_255: jax.Array) -> dict[str, jax.Array]:
    """Per-tap Grams for a batch of images -> {tap: (B, C, C)}."""
    x = vgg_caffe_preprocess(images_bgr_255)
    feats = vgg16_features(vgg_params, x)
    return {k: gram_matrix(v) for k, v in feats.items()}


@jax.jit
def _feature_sum_of_batch(vgg_params, images_bgr_255: jax.Array) -> dict[str, jax.Array]:
    """Sum of per-tap VGG features over a batch -> {tap: (1, Hf, Wf, C)}."""
    x = vgg_caffe_preprocess(images_bgr_255)
    feats = vgg16_features(vgg_params, x)
    return {k: jnp.sum(v, axis=0, keepdims=True) for k, v in feats.items()}


def build_style_targets(
    mode: str,
    vgg_params,
    artist: str,
    *,
    paintings: np.ndarray | None = None,  # (P, H, W, 3) BGR f32 [0,255]
    avg_image: np.ndarray | None = None,  # (H, W, 3) BGR f32 [0,255]
    batch_size: int = 4,
    artist_index: int | None = None,
    rng: np.random.Generator | None = None,
    chunk: int = 8,
) -> StyleTargets:
    """Build the device-resident style targets for ``mode``.

    Gram batching note: the reference expands each painting to the batch size
    before the VGG pass (train_cnn.py:187), producing B identical Gram rows;
    a (C,C) target broadcast against the generated batch's (B,C,C) Grams
    gives the identical MSE, so targets here are stored un-expanded.
    """
    if mode not in MODES:
        raise ValueError(f"enter valid style method! got {mode!r}")  # train_cnn.py:274

    if mode == "classifier":
        if artist_index is None:
            raise ValueError("classifier mode needs artist_index")
        labels = jnp.full((batch_size,), artist_index, jnp.int32)
        return StyleTargets(mode=mode, labels=labels)

    if mode == "random":
        assert paintings is not None and len(paintings)
        rng = rng or np.random.default_rng()
        pick = int(rng.integers(0, len(paintings)))  # train_cnn.py:184
        img = paintings[pick]
        grams = _grams_of_image(vgg_params, jnp.asarray(img))
        return StyleTargets(mode=mode, grams=grams, style_preview_bgr=np.asarray(img))

    if mode == "average":
        assert avg_image is not None
        grams = _grams_of_image(vgg_params, jnp.asarray(avg_image))
        return StyleTargets(mode=mode, grams=grams, style_preview_bgr=np.asarray(avg_image))

    assert paintings is not None and len(paintings)
    p = len(paintings)

    if mode == "cycle":
        # Chunked batched Gram precompute, all resident on device.
        per_tap: dict[str, list[jax.Array]] = {k: [] for k in VGG_LAYER_NAMES}
        for i in range(0, p, chunk):
            batch = jnp.asarray(paintings[i : i + chunk])
            g = _grams_of_batch(vgg_params, batch)
            for k in VGG_LAYER_NAMES:
                per_tap[k].append(g[k])
        grams = {k: jnp.concatenate(v, axis=0) for k, v in per_tap.items()}
        return StyleTargets(mode=mode, grams=grams, num_cycle=p)

    if mode == "smartaverage":
        sums: dict[str, jax.Array] | None = None
        for i in range(0, p, chunk):
            batch = jnp.asarray(paintings[i : i + chunk])
            s = _feature_sum_of_batch(vgg_params, batch)
            sums = s if sums is None else {k: sums[k] + s[k] for k in sums}
        # average of features, then one Gram (train_cnn.py:242-243)
        grams = {k: gram_matrix(v / p)[0] for k, v in sums.items()}
        return StyleTargets(mode=mode, grams=grams)

    raise AssertionError(mode)
