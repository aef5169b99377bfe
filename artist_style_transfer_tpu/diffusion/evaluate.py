"""Fréchet-distance evaluation of diffusion samples (ROADMAP 6).

The reference has no diffusion source and therefore no eval for it
(SURVEY §0, C20); the build's quantitative metric follows the standard
FID recipe (Heusel et al. 2017) with one substitution: the feature
extractor is the repo's own pretrained artist classifier (the ResNet-50
of classifier.py:43-66, 512-dim penultimate features) instead of
InceptionV3, which does not exist in this stack. The number is therefore
a *classifier* Fréchet distance ("CFID") — comparable across runs of
this framework, not across papers.

All feature extraction is jit-compiled and batched on device; only the
tiny (512,) means and (512, 512) covariances come back to the host, where
the matrix square root runs once in float64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from artist_style_transfer_tpu.models.resnet import classifier_apply
from artist_style_transfer_tpu.ops.image import bgr_to_rgb, torchvision_normalize


@functools.partial(jax.jit, static_argnums=())
def _features_chunk(classifier_params, images_bgr255: jax.Array) -> jax.Array:
    """(N, 512) penultimate classifier features of NHWC BGR [0,255] images."""
    rgb01 = bgr_to_rgb(images_bgr255.astype(jnp.float32)) / 255.0
    return classifier_apply(
        classifier_params, torchvision_normalize(rgb01), return_features=True
    )


def classifier_features(
    classifier_params, images_bgr255, batch: int = 64
) -> np.ndarray:
    """Batched device-side feature extraction; returns host (N, 512) f32."""
    outs = []
    n = images_bgr255.shape[0]
    for i in range(0, n, batch):
        outs.append(np.asarray(_features_chunk(
            classifier_params, jnp.asarray(images_bgr255[i : i + batch])
        )))
    return np.concatenate(outs, axis=0)


def _mean_cov(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mu = feats.mean(axis=0, dtype=np.float64)
    d = feats.astype(np.float64) - mu
    cov = d.T @ d / max(1, feats.shape[0] - 1)
    return mu, cov


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """|mu1-mu2|^2 + tr(S1 + S2 - 2 (S1 S2)^{1/2}) for PSD S1, S2.

    tr((S1 S2)^{1/2}) is computed as sum sqrt eigvals of the PSD matrix
    sqrt(S1) S2 sqrt(S1) (same nonzero spectrum as S1 S2), so the whole
    thing needs only two symmetric eigendecompositions — no scipy sqrtm.
    """
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    s1 = (np.asarray(sigma1, np.float64) + np.asarray(sigma1, np.float64).T) / 2
    s2 = (np.asarray(sigma2, np.float64) + np.asarray(sigma2, np.float64).T) / 2
    diff = float(np.sum((mu1 - mu2) ** 2))
    w1, v1 = np.linalg.eigh(s1)
    root1 = (v1 * np.sqrt(np.clip(w1, 0.0, None))) @ v1.T
    m = root1 @ s2 @ root1
    wm = np.linalg.eigvalsh((m + m.T) / 2)
    tr_sqrt = float(np.sum(np.sqrt(np.clip(wm, 0.0, None))))
    return diff + float(np.trace(s1) + np.trace(s2)) - 2.0 * tr_sqrt


def cfid(
    classifier_params,
    real_images_bgr255,
    gen_images_bgr255,
    batch: int = 64,
) -> float:
    """Classifier Fréchet distance between real and generated image sets.

    Inputs are NHWC BGR [0,255] (any float/uint dtype), e.g. the painting
    corpus vs :func:`artist_style_transfer_tpu.diffusion.sample.diff_sample`
    outputs. Lower is better; identical sets give ~0.
    """
    f_real = classifier_features(classifier_params, real_images_bgr255, batch)
    f_gen = classifier_features(classifier_params, gen_images_bgr255, batch)
    mu_r, s_r = _mean_cov(f_real)
    mu_g, s_g = _mean_cov(f_gen)
    return frechet_distance(mu_r, s_r, mu_g, s_g)
