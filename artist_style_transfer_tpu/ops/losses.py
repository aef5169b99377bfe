"""Loss functions for the five training modes (reference train_cnn.py:303-325).

All losses are jit-friendly scalar reductions:

- content loss: MSE over relu2_2 activations, x content_weight
  (train_cnn.py:307-308; in 'classifier' mode the VGG returns the relu2_2
  tensor directly, train_cnn.py:304-305 — numerically the same reduction)
- gram style loss: sum over the 4 VGG taps of MSE(gram(gen), target_gram),
  x style_weight (train_cnn.py:321-325)
- classifier style loss: cross-entropy of the frozen artist classifier's
  logits against the target artist index, x style_weight
  (train_cnn.py:311-314)

MSE uses torch ``nn.MSELoss`` semantics: mean over all elements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.models.vgg import VGG_LAYER_NAMES
from artist_style_transfer_tpu.ops.gram import gram_matrix


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    d = (a - b).astype(jnp.float32)
    return jnp.mean(jnp.square(d))


def content_loss(
    gen_relu2_2: jax.Array,
    content_relu2_2: jax.Array,
    use_pallas: str | bool = "auto",
) -> jax.Array:
    """Perceptual content loss: MSE over relu2_2 feature maps.

    On TPU the reduction streams both tensors through a fused Pallas kernel
    (one read each, SMEM accumulator); elsewhere plain XLA.
    """
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and gen_relu2_2.shape == content_relu2_2.shape:
        rows = int(np_prod(gen_relu2_2.shape[:-1]))
        if rows % 8 == 0 and gen_relu2_2.shape[-1] % 128 == 0:
            from artist_style_transfer_tpu.ops.pallas.mse_kernel import mse_pallas

            return mse_pallas(gen_relu2_2, content_relu2_2)
    return mse(gen_relu2_2, content_relu2_2)


def np_prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


@jax.custom_vjp
def _gram_mse_fused(features: jax.Array, target: jax.Array) -> jax.Array:
    from artist_style_transfer_tpu.ops.pallas.gram_kernel import gram_residual_pallas

    resid = gram_residual_pallas(features, target)
    n, c = resid.shape[0], resid.shape[1]
    return jnp.sum(jnp.square(resid)) / (n * c * c)


def _gram_mse_fwd(features, target):
    from artist_style_transfer_tpu.ops.pallas.gram_kernel import gram_residual_pallas

    resid = gram_residual_pallas(features, target)
    n, c = resid.shape[0], resid.shape[1]
    loss = jnp.sum(jnp.square(resid)) / (n * c * c)
    return loss, (features, target, resid)


def _gram_mse_bwd(res, g):
    """dL/dF = 4 g/(N C^2) * F @ resid * scale  (resid = G - T is symmetric)."""
    features, target, resid = res
    n, h, w, c = features.shape
    scale = 1.0 / float(c * h * w)
    coef = (4.0 * g / (n * c * c)) * scale
    # 4-D contraction, features kept in their storage dtype: a reshape to
    # (N, HW, C) + f32 cast costs two full-tensor HBM round trips (layout
    # copy + widened copy); only the tiny (N, C, C) residual is cast.
    df = jax.lax.dot_general(
        features,
        resid.astype(features.dtype),
        dimension_numbers=(((3,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * coef
    dt = jnp.zeros_like(target)  # targets are frozen constants
    return df.astype(features.dtype), dt


_gram_mse_fused.defvjp(_gram_mse_fwd, _gram_mse_bwd)


def style_loss_gram(
    gen_features: dict[str, jax.Array],
    target_grams: dict[str, jax.Array],
    use_pallas: str | bool = "auto",
) -> jax.Array:
    """Sum of per-tap Gram MSEs (train_cnn.py:321-325).

    ``target_grams[name]`` is (C, C) or (N, C, C) — precomputed once,
    HBM-resident. On TPU the per-tap Gram + target subtraction runs as one
    fused Pallas kernel (the north-star fused style loss); the scalar
    reduction and its VJP work on the tiny (N, C, C) residual.
    """
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    loss = jnp.float32(0.0)
    for name in VGG_LAYER_NAMES:
        feats = gen_features[name]
        c = feats.shape[-1]
        hw = feats.shape[1] * feats.shape[2]
        # The fused kernel needs healthy HW tiles: when HW is not a
        # multiple of 512 the divisor fallback degrades to 16-64-row tiles
        # (training resolutions have HW = 49*2^k) and XLA's batched matmul
        # wins by ~2x (round-2 profiling) — dispatch Pallas only where its
        # tiling is full-size.
        if use_pallas and c % 128 == 0 and hw % 512 == 0:
            loss = loss + _gram_mse_fused(feats, target_grams[name])
        else:
            g = gram_matrix(feats, use_pallas=use_pallas)
            loss = loss + mse(g, target_grams[name])
    return loss


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy, torch ``nn.CrossEntropyLoss`` semantics."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def psnr(a: jax.Array, b: jax.Array, peak: float = 255.0) -> jax.Array:
    """Peak signal-to-noise ratio in dB — the parity metric (BASELINE.md)."""
    m = mse(a, b)
    return 10.0 * jnp.log10(peak * peak / m)
