"""Gatys-style iterative stylization: optimize pixels directly (BASELINE config 1).

Not present as code in the reference (its feed-forward nets replace it), but
named as the first benchmark config: VGG-16 Gram + content losses on a
content/style image pair, Adam on the pixel tensor. The whole optimization
is a single jitted ``lax.scan`` — n_steps of forward+backward+update with no
host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from artist_style_transfer_tpu.models.vgg import vgg16_features
from artist_style_transfer_tpu.ops.gram import gram_matrix
from artist_style_transfer_tpu.ops.image import vgg_caffe_preprocess
from artist_style_transfer_tpu.ops.losses import content_loss, style_loss_gram


def gatys_stylize(
    vgg_params,
    content_bgr_255: jax.Array,  # (H, W, 3)
    style_bgr_255: jax.Array,  # (Hs, Ws, 3)
    *,
    num_steps: int = 300,
    lr: float = 4.0,
    content_weight: float = 17.0,
    style_weight: float = 25.0,
    use_pallas: str | bool = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Returns (stylized HWC BGR [0,255] f32, per-step total-loss trace)."""
    content = content_bgr_255[None].astype(jnp.float32)
    style = style_bgr_255[None].astype(jnp.float32)

    content_feats = vgg16_features(vgg_params, vgg_caffe_preprocess(content))
    target_r22 = content_feats["relu2_2"]
    style_feats = vgg16_features(vgg_params, vgg_caffe_preprocess(style))
    target_grams = {k: gram_matrix(v, use_pallas=use_pallas)[0] for k, v in style_feats.items()}

    tx = optax.adam(lr)

    def loss_fn(pixels):
        feats = vgg16_features(vgg_params, vgg_caffe_preprocess(pixels))
        c = content_weight * content_loss(feats["relu2_2"], target_r22)
        s = style_weight * style_loss_gram(feats, target_grams, use_pallas=use_pallas)
        return c + s

    grad_fn = jax.value_and_grad(loss_fn)

    @jax.jit
    def run(pixels0):
        def body(carry, _):
            pixels, opt_state = carry
            loss, grads = grad_fn(pixels)
            updates, opt_state = tx.update(grads, opt_state, pixels)
            pixels = optax.apply_updates(pixels, updates)
            return (pixels, opt_state), loss

        (pixels, _), losses = jax.lax.scan(
            body, (pixels0, tx.init(pixels0)), None, length=num_steps
        )
        return pixels, losses

    pixels, losses = run(content)
    return jnp.clip(pixels[0], 0.0, 255.0), losses
