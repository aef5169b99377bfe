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

from artist_style_transfer_tpu.models.vgg import FOLD_PAD, VGG_LAYER_NAMES
from artist_style_transfer_tpu.ops.gram import gram_matrix


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    d = (a - b).astype(jnp.float32)
    return jnp.mean(jnp.square(d))


def content_loss(
    gen_relu2_2: jax.Array,
    content_relu2_2: jax.Array,
    use_pallas: str | bool = "auto",
    folded: bool = False,
) -> jax.Array:
    """Perceptual content loss: MSE over relu2_2 feature maps.

    Plain XLA on every backend: a streaming Pallas MSE kernel was tried and
    REMOVED in round 2 — end-to-end it cost ~4 ms/step (800 -> 825 img/s
    without it) because the pallas_call forced materialization of the
    gathered content features and a layout copy, where XLA fuses the
    corpus gather straight into the reduction. ``use_pallas`` is accepted
    for API stability and ignored.

    ``folded=True``: ``gen_relu2_2`` comes from the batch->H-folded VGG
    (models.vgg._vgg16_features_folded) and carries FOLD_PAD['relu2_2'] zero
    separator rows; the unfolded target is zero-padded to align (the folded
    rows are exactly zero, so the padded positions contribute nothing) and
    the mean is rescaled to the true element count — numerically identical
    to the unfolded MSE.
    """
    del use_pallas
    if not folded:
        return mse(gen_relu2_2, content_relu2_2)
    pad = FOLD_PAD["relu2_2"]
    rows_f = gen_relu2_2.shape[1]
    tgt = jnp.pad(content_relu2_2, ((0, 0), (pad // 2, pad // 2), (0, 0), (0, 0)))
    return mse(gen_relu2_2, tgt) * (rows_f / (rows_f - pad))


def np_prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def style_loss_gram(
    gen_features: dict[str, jax.Array],
    target_grams: dict[str, jax.Array],
    use_pallas: str | bool = "auto",
    folded: bool = False,
    quantize: bool = False,
) -> jax.Array:
    """Sum of per-tap Gram MSEs (train_cnn.py:321-325).

    ``target_grams[name]`` is (C, C) or (N, C, C) — precomputed once,
    HBM-resident. Each tap's Gram is a reshape-free XLA dot_general; the
    scalar MSE works on the tiny (N, C, C) result.

    ``use_pallas='auto'`` resolves to the XLA path HERE (unlike standalone
    :func:`gram_matrix`, where 'auto' picks the Pallas kernel on TPU):
    inside the full training graph the pallas_call's input layout
    constraint forces copies of the conv-native tap layouts, measured
    1.2 ms/step slower than letting XLA contract in place (77.9 vs 76.7
    ms for the loss fwd+dgrad at b128/224 — the same in-context failure
    mode as the removed MSE and gram+residual kernels). Pass
    ``use_pallas=True`` to force the kernel.
    """
    if use_pallas == "auto":
        use_pallas = False
    loss = jnp.float32(0.0)
    for name in VGG_LAYER_NAMES:
        feats = gen_features[name]
        c = feats.shape[-1]
        hw = feats.shape[1] * feats.shape[2]
        # Per-tap: Pallas gram with the largest-divisor tile picker when the
        # shape qualifies (gram_matrix dispatches), then a tiny (N, C, C)
        # XLA MSE. A fully-fused gram+residual Pallas kernel was tried and
        # REMOVED in round 2: measured slower in the full training graph
        # than gram_matrix + XLA MSE (764 vs 802 img/s end to end) — the
        # residual fusion saved only a (N,C,C)-sized pass but constrained
        # scheduling around the big contraction.
        # ``quantize=True`` (the quantize_loss train path): the deep taps'
        # grams run on the int8 MXU. Gated to C >= 256 — the relu3_3 quant
        # pass CSEs with conv4_1's input quant (identical expression), and
        # relu4_3's is small; at C <= 128 the 224^2/112^2 quant passes cost
        # more than the contraction win (the same wall the quantize_loss
        # split-point sweep measured, BENCH_NOTES).
        # Folded taps (FOLD_PAD > 0: the shallow ones) carry separator rows
        # the int8 gram's rescale does not model — but the deep taps arrive
        # unfolded even under folding (FOLD_PAD == 0), so they keep the
        # int8-MXU gram.
        if quantize and c >= 256 and not (folded and FOLD_PAD[name]):
            from artist_style_transfer_tpu.ops.gram import gram_matrix_int8

            g = gram_matrix_int8(feats)
        else:
            g = gram_matrix(feats, use_pallas=use_pallas)
        if folded and FOLD_PAD[name]:
            # Folded taps carry FOLD_PAD zero separator rows: the Gram SUM is
            # unaffected (zero rows contribute zero) but gram_matrix's
            # 1/(C*H*W) used the folded row count — rescale to the true one.
            rows_f = feats.shape[1]
            g = g * (rows_f / (rows_f - FOLD_PAD[name]))
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
