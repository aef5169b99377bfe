"""Normalization ops: instance norm (per-sample, over H,W) and inference batch norm.

Instance norm is the TransformerNet's workhorse (reference cnn.py:68); in JAX
it is a handful of fused VPU ops that XLA fuses into the surrounding convs —
no hand-written kernel needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.ops.precision import get_precision

# torch nn.InstanceNorm2d default epsilon (parity-critical, SURVEY §7 hard part b).
INSTANCE_NORM_EPS = 1e-5
BATCH_NORM_EPS = 1e-5


def instance_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = INSTANCE_NORM_EPS,
) -> jax.Array:
    """Affine instance norm over an NHWC tensor.

    Per-sample, per-channel mean/variance over (H, W), biased variance,
    matching ``nn.InstanceNorm2d(C, affine=True)`` in eval and train mode
    (torch's instance norm never uses running stats by default;
    reference cnn.py:68, :114).

    Variance formulation follows the global precision policy: the exact
    two-pass E[(x-mean)^2] under 'highest' (parity mode), and the one-pass
    E[x^2] - mean^2 otherwise — one fewer full read of the activation
    (~12% whole-net throughput at 512x512), at a small, measured PSNR cost
    (both forms compute stats in f32).
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    if get_precision() == "highest":
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    else:
        m2 = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return (((x32 - mean) * inv).astype(x.dtype)) * scale + bias


def batch_norm_inference(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    eps: float = BATCH_NORM_EPS,
) -> jax.Array:
    """Inference-mode batch norm using frozen running statistics.

    The reference always runs its BN-bearing models (ResNet-50 classifier) in
    ``eval()`` (train_cnn.py:158, inference.py:62), so training-mode BN is
    deliberately not implemented — style gradients must flow through frozen
    stats identically (SURVEY §7 hard part e). Works on NHWC (C = last axis)
    and NC tensors.
    """
    inv = jax.lax.rsqrt(running_var + eps) * scale
    return x * inv + (bias - running_mean * inv)
