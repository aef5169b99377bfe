"""Normalization ops: instance norm (per-sample, over H,W) and inference batch norm.

Instance norm is the TransformerNet's workhorse (reference cnn.py:68); in JAX
it is a handful of fused VPU ops that XLA fuses into the surrounding convs —
no hand-written kernel needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.ops.precision import get_precision

# torch nn.InstanceNorm2d default epsilon (parity-critical, SURVEY §7 hard part b).
INSTANCE_NORM_EPS = 1e-5
BATCH_NORM_EPS = 1e-5


def _in_forward(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float):
    """Instance-norm forward; returns (y, mean, inv) with f32 stats."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    if get_precision() == "highest":
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    else:
        m2 = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = (((x32 - mean) * inv).astype(x.dtype)) * scale + bias
    return y, mean, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
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

    Differentiation uses a hand-derived VJP: JAX autodiff of the stats
    chain saves the f32 ``(x - mean)`` intermediate as a residual — a
    widened full-activation HBM round trip per IN layer (the TransformerNet
    has 17 of them; measured ~16 ms of a 149 ms train step). The custom
    rule saves only ``x`` (already resident) plus the (N,1,1,C) stats and
    recomputes x-hat inside the backward fusions.
    """
    y, _, _ = _in_forward(x, scale, bias, eps)
    return y


def _in_fwd(x, scale, bias, eps):
    y, mean, inv = _in_forward(x, scale, bias, eps)
    return y, (x, mean, inv, scale)


def _in_bwd(eps, res, dy):
    """dx = inv * (g - mean(g) - xhat * mean(g * xhat)), g = dy * gamma.

    dgamma = sum(dy * xhat), dbeta = sum(dy); all reductions in f32, the
    elementwise xhat recompute fuses into the reduction/output passes.
    """
    x, mean, inv, scale = res
    xhat = (x.astype(jnp.float32) - mean) * inv
    dy32 = dy.astype(jnp.float32)
    dgamma = jnp.sum(dy32 * xhat, axis=(0, 1, 2)).astype(scale.dtype)
    dbeta = jnp.sum(dy32, axis=(0, 1, 2)).astype(scale.dtype)
    g = dy32 * scale.astype(jnp.float32)
    m1 = jnp.mean(g, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(g * xhat, axis=(1, 2), keepdims=True)
    dx = (inv * (g - m1 - xhat * m2)).astype(x.dtype)
    return dx, dgamma, dbeta


instance_norm.defvjp(_in_fwd, _in_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def instance_norm_act(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    relu: bool = True,
    eps: float = INSTANCE_NORM_EPS,
) -> jax.Array:
    """Instance norm with the following ReLU folded in (fast-mode hot path).

    Forward is exactly ``relu(instance_norm(x, scale, bias))`` (or plain IN
    with ``relu=False``). Consolidating the two ops into one custom VJP
    recomputes the ReLU mask in the backward from the IN residuals
    (pre-activation sign = xhat*gamma+beta > 0) instead of storing
    ``relu_fast``'s bool mask — one fewer residual array per layer, and
    measured marginally faster (71.4 -> 70.9 ms transformer fwd+bwd at
    b128/224 bf16). A VMEM-resident two-phase Pallas backward was also
    built and measured: 97.9 ms end-to-end — the pallas_call boundaries
    (explicit staging of x/dy, broken fusion with the neighboring conv
    dgrads) cost far more than the saved HBM passes, consistent with
    every other in-context kernel experiment this round (BENCH_NOTES).
    """
    y, _, _ = _in_forward(x, scale, bias, eps)
    return jnp.maximum(y, 0) if relu else y


def _in_act_fwd(x, scale, bias, relu, eps):
    y, mean, inv = _in_forward(x, scale, bias, eps)
    return (jnp.maximum(y, 0) if relu else y), (x, mean, inv, scale, bias)


def _in_act_bwd_xla(relu, res, dy):
    x, mean, inv, scale, bias = res
    xhat = (x.astype(jnp.float32) - mean) * inv
    dy32 = dy.astype(jnp.float32)
    if relu:
        pre = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        dy32 = jnp.where(pre > 0, dy32, 0.0)
    dgamma = jnp.sum(dy32 * xhat, axis=(0, 1, 2)).astype(scale.dtype)
    dbeta = jnp.sum(dy32, axis=(0, 1, 2)).astype(scale.dtype)
    g = dy32 * scale.astype(jnp.float32)
    m1 = jnp.mean(g, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(g * xhat, axis=(1, 2), keepdims=True)
    dx = (inv * (g - m1 - xhat * m2)).astype(x.dtype)
    return dx, dgamma, dbeta


def _in_act_bwd(relu, eps, res, dy):
    del eps
    return _in_act_bwd_xla(relu, res, dy)


instance_norm_act.defvjp(_in_act_fwd, _in_act_bwd)


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
    ``eval()`` (train_cnn.py:158, inference.py:62), so style-transfer training
    only ever uses this frozen form — style gradients must flow through frozen
    stats identically (SURVEY §7 hard part e). Works on NHWC (C = last axis)
    and NC tensors. Training-mode BN (for training the classifier itself,
    the workflow the reference outsources to an external Kaggle notebook,
    README.md:34-35) is :func:`batch_norm_train`.
    """
    inv = jax.lax.rsqrt(running_var + eps) * scale
    return x * inv + (bias - running_mean * inv)


def batch_norm_train(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = BATCH_NORM_EPS,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Training-mode batch norm: normalize by batch statistics.

    Returns ``(y, batch_mean, batch_var_unbiased)``. Normalization uses the
    biased variance; the returned variance is the unbiased estimate — the
    pair torch's ``nn.BatchNorm{1,2}d`` uses in train mode (normalize biased,
    update running_var unbiased). Stats reduce over every axis but the last
    (NHWC or NC), in f32. Under a data-parallel ``jit`` with the batch axis
    sharded, GSPMD turns these reductions into cross-device all-reduces, so
    the statistics are the *global*-batch statistics automatically (tested
    mesh == single-device in tests/test_classifier_train.py).
    """
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x32, axis=axes)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes)
    n = 1
    for a in axes:
        n *= x.shape[a]
    var_unbiased = var * (n / max(n - 1, 1))
    inv = jax.lax.rsqrt(var + eps) * scale
    y = (x32 * inv + (bias - mean * inv)).astype(x.dtype)
    return y, mean, var_unbiased
