"""Batched Gram matrices — the style-loss hot op (reference train_cnn.py:103-107).

``gram(f) = f @ f^T / (C*H*W)`` over flattened spatial dims. On TPU this is a
single MXU contraction; the Pallas kernel in
:mod:`artist_style_transfer_tpu.ops.pallas.gram_kernel` tiles it explicitly
with the scale fused. This module provides the XLA path and the dispatcher.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.ops.precision import get_precision


def gram_matrix_xla(features_nhwc: jax.Array) -> jax.Array:
    """Normalized Gram matrices of a batch of NHWC feature maps.

    Returns (N, C, C) = einsum('nhwc,nhwd->ncd') / (C*H*W), numerically
    identical to the reference ``gram`` (train_cnn.py:103-107) which operates
    on NCHW. The contraction runs on the MXU with f32 accumulation.
    """
    n, h, w, c = features_nhwc.shape
    # Contract H and W directly in the dot_general — a reshape to (N, HW, C)
    # pins a row-major layout and costs two full-tensor layout copies when
    # the features arrive in the conv's native layout (measured 4.7 ms/step
    # at 224x224 C=64 b96).
    g = jax.lax.dot_general(
        features_nhwc,
        features_nhwc,
        dimension_numbers=(((1, 2), (1, 2)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=get_precision(),
    )
    return g / jnp.asarray(c * h * w, dtype=g.dtype)


def _gram_bwd_impl(features_nhwc, g):
    """VJP of G = F^T F / s: dF = F (dG + dG^T) / s — one batched MXU matmul.

    Computed in f32 and cast back to the features' dtype, so mixed-precision
    (bf16 activations, f32 Gram outputs) backpropagates with consistent
    operand dtypes.
    """
    n, h, w, c = features_nhwc.shape
    scale = 1.0 / float(c * h * w)
    # Keep F in its storage dtype: casting the whole feature map to f32
    # materializes a 2x-sized copy (HBM write+read) under mixed precision.
    # Only the tiny (N,C,C) symmetrized cotangent is cast; the MXU still
    # accumulates in f32 and the cotangent itself is f32-exact at the point
    # of the cast.
    sym = (g.astype(jnp.float32) + jnp.swapaxes(g, 1, 2).astype(jnp.float32)) * scale
    df = jax.lax.dot_general(
        features_nhwc,
        sym.astype(features_nhwc.dtype),
        dimension_numbers=(((3,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=get_precision(),
    )
    return (df.astype(features_nhwc.dtype),)


@jax.custom_vjp
def _gram_pallas_diff(features_nhwc: jax.Array) -> jax.Array:
    from artist_style_transfer_tpu.ops.pallas.gram_kernel import gram_matrix_pallas

    return gram_matrix_pallas(features_nhwc)


_gram_pallas_diff.defvjp(lambda f: (_gram_pallas_diff(f), f), _gram_bwd_impl)


@jax.custom_vjp
def _gram_xla_diff(features_nhwc: jax.Array) -> jax.Array:
    return gram_matrix_xla(features_nhwc)


_gram_xla_diff.defvjp(lambda f: (_gram_xla_diff(f), f), _gram_bwd_impl)


# ---------------------------------------------------------------------------
# Int8-MXU gram for the quantized training-loss path (ops/qconv scheme).
# ---------------------------------------------------------------------------


def _gram_int8_fwd(f):
    """G ~= s_f^2 (Fq Fq^T) / (C*H*W) with dynamic per-tensor int8 features.

    Uses the SAME ``absmax_scale``/``quant_i8`` expressions as
    :func:`ops.qconv.conv2d_frozen_int8`, so when the tap also feeds a
    quantized conv (relu3_3 -> conv4_1) XLA CSEs the two quantizations into
    one int8-producing pass.
    """
    from artist_style_transfer_tpu.ops.qconv import absmax_scale, quant_i8

    n, h, w, c = f.shape
    s_f = absmax_scale(f)
    fq = quant_i8(f, s_f)
    acc = jax.lax.dot_general(
        fq,
        fq,
        dimension_numbers=(((1, 2), (1, 2)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    g = acc.astype(jnp.float32) * (s_f * s_f / float(c * h * w))
    return g, (fq, s_f, jnp.zeros((), f.dtype))


def _gram_int8_bwd(res, dg):
    """STE data gradient of the int8 gram: dF = (Fq s_f) @ sym, itself int8.

    The symmetrized cotangent ``sym = (dG + dG^T)/(C*H*W)`` is a tiny
    (N, C, C) tensor; quantizing it dynamically costs nothing and puts the
    big (N, HW, C) contraction on the int8 MXU like the forward.
    """
    from artist_style_transfer_tpu.ops.qconv import absmax_scale, quant_i8

    fq, s_f, wit = res
    n, h, w, c = fq.shape
    sym = (dg.astype(jnp.float32) + jnp.swapaxes(dg, 1, 2).astype(jnp.float32)) * (
        1.0 / float(c * h * w)
    )
    s_sym = absmax_scale(sym)
    acc = jax.lax.dot_general(
        fq,
        quant_i8(sym, s_sym),
        dimension_numbers=(((3,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    df = acc.astype(jnp.float32) * (s_f * s_sym)
    return (df.astype(wit.dtype),)


@jax.custom_vjp
def _gram_int8_diff(features_nhwc: jax.Array) -> jax.Array:
    return _gram_int8_fwd(features_nhwc)[0]


_gram_int8_diff.defvjp(_gram_int8_fwd, _gram_int8_bwd)


def gram_matrix_int8(features_nhwc: jax.Array) -> jax.Array:
    """Normalized Gram on the int8 MXU (dynamic per-tensor feature scale).

    For the quantized-loss training path (``train(quantize_loss=...)``):
    the deep taps' grams ride the int8 MXU like the frozen VGG convs do
    (2x macs/cycle, half the operand bytes), with the STE backward running
    a second int8 contraction. Output is f32 like :func:`gram_matrix_xla`;
    relative error is rounding-only (<= ~1e-2 per element, noise not bias
    — symmetric round-to-nearest), trajectory-tested in
    tests/test_quant_loss.py.
    """
    return _gram_int8_diff(features_nhwc)


def gram_matrix(features_nhwc: jax.Array, use_pallas: str | bool = "auto") -> jax.Array:
    """Dispatch between the Pallas TPU kernel and the XLA contraction.

    ``use_pallas='auto'`` selects the Pallas kernel on TPU backends when the
    shapes are tile-friendly, else the XLA path (identical numerics, tested).
    The Pallas path is differentiable via a custom VJP (needed by the style
    loss in training).
    """
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        n, h, w, c = features_nhwc.shape
        if c % 128 == 0:
            from artist_style_transfer_tpu.ops.pallas.gram_kernel import _pick_tile

            try:
                # Healthy-tile gate: same policy as style_loss_gram.
                if _pick_tile(h * w, c, features_nhwc.dtype.itemsize) >= 256:
                    return _gram_pallas_diff(features_nhwc)
            except NotImplementedError:
                pass
    return _gram_xla_diff(features_nhwc)
