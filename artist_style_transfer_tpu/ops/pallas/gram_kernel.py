"""Pallas TPU kernel for batched, normalized Gram matrices.

Computes G[n] = F[n]^T F[n] / (C*H*W) for NHWC features — an MXU-bound
(C x HW) @ (HW x C) contraction per batch element, tiled over the HW axis
with an f32 VMEM accumulator so arbitrarily large spatial extents stream
through VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gram_kernel(f_ref, out_ref, acc_ref, *, scale: float, hw_tiles: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f = f_ref[0]  # (TILE_HW, C)
    acc_ref[:] += jax.lax.dot_general(
        f, f,
        dimension_numbers=(((0,), (0,)), ((), ())),  # F^T F: contract HW
        preferred_element_type=jnp.float32,
    )

    @pl.when(t == hw_tiles - 1)
    def _():
        out_ref[0] = acc_ref[:] * scale


def _gram_resid_kernel(f_ref, t_ref, out_ref, acc_ref, *, scale: float, hw_tiles: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f = f_ref[0]  # (TILE_HW, C)
    acc_ref[:] += jax.lax.dot_general(
        f, f,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(t == hw_tiles - 1)
    def _():
        # Fused normalize + target subtraction: residual = G*scale - T.
        out_ref[0] = acc_ref[:] * scale - t_ref[0].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile_hw",))
def gram_residual_pallas(
    features_nhwc: jax.Array, target_gram: jax.Array, tile_hw: int = 512
) -> jax.Array:
    """Fused (gram(F) - T) residual: the style-loss hot path in one kernel.

    ``target_gram`` is (C, C) (broadcast over batch) or (N, C, C).
    Returns (N, C, C) f32 residuals; the scalar MSE and its VJP are a few
    FLOPs on this tiny tensor (see ops.losses.style_loss_gram).
    """
    n, h, w, c = features_nhwc.shape
    hw = h * w
    if c % 128 != 0:
        raise NotImplementedError(f"C={c} not MXU-tileable")
    tile = min(tile_hw, hw)
    if hw % tile != 0:
        for cand in (256, 128, 64, 32, 16, 8):
            if hw % cand == 0:
                tile = cand
                break
        else:
            raise NotImplementedError(f"HW={hw} not tileable")
    hw_tiles = hw // tile
    f = features_nhwc.reshape(n, hw, c)
    if target_gram.ndim == 2:
        target = jnp.broadcast_to(target_gram[None], (n, c, c))
        t_index = lambda i, t: (i, 0, 0)
    else:
        target = target_gram
        t_index = lambda i, t: (i, 0, 0)
    scale = 1.0 / float(c * h * w)

    kernel = functools.partial(_gram_resid_kernel, scale=scale, hw_tiles=hw_tiles)
    return pl.pallas_call(
        kernel,
        grid=(n, hw_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, c), t_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hw * c * c,
            bytes_accessed=n * hw * c * 4 + 2 * n * c * c * 4,
            transcendentals=0,
        ),
    )(f, target)


@functools.partial(jax.jit, static_argnames=("tile_hw",))
def gram_matrix_pallas(features_nhwc: jax.Array, tile_hw: int = 512) -> jax.Array:
    """Batched normalized Gram via a tiled Pallas matmul. Returns (N, C, C) f32.

    Requires C a multiple of 128 and H*W a multiple of 8 (true for every VGG
    tap at the training resolutions); other shapes raise NotImplementedError
    and the dispatcher uses the XLA path.
    """
    n, h, w, c = features_nhwc.shape
    hw = h * w
    if c % 128 != 0:
        raise NotImplementedError(f"C={c} not MXU-tileable")
    tile = min(tile_hw, hw)
    if hw % tile != 0:
        # Fall back to the largest divisor that keeps sublane alignment.
        for cand in (256, 128, 64, 32, 16, 8):
            if hw % cand == 0:
                tile = cand
                break
        else:
            raise NotImplementedError(f"HW={hw} not tileable")
    hw_tiles = hw // tile
    f = features_nhwc.reshape(n, hw, c)
    scale = 1.0 / float(c * h * w)

    kernel = functools.partial(_gram_kernel, scale=scale, hw_tiles=hw_tiles)
    out = pl.pallas_call(
        kernel,
        grid=(n, hw_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hw * c * c,
            bytes_accessed=n * hw * c * 4 + n * c * c * 4,
            transcendentals=0,
        ),
    )(f)
    return out
