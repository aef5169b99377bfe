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


def _pick_tile(hw: int, c: int, itemsize: int, vmem_budget: int = 4 * 1024 * 1024) -> int:
    """Largest sublane-aligned divisor of hw whose (tile, C) block fits VMEM.

    The old fixed-candidate fallback (256..8) degraded the training shapes —
    every VGG tap at 224x224 has hw = 49 * 2^k, so hw % 512 != 0 and the
    fallback picked 16-64-row tiles whose matmuls idle most of the MXU
    contraction. Preferring the LARGEST fitting divisor (e.g. the whole
    784x512 relu4_3 map: 803 KB) keeps the K dimension fat.
    """
    align = 8 if itemsize >= 4 else 16
    best = 0
    for d in range(1, int(hw**0.5) + 1):
        if hw % d == 0:
            for cand in (d, hw // d):
                if cand % align == 0 and cand * c * itemsize <= vmem_budget:
                    best = max(best, cand)
    if best == 0:
        raise NotImplementedError(f"HW={hw} not tileable (align {align})")
    return best


@functools.partial(jax.jit, static_argnames=("tile_hw",))
def gram_matrix_pallas(features_nhwc: jax.Array, tile_hw: int | None = None) -> jax.Array:
    """Batched normalized Gram via a tiled Pallas matmul. Returns (N, C, C) f32.

    Requires C a multiple of 128 and a sublane-aligned divisor of H*W that
    fits VMEM (true for every VGG tap at the training resolutions); other
    shapes raise NotImplementedError and the dispatcher uses the XLA path.
    """
    n, h, w, c = features_nhwc.shape
    hw = h * w
    if c % 128 != 0:
        raise NotImplementedError(f"C={c} not MXU-tileable")
    tile = tile_hw or _pick_tile(hw, c, features_nhwc.dtype.itemsize)
    if hw % tile != 0:
        raise NotImplementedError(f"tile {tile} does not divide HW={hw}")
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
