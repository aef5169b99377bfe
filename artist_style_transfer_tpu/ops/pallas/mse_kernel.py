"""Pallas TPU kernel for the perceptual content loss: fused MSE reduction.

MSE over two large activation tensors (relu2_2 feature maps,
reference train_cnn.py:307) as a single streaming kernel: both operands are
read once, squared differences accumulate in an SMEM scalar across grid
steps. The VJP is analytic (d/da mean((a-b)^2) = 2(a-b)/n) — no residual
bigger than the inputs themselves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mse_kernel(a_ref, b_ref, out_ref, acc_ref, *, n_tiles: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc_ref[0, 0] = jnp.float32(0.0)

    d = a_ref[:].astype(jnp.float32) - b_ref[:].astype(jnp.float32)
    acc_ref[0, 0] += jnp.sum(d * d)

    @pl.when(t == n_tiles - 1)
    def _():
        out_ref[0, 0] = acc_ref[0, 0]


@jax.jit
def _sumsq_diff_pallas(a2d: jax.Array, b2d: jax.Array) -> jax.Array:
    rows, cols = a2d.shape
    tile = 256
    while rows % tile != 0:
        tile //= 2
        if tile == 0:
            raise NotImplementedError(f"rows={rows} not tileable")
    n_tiles = rows // tile
    kernel = functools.partial(_mse_kernel, n_tiles=n_tiles)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, cols), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cols), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
    )(a2d, b2d)
    return out[0, 0]


@jax.custom_vjp
def mse_pallas(a: jax.Array, b: jax.Array) -> jax.Array:
    """Mean squared error via a fused streaming Pallas reduction."""
    n = a.size
    a2 = a.reshape(-1, a.shape[-1])
    b2 = b.reshape(-1, b.shape[-1])
    return _sumsq_diff_pallas(a2, b2) / n


def _mse_fwd(a, b):
    return mse_pallas(a, b), (a, b)


def _mse_bwd(res, g):
    a, b = res
    n = a.size
    d = (a.astype(jnp.float32) - b.astype(jnp.float32)) * (2.0 * g / n)
    return d.astype(a.dtype), (-d).astype(b.dtype)


mse_pallas.defvjp(_mse_fwd, _mse_bwd)
