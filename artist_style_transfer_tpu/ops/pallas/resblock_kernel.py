"""Fused Pallas kernel: the TransformerNet's whole 5-residual-block trunk.

The trunk (5 x [reflect-conv3x3 -> IN -> ReLU -> reflect-conv3x3 -> IN] +
skip, 128 channels — reference cnn.py:25-31) is HBM-bound under XLA: every
conv/IN materializes a full feature map. Here the feature map stays in VMEM
for all five blocks — one HBM read of the input and one write of the output
per image. Convolutions run as 9 shifted (H*W, C) @ (C, C) MXU matmuls over
an in-VMEM reflect-padded copy; instance-norm statistics are plain VPU
reductions over the resident tile.

Status: correct (interpret-mode equivalence tested; on-chip max err 2.7e-3
relative at 'default' precision) but NOT dispatched. Measured on v5e at
56x56x128 bf16 b64 — the largest shape whose real Mosaic working set fits
VMEM — it runs at 5.5 ms vs 4.6 ms for the XLA trunk: the 9-shifted-matmul
conv formulation loses more to XLA's native conv lowering than the saved
HBM round trips gain at small tiles. Kept as the verified building block
for the round-2 target: spatially-tiled halo fusion of the encoder/decoder
at LARGE spatial extents, where the traffic saving is 10-30x bigger (see
BENCH_NOTES.md bottleneck analysis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_BLOCKS = 5
EPS = 1e-5


def _reflect_pad1_vmem(x):
    """(H, W, C) -> (H+2, W+2, C) reflect pad by 1, in VMEM."""
    top = x[1:2]
    bot = x[-2:-1]
    xp = jnp.concatenate([top, x, bot], axis=0)
    left = xp[:, 1:2]
    right = xp[:, -2:-1]
    return jnp.concatenate([left, xp, right], axis=1)


def _conv3x3_vmem(x, w, b, h, wdt, c):
    """Reflect-padded 3x3 conv on a VMEM-resident (H, W, C) tile.

    9 shifted matmuls on the MXU; accumulation in f32, result in the tile's
    dtype (keeping the resident working set small for bf16 runs).
    """
    xp = _reflect_pad1_vmem(x)
    acc = jnp.zeros((h * wdt, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = xp[dy : dy + h, dx : dx + wdt].reshape(h * wdt, c)
            acc += jax.lax.dot_general(
                tap,
                w[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return (acc + b.astype(jnp.float32)).reshape(h, wdt, c)


def _instnorm_vmem(y32, gamma, beta, out_dtype):
    """IN over the resident f32 (H, W, C) tile; output in the tile dtype."""
    mean = jnp.mean(y32, axis=(0, 1), keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), axis=(0, 1), keepdims=True)
    z = (y32 - mean) * jax.lax.rsqrt(var + EPS)
    return (z * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(out_dtype)


def _trunk_kernel(x_ref, w1, b1, g1, be1, w2, b2, g2, be2, out_ref, *, h, wdt, c):
    dt = x_ref.dtype
    x = x_ref[0]
    for i in range(NUM_BLOCKS):
        hh = _conv3x3_vmem(x, w1[i], b1[i], h, wdt, c)
        hh = jax.nn.relu(_instnorm_vmem(hh, g1[i], be1[i], dt))
        hh = _conv3x3_vmem(hh, w2[i], b2[i], h, wdt, c)
        hh = _instnorm_vmem(hh, g2[i], be2[i], dt)
        x = x + hh
    out_ref[0] = x.astype(out_ref.dtype)


def _stack(params_list, key):
    return jnp.stack([p[key] for p in params_list])


@jax.jit
def trunk_pallas(residual_params: list, x: jax.Array) -> jax.Array:
    """Run all 5 residual blocks fused; x is NHWC (N, H, W, 128).

    ``residual_params`` is the transformer's ``params['residual']`` list.
    Raises NotImplementedError for shapes whose working set exceeds VMEM
    (dispatcher falls back to the XLA trunk).
    """
    n, h, wdt, c = x.shape
    if c % 128 != 0:
        raise NotImplementedError(f"C={c}")
    # Empirical VMEM budget: Mosaic double-buffers the in/out blocks and
    # keeps several padded/accumulator temporaries live, so real usage is
    # ~4-5x the naive tile size (a 96x96x128 bf16 tile compiles to a 29 MB
    # stack vs the 16 MB limit). Gate to what actually fits; larger images
    # need the spatially-tiled halo variant (round-2 work, see BENCH_NOTES).
    working = (h + 2) * (wdt + 2) * c * (2 * x.dtype.itemsize + 4) * 3
    if working > 14 * 1024 * 1024:
        raise NotImplementedError(f"tile {h}x{wdt}x{c} exceeds VMEM budget")

    w1 = _stack([p["conv1"] for p in residual_params], "w")
    b1 = _stack([p["conv1"] for p in residual_params], "b")
    g1 = _stack([p["conv1"] for p in residual_params], "gamma")
    be1 = _stack([p["conv1"] for p in residual_params], "beta")
    w2 = _stack([p["conv2"] for p in residual_params], "w")
    b2 = _stack([p["conv2"] for p in residual_params], "b")
    g2 = _stack([p["conv2"] for p in residual_params], "gamma")
    be2 = _stack([p["conv2"] for p in residual_params], "beta")

    kernel = functools.partial(_trunk_kernel, h=h, wdt=wdt, c=c)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            full(w1.shape), full(b1.shape), full(g1.shape), full(be1.shape),
            full(w2.shape), full(b2.shape), full(g2.shape), full(be2.shape),
        ],
        out_specs=pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * NUM_BLOCKS * 2 * 9 * h * wdt * c * c,
            bytes_accessed=2 * n * h * wdt * c * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w1, b1, g1, be1, w2, b2, g2, be2)
