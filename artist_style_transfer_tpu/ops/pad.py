"""Reflection padding for NHWC tensors (reference cnn.py:55-60)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reflect_pad_hw(x: jax.Array, pad: int) -> jax.Array:
    """Reflect-pad the H and W axes of an NHWC tensor by ``pad`` on each side.

    Matches ``nn.ReflectionPad2d(pad)`` (reference cnn.py:58): reflection
    without repeating the edge pixel. ``pad == 0`` is the identity
    (reference uses nn.Identity for 1x1 kernels, cnn.py:60).
    """
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def reflect_pad_w(x: jax.Array, pad: int) -> jax.Array:
    """Reflect-pad only the W axis (folded-batch path: H padding lives in
    the fold's separator rows, see models.transformer)."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
