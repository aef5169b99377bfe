"""`diff_model` — a compact class-conditional UNet for epsilon prediction.

Functional param-pytree style, NHWC. Architecture: sinusoidal timestep
embedding + learned class embedding -> per-resolution residual blocks with
GroupNorm(32) and FiLM-style (scale, shift) conditioning, 2x down/upsampling,
and one self-attention block at the bottleneck — the standard guided-
diffusion shape scaled down (no reference source exists for C20; SURVEY §0).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.ops.conv import conv2d, linear
from artist_style_transfer_tpu.ops.precision import get_precision

# (channel multiplier per resolution); base width and blocks fixed for compactness
CHANNEL_MULTS = (1, 2, 4)
NUM_RES_BLOCKS = 2


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embeddings, transformer-style (guided diffusion convention)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def group_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array, groups: int = 32, eps: float = 1e-5):
    n, h, w, c = x.shape
    g = min(groups, c)
    xg = x.reshape(n, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(n, h, w, c) * gamma + beta


def _conv_p(key, k, cin, cout, scale=1.0):
    fan_in = cin * k * k
    bound = scale / (fan_in ** 0.5)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (k, k, cin, cout), jnp.float32, -bound, bound),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _lin_p(key, cin, cout, scale=1.0):
    bound = scale / (cin ** 0.5)
    return {
        "w": jax.random.uniform(key, (cin, cout), jnp.float32, -bound, bound),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _norm_p(c):
    return {"gamma": jnp.ones((c,), jnp.float32), "beta": jnp.zeros((c,), jnp.float32)}


def _resblock_p(key, cin, cout, emb_dim):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "norm1": _norm_p(cin),
        "conv1": _conv_p(k1, 3, cin, cout),
        "emb": _lin_p(k2, emb_dim, 2 * cout),  # FiLM scale+shift
        "norm2": _norm_p(cout),
        "conv2": _conv_p(k3, 3, cout, cout, scale=1e-4),  # near-zero init
    }
    if cin != cout:
        p["skip"] = _conv_p(k4, 1, cin, cout)
    return p


def _attn_p(key, c):
    k1, k2 = jax.random.split(key)
    return {
        "norm": _norm_p(c),
        "qkv": _conv_p(k1, 1, c, 3 * c),
        "proj": _conv_p(k2, 1, c, c, scale=1e-4),
    }


def init_diff_model(
    key: jax.Array,
    num_classes: int = 19,
    base_channels: int = 64,
    in_channels: int = 3,
) -> dict:
    keys = iter(jax.random.split(key, 128))
    emb_dim = base_channels * 4
    params: dict = {
        "time_mlp1": _lin_p(next(keys), base_channels, emb_dim),
        "time_mlp2": _lin_p(next(keys), emb_dim, emb_dim),
        "class_emb": jax.random.normal(next(keys), (num_classes, emb_dim)) * 0.02,
        "conv_in": _conv_p(next(keys), 3, in_channels, base_channels),
        "down": [],
        "mid1": None,
        "attn": None,
        "mid2": None,
        "up": [],
        "norm_out": _norm_p(base_channels),
        "conv_out": _conv_p(next(keys), 3, base_channels, in_channels, scale=1e-4),
    }
    chans = [base_channels * m for m in CHANNEL_MULTS]
    cin = base_channels
    skip_chans = [cin]
    for level, c in enumerate(chans):
        blocks = []
        for _ in range(NUM_RES_BLOCKS):
            blocks.append(_resblock_p(next(keys), cin, c, emb_dim))
            cin = c
            skip_chans.append(cin)
        down = {"blocks": blocks}
        if level < len(chans) - 1:
            down["downsample"] = _conv_p(next(keys), 3, cin, cin)
            skip_chans.append(cin)
        params["down"].append(down)
    params["mid1"] = _resblock_p(next(keys), cin, cin, emb_dim)
    params["attn"] = _attn_p(next(keys), cin)
    params["mid2"] = _resblock_p(next(keys), cin, cin, emb_dim)
    for level, c in reversed(list(enumerate(chans))):
        blocks = []
        for _ in range(NUM_RES_BLOCKS + 1):
            blocks.append(_resblock_p(next(keys), cin + skip_chans.pop(), c, emb_dim))
            cin = c
        up = {"blocks": blocks}
        if level > 0:
            up["upsample"] = _conv_p(next(keys), 3, cin, cin)
        params["up"].append(up)
    return params


def _resblock(p, x, emb):
    h = jax.nn.silu(group_norm(x, p["norm1"]["gamma"], p["norm1"]["beta"]))
    h = conv2d(h, p["conv1"]["w"], p["conv1"]["b"], 1, 1)
    scale, shift = jnp.split(linear(jax.nn.silu(emb), p["emb"]["w"], p["emb"]["b"]), 2, axis=-1)
    h = group_norm(h, p["norm2"]["gamma"], p["norm2"]["beta"])
    h = h * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
    h = conv2d(jax.nn.silu(h), p["conv2"]["w"], p["conv2"]["b"], 1, 1)
    if "skip" in p:
        x = conv2d(x, p["skip"]["w"], p["skip"]["b"], 1, 0)
    return x + h


def _attention(p, x):
    n, h, w, c = x.shape
    qkv = conv2d(
        group_norm(x, p["norm"]["gamma"], p["norm"]["beta"]), p["qkv"]["w"], p["qkv"]["b"], 1, 0
    )
    q, k, v = jnp.split(qkv.reshape(n, h * w, 3 * c), 3, axis=-1)
    attn = jax.nn.softmax(
        jnp.einsum("nqc,nkc->nqk", q, k, precision=get_precision()) / math.sqrt(c), axis=-1
    )
    out = jnp.einsum("nqk,nkc->nqc", attn, v, precision=get_precision()).reshape(n, h, w, c)
    return x + conv2d(out, p["proj"]["w"], p["proj"]["b"], 1, 0)


def diff_model_apply(params: dict, x: jax.Array, t: jax.Array, y: jax.Array) -> jax.Array:
    """Predict epsilon for x_t in [-1, 1] scale. t: (N,) int32, y: (N,) class ids."""
    if x.shape[1] % 4 or x.shape[2] % 4:
        # two stride-2 downsamples vs nearest-2x upsamples: an indivisible
        # extent desyncs the skip shapes deep inside jit — fail clearly.
        raise ValueError(
            f"diff_model_apply needs H, W divisible by 4, got {x.shape[1:3]}"
        )
    base = params["conv_in"]["w"].shape[-1]
    emb = timestep_embedding(t, base)
    emb = linear(jax.nn.silu(linear(emb, params["time_mlp1"]["w"], params["time_mlp1"]["b"])),
                 params["time_mlp2"]["w"], params["time_mlp2"]["b"])
    emb = emb + params["class_emb"][y]

    h = conv2d(x, params["conv_in"]["w"], params["conv_in"]["b"], 1, 1)
    skips = [h]
    for level, down in enumerate(params["down"]):
        for block in down["blocks"]:
            h = _resblock(block, h, emb)
            skips.append(h)
        if "downsample" in down:
            h = conv2d(h, down["downsample"]["w"], down["downsample"]["b"], 2, 1)
            skips.append(h)
    h = _resblock(params["mid1"], h, emb)
    h = _attention(params["attn"], h)
    h = _resblock(params["mid2"], h, emb)
    for level, up in enumerate(params["up"]):
        for block in up["blocks"]:
            h = _resblock(block, jnp.concatenate([h, skips.pop()], axis=-1), emb)
        if "upsample" in up:
            n, hh, ww, c = h.shape
            h = jax.image.resize(h, (n, hh * 2, ww * 2, c), "nearest")
            h = conv2d(h, up["upsample"]["w"], up["upsample"]["b"], 1, 1)
    h = jax.nn.silu(group_norm(h, params["norm_out"]["gamma"], params["norm_out"]["beta"]))
    return conv2d(h, params["conv_out"]["w"], params["conv_out"]["b"], 1, 1)
