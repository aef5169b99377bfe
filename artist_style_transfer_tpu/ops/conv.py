"""NHWC conv / transpose-conv primitives with exact torch-semantics parity.

These wrap ``lax.conv_general_dilated`` with the dimension numbers and
padding arithmetic needed to reproduce ``nn.Conv2d`` / ``nn.ConvTranspose2d``
bit-for-bit (up to dtype), which is the parity linchpin for importing
reference-trained checkpoints (SURVEY §7 hard parts a, b).

Weight layout is HWIO (TPU-native). Importers convert torch's OIHW
(Conv2d) and IOHW (ConvTranspose2d) layouts; see
:mod:`artist_style_transfer_tpu.utils.torch_import`.
"""

from __future__ import annotations

import functools as _functools

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.ops.precision import get_precision

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jax.Array,
    w_hwio: jax.Array,
    b: jax.Array | None = None,
    stride: int = 1,
    padding: int | str = 0,
    precision: str | None = None,
) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC, matching ``nn.Conv2d``.

    ``padding`` is symmetric zero padding in pixels (the TransformerNet does
    its own reflection padding outside, reference cnn.py:63 uses pad=0;
    VGG/ResNet convs use pad=k//2). ``precision`` defaults to the global
    policy (see :mod:`artist_style_transfer_tpu.ops.precision`).
    """
    if isinstance(padding, int):
        pad = ((padding, padding), (padding, padding))
    else:
        pad = padding
    y = jax.lax.conv_general_dilated(
        x,
        w_hwio,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=_DN,
        # f32 accumulation output only for f32 inputs: a widened output dtype
        # breaks conv's transpose rule under autodiff (f32 cotangent vs bf16
        # operands); bf16 convs still accumulate in f32 inside the MXU.
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else x.dtype,
        precision=precision or get_precision(),
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def conv_transpose2d(
    x: jax.Array,
    w_hwio_flipped: jax.Array,
    b: jax.Array | None = None,
    stride: int = 2,
    padding: int = 1,
    output_padding: int = 1,
    precision: str | None = None,
) -> jax.Array:
    """2-D transposed convolution matching ``nn.ConvTranspose2d`` exactly.

    Implemented as a regular convolution over the input dilated by ``stride``
    with asymmetric padding ``(k-1-p, k-1-p+output_padding)`` per spatial dim
    — the textbook gradient-of-conv formulation, giving output size
    ``(H-1)*s - 2p + k + op`` (reference cnn.py:108: k3 s2 p1 op1 = exact x2
    upsample; k1 s1 p0 op0 = 1x1 conv).

    ``w_hwio_flipped`` must already be spatially flipped and transposed to
    HWIO from torch's (I, O, kH, kW); the importer does this once at load.
    """
    k = w_hwio_flipped.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    y = jax.lax.conv_general_dilated(
        x,
        w_hwio_flipped,
        window_strides=(1, 1),
        padding=((lo, hi), (lo, hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else x.dtype,
        precision=precision or get_precision(),
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def conv2d_reflect(
    x: jax.Array,
    w_hwio: jax.Array,
    b: jax.Array | None = None,
    stride: int = 1,
    precision: str | None = None,
) -> jax.Array:
    """Convolution over a reflect-padded input, without materializing the pad.

    Numerically identical to ``conv2d(reflect_pad_hw(x, k//2), w, b, stride)``
    (reference ConvLayer semantics, cnn.py:55-63), but the interior comes
    from a native zero-padded conv — padding is folded into the conv op, so
    the (N,H,W,C)-sized padded copy the reflect pad would materialize (a
    pure HBM read+write of the whole activation) never exists. Only the
    k//2-wide boundary bands, where zero- and reflect-padding differ, are
    recomputed on thin reflect-padded slices and pasted over.

    Falls back to the materialized pad for images too small to have an
    interior.
    """
    k = w_hwio.shape[0]
    pad = k // 2
    if pad == 0:
        return conv2d(x, w_hwio, b, stride=stride, padding=0, precision=precision)

    h, w = x.shape[1], x.shape[2]
    h_out = (h + 2 * pad - k) // stride + 1
    w_out = (w + 2 * pad - k) // stride + 1
    # Band widths: outputs whose window crosses the low/high boundary.
    n_top = n_left = -(-pad // stride)
    n_bot = h_out - ((h - k + pad) // stride + 1)
    n_right = w_out - ((w - k + pad) // stride + 1)
    if (
        h_out < n_top + n_bot + 1
        or w_out < n_left + n_right + 1
        or h <= pad
        or w <= pad
    ):
        from artist_style_transfer_tpu.ops.pad import reflect_pad_hw

        return conv2d(reflect_pad_hw(x, pad), w_hwio, b, stride=stride, padding=0,
                      precision=precision)

    y = conv2d(x, w_hwio, b, stride=stride, padding=pad, precision=precision)

    def reflect_lo(arr, axis):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(pad, 0, -1)
        return jnp.concatenate([arr[tuple(idx)], arr], axis=axis)

    def reflect_hi(arr, axis):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(-2, -2 - pad, -1)
        return jnp.concatenate([arr, arr[tuple(idx)]], axis=axis)

    def valid_conv(src, wpad=0):
        out = jax.lax.conv_general_dilated(
            src, w_hwio, (stride, stride), ((0, 0), (wpad, wpad)),
            dimension_numbers=_DN,
            preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else x.dtype,
            precision=precision or get_precision(),
        ).astype(x.dtype)
        return out + b if b is not None else out

    def wreflect(src):
        return reflect_hi(reflect_lo(src, 2), 2)

    # Top/bottom bands: full width, reflect in both dims (corners exact).
    if n_top:
        rows = (n_top - 1) * stride + k - pad  # input rows below the boundary
        y = y.at[:, :n_top].set(valid_conv(wreflect(reflect_lo(x[:, :rows], 1))))
    if n_bot:
        start = (h_out - n_bot) * stride - pad
        y = y.at[:, h_out - n_bot :].set(
            valid_conv(wreflect(reflect_hi(x[:, start:], 1)))
        )

    # Left/right bands for the remaining interior rows: reflect along W only.
    r0_out, r1_out = n_top, h_out - n_bot
    r0 = r0_out * stride - pad
    r1 = (r1_out - 1) * stride - pad + k
    mid = x[:, r0:r1]
    if n_left:
        cols = (n_left - 1) * stride + k - pad
        band = valid_conv(reflect_lo(mid[:, :, :cols], 2))
        y = y.at[:, r0_out:r1_out, :n_left].set(band)
    if n_right:
        start = (w_out - n_right) * stride - pad
        band = valid_conv(reflect_hi(mid[:, :, start:], 2))
        y = y.at[:, r0_out:r1_out, w_out - n_right :].set(band)
    return y


@_functools.lru_cache(maxsize=None)
def _dx_selector(k: int, cout: int, dtype_name: str):
    """Fixed 1xK selector kernel for :func:`conv2d_reflect_dxfactored`.

    sel[0, dx, dx*cout + co, co] = 1 — contracting it over the packed
    (dx, co) channel axis sums each output channel's K horizontal taps.
    """
    import numpy as np

    sel = np.zeros((1, k, k * cout, cout), np.float32)
    for dx in range(k):
        for co in range(cout):
            sel[0, dx, dx * cout + co, co] = 1.0
    # Cast in numpy (ml_dtypes covers bf16): an in-trace jnp cast would cache
    # a tracer here and leak it into later traces.
    return np.ascontiguousarray(sel.astype(jnp.dtype(dtype_name)))


def conv2d_reflect_dxfactored(
    x: jax.Array,
    w_hwio: jax.Array,
    b: jax.Array | None = None,
    precision: str | None = None,
) -> jax.Array:
    """Reflect-pad + stride-1 KxK conv, reparameterized for tiny C_out.

    Mathematically identical to ``conv2d(reflect_pad_hw(x, k//2), w, b)``
    (same multiplies, re-associated), but expressed as a Kx1 conv mapping
    C_in -> K*C_out channels (the horizontal tap dx packed into the output
    channel) followed by a fixed 1xK 0/1 selector conv that sums the taps.

    Why: the TransformerNet's 9x9 output conv has C_out=3 (cnn.py:39),
    which drives 125/128 of the MXU output lanes idle in the forward pass
    AND gives the weight-gradient matmul a 3-wide contraction operand — XLA
    profiling showed that one wgrad fusion alone at 12.1 ms of a 149 ms
    train step. The factored form gives every pass K*C_out(=27)-wide
    channels; measured fwd+bwd 12.9 ms vs 27.2 ms direct (b96, 224x224,
    bf16). Summation order differs from the direct conv, so results match
    only to dtype rounding (~7e-3 rel in bf16) — dispatch this under fast
    precision only; parity mode keeps the direct conv.
    """
    k, cin, cout = w_hwio.shape[0], w_hwio.shape[2], w_hwio.shape[3]
    pad = k // 2
    from artist_style_transfer_tpu.ops.pad import reflect_pad_hw

    wp = jnp.transpose(w_hwio, (0, 2, 1, 3)).reshape(k, 1, cin, k * cout)
    hp = reflect_pad_hw(x, pad)
    p = conv2d(hp, wp, None, stride=1, padding=0, precision=precision)
    sel = _dx_selector(k, cout, x.dtype.name)
    return conv2d(p, sel, b, stride=1, padding=0, precision=precision)


@_functools.lru_cache(maxsize=None)
def _ci_selector(k: int, cin: int, dtype_name: str):
    """Fixed 1xK 'widen' kernel: selw[0, dx, ci, dx*cin + ci] = 1.

    A pure data-movement conv that packs the K horizontal taps of each of
    the cin input channels into K*cin output channels (a strip-wise im2col
    along W).
    """
    import numpy as np

    selw = np.zeros((1, k, cin, k * cin), np.float32)
    for dx in range(k):
        for ci in range(cin):
            selw[0, dx, ci, dx * cin + ci] = 1.0
    return np.ascontiguousarray(selw.astype(jnp.dtype(dtype_name)))


def conv2d_reflect_cinfactored(
    x: jax.Array,
    w_hwio: jax.Array,
    b: jax.Array | None = None,
    precision: str | None = None,
) -> jax.Array:
    """Reflect-pad + stride-1 KxK conv, reparameterized for tiny C_in.

    The dual of :func:`conv2d_reflect_dxfactored`: first a fixed 1xK 0/1
    'widen' conv packs (dx, ci) into K*C_in channels (pure data movement —
    im2col along W), then a Kx1 conv with the real weights (plain reshape:
    the (dx, ci) axes of HWIO weights are already contiguous) finishes the
    contraction with a K*C_in(=27)-channel operand instead of C_in=3.

    Why: the TransformerNet stem (9x9, 3->32, cnn.py:15) feeds its
    weight-gradient matmul a 3-channel patch operand — measured 10.0 ms
    fwd+wgrad at b96/224 direct vs 5.2 ms factored; forward-only also wins
    (2.5 -> 1.5 ms train, 10.4 -> 9.2 ms at b128/512 stylize). Exact
    reassociation — bf16 rounding only (~4e-3 rel); fast-precision dispatch.
    """
    k, cin, cout = w_hwio.shape[0], w_hwio.shape[2], w_hwio.shape[3]
    pad = k // 2
    from artist_style_transfer_tpu.ops.pad import reflect_pad_hw

    selw = _ci_selector(k, cin, x.dtype.name)
    hp = reflect_pad_hw(x, pad)
    p = conv2d(hp, selw, None, stride=1, padding=0, precision=precision)
    wp = w_hwio.reshape(k, 1, k * cin, cout)
    return conv2d(p, wp, b, stride=1, padding=0, precision=precision)


def conv2d_wreflect_hzero(
    x: jax.Array,
    w_hwio: jax.Array,
    b: jax.Array | None = None,
    stride: int = 1,
    precision: str | None = None,
) -> jax.Array:
    """Conv with reflect padding along W but plain ZERO padding along H.

    For the folded-batch transformer path (models.transformer): images are
    stacked along H with separator rows that already encode each image's H
    padding (reflect fix-up rows, or zeros for transpose convs), so the H
    axis wants ordinary SAME zero padding — only the W borders still need
    reflect semantics. Interior comes from one zero-padded conv; the
    k//2-wide W bands are recomputed on thin W-reflected slices and pasted
    over (same scheme as :func:`conv2d_reflect`).
    """
    k = w_hwio.shape[0]
    pad = k // 2
    if pad == 0:
        return conv2d(x, w_hwio, b, stride=stride, padding=0, precision=precision)

    w = x.shape[2]
    w_out = (w + 2 * pad - k) // stride + 1
    n_left = -(-pad // stride)
    n_right = w_out - ((w - k + pad) // stride + 1)

    y = conv2d(x, w_hwio, b, stride=stride, padding=pad, precision=precision)

    def valid_w_conv(src):
        out = jax.lax.conv_general_dilated(
            src, w_hwio, (stride, stride), ((pad, pad), (0, 0)),
            dimension_numbers=_DN,
            preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else x.dtype,
            precision=precision or get_precision(),
        ).astype(x.dtype)
        return out + b if b is not None else out

    if n_left:
        cols = (n_left - 1) * stride + k - pad
        src = x[:, :, :cols]
        band = valid_w_conv(jnp.concatenate([src[:, :, pad:0:-1], src], axis=2))
        y = y.at[:, :, :n_left].set(band)
    if n_right:
        start = (w_out - n_right) * stride - pad
        src = x[:, :, start:]
        band = valid_w_conv(jnp.concatenate([src, src[:, :, -2 : -2 - pad : -1]], axis=2))
        y = y.at[:, :, w_out - n_right :].set(band)
    return y


def _conv2d_small_cout_zeropad(
    x: jax.Array,
    w_hwio: jax.Array,
    pad: int,
    precision: str | None = None,
) -> jax.Array:
    """Zero-padded stride-1 conv via the dx-factored form (tiny C_out)."""
    k, cin, cout = w_hwio.shape[0], w_hwio.shape[2], w_hwio.shape[3]
    wp = jnp.transpose(w_hwio, (0, 2, 1, 3)).reshape(k, 1, cin, k * cout)
    hp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    p = conv2d(hp, wp, None, stride=1, padding=0, precision=precision)
    sel = _dx_selector(k, cout, x.dtype.name)
    return conv2d(p, sel, None, stride=1, padding=0, precision=precision)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv2d_frozen_smallcin(x, w_hwio, b, padding: int = 1):
    """``conv2d`` for a FROZEN first conv layer with tiny C_in (stride 1).

    Forward is exactly ``conv2d(x, w, b, stride=1, padding=padding)``. The
    VJP differs in two ways, both for the hot perceptual-loss path where
    gradients flow through a frozen feature extractor back into the
    generated image (reference train_cnn.py:60-61 freezes VGG):

    - the weight/bias cotangents are **zero** (the layer is frozen — do not
      use this op if the conv's own weights are being trained), saving the
      pathological (3-channel-operand) weight-gradient matmul;
    - the input gradient — a transposed conv with C_out = C_in = 3, which
      idles 125/128 MXU output lanes — is computed in the dx-factored form
      (see :func:`conv2d_reflect_dxfactored`).
    """
    return conv2d(x, w_hwio, b, stride=1, padding=padding)


def _conv2d_frozen_fwd(x, w_hwio, b, padding):
    return conv2d(x, w_hwio, b, stride=1, padding=padding), (x, w_hwio, b)


def _conv2d_frozen_bwd(padding, res, dy):
    x, w_hwio, b = res
    k = w_hwio.shape[0]
    # dx = conv(zero_pad(dy, k-1-p), flip_hw(w)^T) — the standard conv
    # data-gradient, factored for its tiny output-channel count.
    w_t = jnp.transpose(w_hwio[::-1, ::-1], (0, 1, 3, 2))
    dx = _conv2d_small_cout_zeropad(dy, w_t, k - 1 - padding)
    return (
        dx.astype(x.dtype),
        jnp.zeros_like(w_hwio),
        None if b is None else jnp.zeros_like(b),
    )


conv2d_frozen_smallcin.defvjp(_conv2d_frozen_fwd, _conv2d_frozen_bwd)


def linear(
    x: jax.Array,
    w_io: jax.Array,
    b: jax.Array | None = None,
    precision: str | None = None,
) -> jax.Array:
    """Dense layer (N, I) @ (I, O) + b with the global precision policy.

    A bare ``@`` would use XLA DEFAULT precision (bf16 multiplier passes);
    this is the policy-respecting equivalent of ``nn.Linear``.
    """
    y = jnp.matmul(x, w_io, precision=precision or get_precision())
    return y + b if b is not None else y


def max_pool2d(x: jax.Array, window: int = 2, stride: int = 2, padding: int = 0) -> jax.Array:
    """Max pooling, NHWC, matching ``nn.MaxPool2d(window, stride, padding)``."""
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )


@jax.custom_vjp
def relu_fast(x: jax.Array) -> jax.Array:
    """ReLU with a 1-byte bool mask residual (fast-precision path).

    Autodiff's relu saves the full activation (bf16: 2 bytes/elem) to
    rebuild the gradient mask; at VGG's 224x224x64 layers that residual is
    a 616 MB HBM round trip per relu at b128. Saving ``x > 0`` as bool
    halves it. Gradient at exactly 0 is 0, matching torch.
    """
    return jnp.maximum(x, 0)


def _relu_fast_fwd(x):
    return jnp.maximum(x, 0), x > 0


def _relu_fast_bwd(mask, dy):
    return (jnp.where(mask, dy, jnp.zeros_like(dy)),)


relu_fast.defvjp(_relu_fast_fwd, _relu_fast_bwd)


@jax.custom_vjp
def max_pool2d_2x2_fast(x: jax.Array) -> jax.Array:
    """2x2/2 max pool with an equality-mask backward (fast-precision path).

    Forward is identical to ``max_pool2d(x, 2, 2, 0)``. The backward avoids
    XLA's ``select-and-scatter`` (measured 2.8 ms at [96,224,224,64]) with a
    fully-fusable elementwise compare: dx = (x == y_broadcast) * dy_broadcast.

    Divergence from torch: ties receive the gradient at EVERY tied position
    (torch routes to the first). In the VGG conv->relu->pool stacks this is
    immaterial — all-zero windows (the common tie) have their gradient
    killed by the preceding ReLU's mask, and positive bf16 ties are rare —
    but parity mode must keep ``max_pool2d`` + autodiff. Requires even H, W.
    """
    return max_pool2d(x, 2, 2, 0)


def _mp22_fwd(x):
    y = max_pool2d(x, 2, 2, 0)
    return y, (x, y)


def _mp22_bwd(res, dy):
    x, y = res
    n, h, w, c = x.shape
    xb = x.reshape(n, h // 2, 2, w // 2, 2, c)
    mask = (xb == y[:, :, None, :, None, :]).astype(dy.dtype)
    dx = mask * dy[:, :, None, :, None, :]
    return (dx.reshape(x.shape),)


max_pool2d_2x2_fast.defvjp(_mp22_fwd, _mp22_bwd)


@jax.custom_vjp
def relu_max_pool2x2_fast(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Fused ``(relu(x), maxpool2x2(relu(x)))`` with a uint8-code backward.

    Built for VGG's tapped pool layers (conv -> relu -> *tap for the gram
    loss* -> pool, reference train_cnn.py:70-78): both the tap and the
    pooled activation receive cotangents, and the backward reconstructs
    the pre-activation gradient from

    - the relu's 1-byte bool mask (full resolution, needed for the tap's
      own cotangent), and
    - a quarter-resolution uint8 *code* per window: the argmax position
      0..3 (first occurrence, torch semantics) or 4 when the window max
      is <= 0 (relu kills the pooled gradient entirely).

    Compared with ``relu_fast`` + ``max_pool2d_2x2_fast``, the backward no
    longer re-reads the full-resolution activation and the pooled output
    to rebuild the routing mask (2.25 bytes/elem of HBM traffic saved at
    VGG's 224^2x64 / 112^2x128 / 56^2x256 pool layers). Divergence from
    the equality-mask pool: positive ties route to the FIRST max (torch's
    behavior) instead of all tied positions. Requires even H, W.
    """
    y = jnp.maximum(x, 0)
    return y, max_pool2d(y, 2, 2, 0)


def _window_argmax_code(y: jax.Array):
    """(pooled max, uint8 code) over 2x2/2 windows; code 4 = max <= 0."""
    n, h, w, c = y.shape
    yb = y.reshape(n, h // 2, 2, w // 2, 2, c)
    y00, y01 = yb[:, :, 0, :, 0, :], yb[:, :, 0, :, 1, :]
    y10, y11 = yb[:, :, 1, :, 0, :], yb[:, :, 1, :, 1, :]
    m0 = jnp.maximum(y00, y01)
    i0 = (y01 > y00).astype(jnp.uint8)  # 0 or 1; ties keep the first
    m1 = jnp.maximum(y10, y11)
    i1 = jnp.where(y11 > y10, jnp.uint8(3), jnp.uint8(2))
    pooled = jnp.maximum(m0, m1)
    code = jnp.where(m1 > m0, i1, i0)
    code = jnp.where(pooled > 0, code, jnp.uint8(4))
    return pooled, code


def _relu_mp22_fwd(x):
    y = jnp.maximum(x, 0)
    pooled, code = _window_argmax_code(y)
    return (y, pooled), (x > 0, code)


def _relu_mp22_bwd(res, cts):
    mask, code = res
    d_tap, d_pool = cts
    n, hp, wp, c = d_pool.shape
    # Scatter d_pool to each window's argmax position via 4 quarter-res
    # compares — no gather, fully fusable elementwise.
    pos = jnp.arange(4, dtype=jnp.uint8).reshape(1, 1, 2, 1, 2, 1)
    contrib = jnp.where(
        code[:, :, None, :, None, :] == pos,
        d_pool[:, :, None, :, None, :],
        jnp.zeros((), d_pool.dtype),
    ).reshape(n, hp * 2, wp * 2, c)
    dx = jnp.where(mask, d_tap + contrib, jnp.zeros((), d_tap.dtype))
    return (dx,)


relu_max_pool2x2_fast.defvjp(_relu_mp22_fwd, _relu_mp22_bwd)


def avg_pool_global(x: jax.Array) -> jax.Array:
    """Global average pool NHWC -> NC (AdaptiveAvgPool2d(1) + flatten)."""
    return jnp.mean(x, axis=(1, 2))


def max_pool_global(x: jax.Array) -> jax.Array:
    """Global max pool NHWC -> NC (AdaptiveMaxPool2d(1) + flatten)."""
    return jnp.max(x, axis=(1, 2))
