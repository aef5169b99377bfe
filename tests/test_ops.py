"""Unit tests for core ops: image transforms, padding, norms, gram."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.ops import (
    affine_rescale,
    bgr_to_rgb,
    center_crop,
    gram_matrix,
    instance_norm,
    reflect_pad_hw,
    resize_bilinear,
    torchvision_normalize,
    vgg_caffe_preprocess,
)
from artist_style_transfer_tpu.ops.gram import gram_matrix_xla


def test_bgr_rgb_involution():
    x = jnp.arange(2 * 3 * 4 * 3, dtype=jnp.float32).reshape(2, 3, 4, 3)
    np.testing.assert_array_equal(bgr_to_rgb(bgr_to_rgb(x)), x)
    np.testing.assert_array_equal(bgr_to_rgb(x)[..., 0], x[..., 2])


def test_vgg_caffe_preprocess():
    x = jnp.ones((1, 2, 2, 3), jnp.float32) * 200.0
    y = vgg_caffe_preprocess(x)
    np.testing.assert_allclose(
        np.asarray(y[0, 0, 0]), [200 - 103.939, 200 - 116.779, 200 - 123.68], rtol=1e-6
    )


def test_torchvision_normalize():
    x = jnp.full((1, 2, 2, 3), 0.5, jnp.float32)
    y = torchvision_normalize(x)
    expect = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(np.asarray(y[0, 0, 0]), expect, rtol=1e-5)


def test_reflect_pad_matches_numpy():
    x = jnp.arange(1 * 4 * 5 * 2, dtype=jnp.float32).reshape(1, 4, 5, 2)
    y = reflect_pad_hw(x, 2)
    expect = np.pad(np.asarray(x), ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    np.testing.assert_array_equal(np.asarray(y), expect)
    assert reflect_pad_hw(x, 0) is x


def test_instance_norm_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 9, 5)).astype(np.float32)
    gamma = rng.standard_normal(5).astype(np.float32)
    beta = rng.standard_normal(5).astype(np.float32)

    ours = instance_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta))

    tin = torch.nn.InstanceNorm2d(5, affine=True)
    with torch.no_grad():
        tin.weight.copy_(torch.from_numpy(gamma))
        tin.bias.copy_(torch.from_numpy(beta))
    theirs = tin(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()

    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_instance_norm_act_matches_composition():
    """Fused IN(+ReLU) custom VJP == instance_norm -> relu composition,
    values and all gradients (mask recomputed from residuals in bwd)."""
    from artist_style_transfer_tpu.ops.norm import instance_norm_act
    from artist_style_transfer_tpu.ops.precision import precision

    rng = np.random.default_rng(3)
    with precision("default"):
        for (h, w, c), relu in [((8, 8, 32), True), ((6, 10, 128), True), ((8, 8, 64), False)]:
            x = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
            gamma = jnp.asarray(rng.standard_normal(c).astype(np.float32))
            beta = jnp.asarray(rng.standard_normal(c).astype(np.float32))
            co = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))

            def ref(x, g, b):
                y = instance_norm(x, g, b)
                return jnp.sum((jnp.maximum(y, 0) if relu else y) * co)

            def fused(x, g, b):
                return jnp.sum(instance_norm_act(x, g, b, relu) * co)

            v0, g0 = jax.value_and_grad(ref, argnums=(0, 1, 2))(x, gamma, beta)
            v1, g1 = jax.value_and_grad(fused, argnums=(0, 1, 2))(x, gamma, beta)
            np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
            for a, b in zip(g1, g0):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_gram_matches_reference_formula():
    """gram(f) = f f^T / (C*H*W) computed on NCHW, as in train_cnn.py:103-107."""
    rng = np.random.default_rng(1)
    x_nhwc = rng.standard_normal((3, 6, 7, 4)).astype(np.float32)
    g = gram_matrix_xla(jnp.asarray(x_nhwc))

    f = np.transpose(x_nhwc, (0, 3, 1, 2)).reshape(3, 4, -1)  # NCHW flat
    expect = np.einsum("ncx,ndx->ncd", f, f) / (4 * 6 * 7)
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-4, atol=1e-5)

    # dispatcher on CPU falls back to XLA
    np.testing.assert_allclose(np.asarray(gram_matrix(jnp.asarray(x_nhwc))), expect, rtol=1e-4, atol=1e-5)


def test_gram_pallas_interpret_matches_xla():
    """Pallas kernel (interpreter mode on CPU) == XLA contraction."""
    from jax.experimental.pallas import tpu as pltpu
    from artist_style_transfer_tpu.ops.pallas.gram_kernel import gram_matrix_pallas

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 128)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        g_pallas = gram_matrix_pallas(x)
    g_xla = gram_matrix_xla(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-5, atol=1e-6)


def test_conv2d_reflect_matches_padded_conv():
    """Border-band reflect conv == materialized reflect-pad conv, all shapes."""
    from artist_style_transfer_tpu.ops.conv import conv2d, conv2d_reflect

    rng = np.random.default_rng(7)
    for (h, w, k, s, cin, cout) in [
        (32, 40, 9, 1, 3, 8), (32, 40, 3, 2, 8, 16), (17, 23, 9, 1, 3, 4),
        (8, 8, 9, 1, 3, 4), (33, 47, 3, 2, 4, 4), (31, 31, 5, 3, 2, 2),
    ]:
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
        wt = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32)) * 0.1
        b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
        ref = conv2d(reflect_pad_hw(x, k // 2), wt, b, stride=s, padding=0)
        got = conv2d_reflect(x, wt, b, stride=s)
        assert got.shape == ref.shape, (h, w, k, s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_conv2d_reflect_cinfactored_matches_direct():
    """Widen-factored tiny-C_in conv == direct reflect conv, values + wgrads."""
    from artist_style_transfer_tpu.ops.conv import conv2d, conv2d_reflect_cinfactored

    rng = np.random.default_rng(16)
    for (h, w, k, cin, cout) in [(24, 28, 9, 3, 32), (17, 23, 3, 2, 8), (9, 11, 9, 3, 4)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
        wt = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32)) * 0.1
        b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))

        y_ref = conv2d(reflect_pad_hw(x, k // 2), wt, b, stride=1, padding=0)
        y_fac = conv2d_reflect_cinfactored(x, wt, b)
        np.testing.assert_allclose(np.asarray(y_fac), np.asarray(y_ref), rtol=1e-4, atol=1e-4)

        co = jnp.asarray(rng.standard_normal(y_ref.shape).astype(np.float32))
        gw_ref, gb_ref = jax.grad(
            lambda w_, b_: jnp.sum(conv2d(reflect_pad_hw(x, k // 2), w_, b_, stride=1, padding=0) * co),
            argnums=(0, 1),
        )(wt, b)
        gw_fac, gb_fac = jax.grad(
            lambda w_, b_: jnp.sum(conv2d_reflect_cinfactored(x, w_, b_) * co), argnums=(0, 1)
        )(wt, b)
        sc = float(np.abs(np.asarray(gw_ref)).max()) + 1.0
        np.testing.assert_allclose(np.asarray(gw_fac), np.asarray(gw_ref), rtol=1e-3, atol=1e-4 * sc)
        np.testing.assert_allclose(np.asarray(gb_fac), np.asarray(gb_ref), rtol=1e-3, atol=1e-4 * sc)


def test_conv2d_frozen_smallcin_dgrad_matches_autodiff():
    """Frozen-layer conv: fwd identical, input grad == autodiff, w/b grads zero."""
    from artist_style_transfer_tpu.ops.conv import conv2d, conv2d_frozen_smallcin

    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((2, 12, 14, 3)).astype(np.float32))
    wt = jnp.asarray(rng.standard_normal((3, 3, 3, 16)).astype(np.float32)) * 0.2
    b = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))
    co = jnp.asarray(rng.standard_normal((2, 12, 14, 16)).astype(np.float32))

    y_ref = conv2d(x, wt, b, stride=1, padding=1)
    y_frz = conv2d_frozen_smallcin(x, wt, b, 1)
    np.testing.assert_allclose(np.asarray(y_frz), np.asarray(y_ref), rtol=1e-5, atol=1e-5)

    gx_ref = jax.grad(lambda x_: jnp.sum(conv2d(x_, wt, b, stride=1, padding=1) * co))(x)
    gx_frz, gw_frz = jax.grad(
        lambda x_, w_: jnp.sum(conv2d_frozen_smallcin(x_, w_, b, 1) * co), argnums=(0, 1)
    )(x, wt)
    np.testing.assert_allclose(np.asarray(gx_frz), np.asarray(gx_ref), rtol=1e-4, atol=1e-4)
    assert float(np.abs(np.asarray(gw_frz)).max()) == 0.0  # frozen: zero cotangent


def test_relu_fast_matches_autodiff():
    """Bool-mask relu VJP == autodiff relu, including gradient 0 at x == 0."""
    from artist_style_transfer_tpu.ops.conv import relu_fast

    x = jnp.asarray(np.array([-2.0, -0.0, 0.0, 0.5, 3.0], np.float32))
    co = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32))
    np.testing.assert_array_equal(np.asarray(relu_fast(x)), np.asarray(jax.nn.relu(x)))
    g_ref = jax.grad(lambda x_: jnp.sum(jax.nn.relu(x_) * co))(x)
    g_fast = jax.grad(lambda x_: jnp.sum(relu_fast(x_) * co))(x)
    np.testing.assert_array_equal(np.asarray(g_fast), np.asarray(g_ref))


def test_max_pool2d_2x2_fast_matches_autodiff():
    """Equality-mask pool backward == select-and-scatter on tie-free input."""
    from artist_style_transfer_tpu.ops.conv import max_pool2d, max_pool2d_2x2_fast

    rng = np.random.default_rng(15)
    # distinct values -> no ties -> both backward rules must agree exactly
    x = jnp.asarray(rng.permutation(8 * 6 * 2 * 5).reshape(2, 8, 6, 5).astype(np.float32))
    co = jnp.asarray(rng.standard_normal((2, 4, 3, 5)).astype(np.float32))

    y_ref = max_pool2d(x, 2, 2)
    y_fast = max_pool2d_2x2_fast(x)
    np.testing.assert_array_equal(np.asarray(y_fast), np.asarray(y_ref))

    g_ref = jax.grad(lambda x_: jnp.sum(max_pool2d(x_, 2, 2) * co))(x)
    g_fast = jax.grad(lambda x_: jnp.sum(max_pool2d_2x2_fast(x_) * co))(x)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), atol=1e-6)


def test_relu_max_pool2x2_fast_matches_composition():
    """Fused relu+pool (uint8 argmax-code backward) == relu -> maxpool
    composition for values and gradients, with cotangents on BOTH outputs
    (the tap and the pooled map), on tie-free input."""
    from artist_style_transfer_tpu.ops.conv import max_pool2d, relu_max_pool2x2_fast

    rng = np.random.default_rng(16)
    # distinct magnitudes, mixed signs -> exercises the relu mask and the
    # max<=0 (code 4) windows without relying on tie behavior
    base = rng.permutation(2 * 8 * 6 * 5).reshape(2, 8, 6, 5).astype(np.float32) + 1
    signs = rng.choice([-1.0, 1.0], size=base.shape)
    x = jnp.asarray(base * signs)
    co_tap = jnp.asarray(rng.standard_normal((2, 8, 6, 5)).astype(np.float32))
    co_pool = jnp.asarray(rng.standard_normal((2, 4, 3, 5)).astype(np.float32))

    def ref(x_):
        y = jax.nn.relu(x_)
        return jnp.sum(y * co_tap) + jnp.sum(max_pool2d(y, 2, 2) * co_pool)

    def fused(x_):
        tap, pooled = relu_max_pool2x2_fast(x_)
        return jnp.sum(tap * co_tap) + jnp.sum(pooled * co_pool)

    v_ref, g_ref = jax.value_and_grad(ref)(x)
    v_fast, g_fast = jax.value_and_grad(fused)(x)
    np.testing.assert_allclose(float(v_fast), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), atol=1e-6)


def test_relu_max_pool2x2_fast_tie_routes_first():
    """Positive ties route the pooled gradient to the FIRST max position
    (torch maxpool semantics), unlike the equality-mask pool."""
    from artist_style_transfer_tpu.ops.conv import relu_max_pool2x2_fast

    x = jnp.asarray(np.array([[5.0, 5.0], [5.0, 5.0]], np.float32)).reshape(1, 2, 2, 1)
    g = jax.grad(lambda x_: jnp.sum(relu_max_pool2x2_fast(x_)[1]))(x)
    np.testing.assert_array_equal(
        np.asarray(g).reshape(2, 2), np.array([[1.0, 0.0], [0.0, 0.0]], np.float32)
    )


def test_instance_norm_custom_vjp_matches_autodiff():
    """Hand-derived IN backward == autodiff of the same forward."""
    from artist_style_transfer_tpu.ops.norm import _in_forward, instance_norm

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((3, 8, 10, 6)).astype(np.float32)) * 4 + 1
    gamma = jnp.asarray(rng.standard_normal(6).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(6).astype(np.float32))
    co = jnp.asarray(rng.standard_normal((3, 8, 10, 6)).astype(np.float32))

    def loss_custom(x, g, b):
        return jnp.sum(instance_norm(x, g, b) * co)

    def loss_auto(x, g, b):
        return jnp.sum(_in_forward(x, g, b, 1e-5)[0] * co)

    g_c = jax.grad(loss_custom, argnums=(0, 1, 2))(x, gamma, beta)
    g_a = jax.grad(loss_auto, argnums=(0, 1, 2))(x, gamma, beta)
    for a, r in zip(g_c, g_a):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-4)


def test_conv2d_reflect_dxfactored_matches_direct():
    """dy/dx-factored tiny-C_out conv == direct reflect conv, values + grads."""
    from artist_style_transfer_tpu.ops.conv import conv2d, conv2d_reflect_dxfactored

    rng = np.random.default_rng(11)
    for (h, w, k, cin, cout) in [(24, 28, 9, 32, 3), (17, 23, 3, 8, 2), (9, 9, 9, 4, 3)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
        wt = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32)) * 0.1
        b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))

        def loss_ref(x, w, b):
            y = conv2d(reflect_pad_hw(x, k // 2), w, b, stride=1, padding=0)
            return jnp.sum(jnp.square(y)), y

        def loss_fac(x, w, b):
            y = conv2d_reflect_dxfactored(x, w, b)
            return jnp.sum(jnp.square(y)), y

        (l_r, y_r), g_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2), has_aux=True)(x, wt, b)
        (l_f, y_f), g_f = jax.value_and_grad(loss_fac, argnums=(0, 1, 2), has_aux=True)(x, wt, b)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r), rtol=1e-4, atol=1e-4)
        for a, r in zip(g_f, g_r):
            r = np.asarray(r)
            # f32 re-association noise; tolerance scaled to the grad magnitude.
            np.testing.assert_allclose(
                np.asarray(a), r, rtol=1e-3, atol=1e-4 * (np.abs(r).max() + 1.0)
            )


def test_transformer_fast_precision_matches_highest():
    """Fast-mode dispatch (factored output conv) stays close to parity mode."""
    from artist_style_transfer_tpu.models.transformer import (
        init_transformer_params,
        transformer_apply,
    )
    from artist_style_transfer_tpu.ops.precision import precision

    rng = np.random.default_rng(12)
    params = init_transformer_params(jax.random.key(0))
    x = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))
    with precision("highest"):
        y_hi = transformer_apply(params, x)
    with precision("default"):
        y_def = transformer_apply(params, x)
    # CPU 'default' is still f32 math; only the factored dispatch differs.
    scale = float(np.abs(np.asarray(y_hi)).max())
    assert float(np.abs(np.asarray(y_def) - np.asarray(y_hi)).max()) < 2e-2 * scale


def test_conv2d_reflect_gradients_match():
    from artist_style_transfer_tpu.ops.conv import conv2d, conv2d_reflect

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 16, 20, 3)).astype(np.float32))
    wt = jnp.asarray(rng.standard_normal((3, 3, 3, 4)).astype(np.float32)) * 0.1

    def loss_ref(x, w):
        return jnp.sum(jnp.square(conv2d(reflect_pad_hw(x, 1), w, stride=1, padding=0)))

    def loss_fast(x, w):
        return jnp.sum(jnp.square(conv2d_reflect(x, w, stride=1)))

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wt)
    gx_f, gw_f = jax.grad(loss_fast, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), rtol=1e-4, atol=1e-5)


def test_resize_bilinear_matches_cv2():
    import cv2

    rng = np.random.default_rng(3)
    img = (rng.random((37, 53, 3)) * 255).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), 24, 31))
    theirs = cv2.resize(img, (31, 24), interpolation=cv2.INTER_LINEAR)
    # cv2 uses fixed-point taps; allow ~1 LSB of 255-scale difference
    assert np.abs(ours - theirs).max() < 1.0


def test_affine_rescale_matches_cv2_warp():
    """Golden test vs the reference rescale() semantics (dataset.py:36-52)."""
    import cv2

    rng = np.random.default_rng(4)
    img = (rng.random((48, 80, 3)) * 255).astype(np.float32)
    th, tw = 32, 56

    # Reference forward affine (dataset.py:44-50)
    h_s, w_s = th / 48, tw / 80
    M = np.array(
        [[w_s, 0, tw / 2 - w_s * 80 / 2], [0, h_s, th / 2 - h_s * 48 / 2]], dtype=np.float64
    )
    theirs = cv2.warpAffine(img, M, (tw, th))
    ours = np.asarray(affine_rescale(jnp.asarray(img), th, tw))
    assert np.abs(ours - theirs).max() < 1.0


def test_affine_rescale_upscale_zero_pads():
    import cv2

    img = np.full((10, 10, 3), 100.0, np.float32)
    th, tw = 20, 40  # anisotropic upscale
    h_s, w_s = th / 10, tw / 10
    M = np.array([[w_s, 0, 0.0], [0, h_s, 0.0]], dtype=np.float64)
    theirs = cv2.warpAffine(img, M, (tw, th))
    ours = np.asarray(affine_rescale(jnp.asarray(img), th, tw))
    assert np.abs(ours - theirs).max() < 1.0


def test_center_crop():
    x = jnp.arange(10 * 12, dtype=jnp.float32).reshape(1, 10, 12, 1)
    y = center_crop(x, 4)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(y[0, :, :, 0]), np.asarray(x[0, 3:7, 4:8, 0]))

    # pad-then-crop path (torchvision pads when input smaller than crop)
    small = jnp.ones((1, 2, 2, 1), jnp.float32)
    z = center_crop(small, 4)
    assert z.shape == (1, 4, 4, 1)
    assert float(jnp.sum(z)) == 4.0


def test_set_precision_invalidates_jit_caches():
    """The precision policy is baked into jitted graphs at trace time;
    set_precision must drop stale traces so an already-jitted function
    retraces under the new policy (ops.precision.set_precision)."""
    from artist_style_transfer_tpu.ops.conv import conv2d
    from artist_style_transfer_tpu.ops.precision import precision, set_precision

    rng = np.random.default_rng(0)
    x = jnp.asarray(1.0 + rng.random((1, 8, 8, 64), np.float32) * 1e-3)
    w = jnp.asarray(1.0 + rng.random((3, 3, 64, 64), np.float32) * 1e-3)

    @jax.jit
    def f(x, w):
        return conv2d(x, w, None, stride=1, padding=1)

    with precision("highest"):
        np.asarray(f(x, w))  # trace + cache under 'highest'
        set_precision("default")
        stale_check = np.asarray(f(x, w))  # must retrace under 'default'

        @jax.jit
        def fresh(x, w):
            return conv2d(x, w, None, stride=1, padding=1)

        expect = np.asarray(fresh(x, w))
    np.testing.assert_array_equal(stale_check, expect)


@pytest.mark.parametrize("k,stride", [(3, 1), (3, 2), (9, 1), (9, 2)])
def test_conv2d_wreflect_hzero_matches_composed_pads(k, stride):
    """conv2d_wreflect_hzero (folded-batch path: reflect W / zero H) must
    equal reflect-pad-W + zero-pad-H + VALID conv for all band layouts."""
    from artist_style_transfer_tpu.ops.conv import conv2d, conv2d_wreflect_hzero
    from artist_style_transfer_tpu.ops.pad import reflect_pad_w

    rng = np.random.default_rng(k * 10 + stride)
    pad = k // 2
    for h, w in [(20, 16), (17, 21), (24, 12)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, 5)).astype(np.float32))
        wt = jnp.asarray(rng.standard_normal((k, k, 5, 4)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))
        oracle = conv2d(
            jnp.pad(reflect_pad_w(x, pad), ((0, 0), (pad, pad), (0, 0), (0, 0))),
            wt, b, stride=stride, padding=0,
        )
        got = conv2d_wreflect_hzero(x, wt, b, stride=stride)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(oracle), rtol=1e-5, atol=1e-5
        )
