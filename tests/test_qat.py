"""QAT int8 transformer training path (ops/qconv.conv2d_qat_int8).

Oracle: the straight-through-estimator forward written in plain JAX —
``conv(x + sg(dequant(quant(x)) - x), w + sg(dequant(quant(w)) - w)) + b``
— whose autodiff gradients are exactly the STE gradients the custom VJP
must produce. Forward and weight/bias gradients must match to float
tolerance; the data gradient additionally quantizes the cotangent, so it
is checked exactly under a quantization-transparent cotangent and
statistically under a random one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artist_style_transfer_tpu.ops.qconv import (
    absmax_scale,
    conv2d_qat_int8,
    quant_i8,
    quant_weight,
)

_DN = ("NHWC", "HWIO", "NHWC")


def _ste_oracle(x, w, b, stride, padding, lhs_d):
    """Dequantized-forward STE reference in plain JAX autodiff."""
    sg = jax.lax.stop_gradient
    s_x = absmax_scale(sg(x))
    xh = x + sg(quant_i8(x, s_x).astype(jnp.float32) * s_x - x)
    wq, sw = quant_weight(sg(w))
    wh = w + sg(wq.astype(jnp.float32) * sw - w)
    y = jax.lax.conv_general_dilated(
        xh, wh, (stride, stride), padding,
        lhs_dilation=(lhs_d, lhs_d) if lhs_d != 1 else None,
        dimension_numbers=_DN, precision="highest",
    )
    return y + b


CONFIGS = [
    # (k, stride, padding, lhs_dilation) — the transformer interior classes
    (3, 1, ((0, 0), (0, 0)), 1),   # residual conv (pre-padded by caller)
    (3, 2, ((0, 0), (0, 0)), 1),   # encoder downsample conv
    (1, 1, ((0, 0), (0, 0)), 1),   # 1x1 trunk conv
    (3, 1, ((1, 2), (1, 2)), 2),   # ConvTranspose2d k3 s2 p1 op1
    (1, 1, ((0, 0), (0, 0)), 1),   # ConvTranspose2d k1 (same as 1x1)
    (3, 1, ((1, 1), (1, 1)), 1),   # generic: zero-pad inside the op
]


@pytest.mark.parametrize("k,stride,padding,lhs_d", CONFIGS)
def test_qat_conv_forward_matches_ste_oracle(k, stride, padding, lhs_d):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 12, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, 8, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    y = conv2d_qat_int8(x, w, b, stride, padding, lhs_d)
    y_ref = _ste_oracle(x, w, b, stride, padding, lhs_d)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,stride,padding,lhs_d", CONFIGS)
def test_qat_conv_weight_bias_grads_exact(k, stride, padding, lhs_d):
    """dw/db are the EXACT STE gradients (no gradient quantization)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 10, 12, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, 8, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    r_shape = conv2d_qat_int8(x, w, b, stride, padding, lhs_d).shape
    r = jnp.asarray(rng.normal(size=r_shape).astype(np.float32))

    g = jax.grad(lambda xx, ww, bb: jnp.sum(conv2d_qat_int8(xx, ww, bb, stride, padding, lhs_d) * r),
                 argnums=(1, 2))(x, w, b)
    g_ref = jax.grad(lambda xx, ww, bb: jnp.sum(_ste_oracle(xx, ww, bb, stride, padding, lhs_d) * r),
                     argnums=(1, 2))(x, w, b)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_ref[0]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(g_ref[1]), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("k,stride,padding,lhs_d", CONFIGS)
def test_qat_conv_data_grad_exact_under_transparent_cotangent(k, stride, padding, lhs_d):
    """With a cotangent whose weight-scale-folded values are exactly int8-
    representable, the int8 data gradient must equal the STE oracle's dx
    bit-for-float: dyp = r*sw hits the quantizer losslessly."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 9, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, 4, 3)).astype(np.float32))
    b = jnp.zeros((3,), jnp.float32)
    _, sw = quant_weight(w)
    r_shape = conv2d_qat_int8(x, w, b, stride, padding, lhs_d).shape
    ints = rng.integers(-31, 32, size=r_shape).astype(np.float32)
    ints.flat[0] = 127.0  # pin the absmax so s_dy is exact
    c = 0.03125  # power of two
    r = jnp.asarray(ints) * c / sw  # dyp = r*sw = ints*c, quantizes exactly

    dx = jax.grad(lambda xx: jnp.sum(conv2d_qat_int8(xx, w, b, stride, padding, lhs_d) * r))(x)
    dx_ref = jax.grad(lambda xx: jnp.sum(_ste_oracle(xx, w, b, stride, padding, lhs_d) * r))(x)
    # "Exact" up to the f32 /sw * sw round-trip in the cotangent construction
    # (~1e-7/element, accumulating over the C_out contraction); a wrong
    # dgrad-padding formula shows up as O(1) errors.
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=1e-3, atol=1e-4)


def test_qat_conv_data_grad_close_under_random_cotangent():
    """Random cotangent: dx differs from the oracle only by the int8
    rounding of dy — bounded relative error."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 16)).astype(np.float32))
    b = jnp.zeros((16,), jnp.float32)
    r = jnp.asarray(rng.normal(size=(2, 12, 12, 16)).astype(np.float32))
    pad = ((1, 1), (1, 1))

    dx = jax.grad(lambda xx: jnp.sum(conv2d_qat_int8(xx, w, b, 1, pad, 1) * r))(x)
    dx_ref = jax.grad(lambda xx: jnp.sum(_ste_oracle(xx, w, b, 1, pad, 1) * r))(x)
    err = np.linalg.norm(np.asarray(dx - dx_ref)) / np.linalg.norm(np.asarray(dx_ref))
    assert err < 0.01, err


@pytest.mark.slow
@pytest.mark.parametrize("layers", ["trunk", "all"])
def test_transformer_qat_forward_close_and_trainable(layers):
    """QAT forward tracks the bf16 forward (IN re-centers each layer) and
    every weight/IN parameter receives a nonzero, finite gradient."""
    from artist_style_transfer_tpu.models.transformer import (
        init_transformer_params,
        transformer_apply,
    )
    from artist_style_transfer_tpu.models.transformer_qat import transformer_apply_qat
    from artist_style_transfer_tpu.ops.precision import precision

    params = init_transformer_params(jax.random.key(0))
    x = (np.random.default_rng(0).random((2, 32, 32, 3)) * 255).astype(np.float32)
    with precision("default"):
        y_q = np.asarray(transformer_apply_qat(params, jnp.asarray(x), layers), np.float32)
        y_f = np.asarray(transformer_apply(params, jnp.asarray(x)), np.float32)
    assert y_q.shape == y_f.shape == (2, 32, 32, 3)
    # Random-init outputs are near zero (|y| ~ 0.2 px on the 0-255 scale),
    # which inflates relative norms — bound the absolute pixel deviation
    # (measured ~0.1 px) plus a loose relative check.
    assert np.max(np.abs(y_q - y_f)) < 1.0, np.max(np.abs(y_q - y_f))
    rel = np.linalg.norm(y_q - y_f) / np.linalg.norm(y_f)
    assert rel < 0.15, rel

    with precision("default"):
        grads = jax.grad(
            lambda p: jnp.sum(jnp.square(transformer_apply_qat(p, jnp.asarray(x), layers)))
        )(params)
    leaves, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.all(np.isfinite(np.asarray(g, np.float32))) for g in leaves)
    # Conv weights and IN affines must all train; interior conv biases are
    # analytically zero-gradient through IN (true of the bf16 path too).
    for blk in [grads["encoder"][i] for i in range(4)] + [
        r[c] for r in grads["residual"] for c in ("conv1", "conv2")
    ] + [grads["decoder"][i] for i in range(3)]:
        assert float(jnp.max(jnp.abs(blk["w"]))) > 0
        assert float(jnp.max(jnp.abs(blk["gamma"]))) > 0
    assert float(jnp.max(jnp.abs(grads["output"]["w"]))) > 0


@pytest.mark.slow
def test_qat_train_trajectory_tracks_bf16():
    """Tiny 'cycle' run: QAT trajectory stays finite, decreasing, and close
    to the bf16 trajectory (the objective differs only by int8 rounding of
    the generated-image pathway)."""
    from artist_style_transfer_tpu.models.transformer import init_transformer_params
    from artist_style_transfer_tpu.models.vgg import init_vgg16_params
    from artist_style_transfer_tpu.ops.precision import precision
    from artist_style_transfer_tpu.train.loop import (
        epoch_permutation,
        make_optimizer,
        make_step_fns,
        precompute_content_relu2_2,
    )
    from artist_style_transfer_tpu.train.styles import build_style_targets

    rng = np.random.default_rng(0)
    n, hw, bs = 8, 32, 4
    content = jnp.asarray((rng.random((n, hw, hw, 3)) * 255).astype(np.float32))
    paintings = (rng.random((3, hw, hw, 3)) * 255).astype(np.float32)
    vgg_params = init_vgg16_params(jax.random.key(1))

    def run(qat):
        params = init_transformer_params(jax.random.key(0))
        targets = build_style_targets("cycle", vgg_params, "t", paintings=paintings,
                                      batch_size=bs)
        tx = make_optimizer(1e-3, 1e-4, 4, 2, n // bs)
        with precision("default"):
            fns = make_step_fns(
                "cycle", vgg_params, None, targets, content_weight=17.0,
                style_weight=25.0, batch_size=bs, num_content=n, tx=tx,
                compute_dtype="bfloat16", qat=qat,
            )
            r22 = precompute_content_relu2_2(vgg_params, content, dtype=jnp.bfloat16)
            params_s, opt_state = params, tx.init(params)
            totals = []
            for epoch in range(4):
                perm = epoch_permutation(0, epoch, n)
                params_s, opt_state, losses = fns.epoch_fn(
                    params_s, opt_state, content, r22, targets.grams, None, perm,
                    jnp.int32(epoch * fns.steps_per_epoch),
                )
                totals.append(float(jnp.sum(losses[:, 2])))
        return np.asarray(totals)

    t_q = run(True)
    t_b = run(False)
    assert np.all(np.isfinite(t_q))
    assert t_q[-1] < t_q[0]
    rel = np.abs(t_q - t_b) / t_b
    assert np.all(rel < 0.05), (t_q, t_b, rel)


@pytest.mark.slow
def test_qat_dp_trajectory_matches_single_device():
    """QAT's dynamic activation/gradient scales are GLOBAL reductions under
    GSPMD — the DP-sharded QAT step must reproduce the single-device
    trajectory (up to int8-quantum flips from reduction-order ulps)."""
    from artist_style_transfer_tpu.models.transformer import init_transformer_params
    from artist_style_transfer_tpu.models.vgg import init_vgg16_params
    from artist_style_transfer_tpu.parallel import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )
    from artist_style_transfer_tpu.train.loop import (
        epoch_permutation,
        make_optimizer,
        make_step_fns,
        precompute_content_relu2_2,
    )
    from artist_style_transfer_tpu.train.styles import build_style_targets

    rng = np.random.default_rng(5)
    N, B, H = 16, 8, 32
    content = jnp.asarray((rng.random((N, H, H, 3)) * 255).astype(np.float32))
    paintings = (rng.random((2, H, H, 3)) * 255).astype(np.float32)
    params0 = init_transformer_params(jax.random.key(0))
    vgg = init_vgg16_params(jax.random.key(1))
    targets = build_style_targets("cycle", vgg, "X", paintings=paintings, batch_size=B)

    def run(mesh):
        params = jax.tree.map(jnp.copy, params0)
        tx = make_optimizer(1e-3, 1e-4, 4, 2, N // B)
        fns = make_step_fns(
            "cycle", vgg, None, targets,
            content_weight=17.0, style_weight=25.0, batch_size=B,
            num_content=N, tx=tx, mesh=mesh, use_pallas=False, qat=True,
        )
        data = content
        if mesh is not None:
            data = jax.device_put(content, batch_sharding(mesh))
            params = jax.device_put(params, replicated_sharding(mesh))
        opt_state = tx.init(params)
        r22 = precompute_content_relu2_2(vgg, data)
        losses = []
        for epoch in range(2):
            perm = epoch_permutation(0, epoch, N)
            params, opt_state, l = fns.epoch_fn(
                params, opt_state, data, r22, targets.grams, None,
                perm, jnp.int32(epoch * (N // B)),
            )
            losses.append(np.asarray(l))
        return np.stack(losses)

    l1 = run(None)
    l8 = run(make_mesh(shape=(8,)))
    np.testing.assert_allclose(l8, l1, rtol=1e-3)


def test_qat_rejects_fold_batch():
    from artist_style_transfer_tpu.models.transformer import init_transformer_params
    from artist_style_transfer_tpu.models.vgg import init_vgg16_params
    from artist_style_transfer_tpu.train.loop import make_optimizer, make_step_fns
    from artist_style_transfer_tpu.train.styles import build_style_targets

    vgg = init_vgg16_params(jax.random.key(1))
    paintings = (np.random.default_rng(0).random((2, 32, 32, 3)) * 255).astype(np.float32)
    targets = build_style_targets("cycle", vgg, "X", paintings=paintings, batch_size=4)
    with pytest.raises(NotImplementedError):
        make_step_fns(
            "cycle", vgg, None, targets, content_weight=17.0, style_weight=25.0,
            batch_size=4, num_content=8, tx=make_optimizer(1e-3, 1e-4, 2, 2, 2),
            qat=True, fold_batch=True,
        )
