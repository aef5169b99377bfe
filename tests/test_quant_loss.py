"""Int8-MXU frozen-VGG training-loss path (ops/qconv.py, quantize_vgg16_loss).

The reference trains against a frozen float VGG (train_cnn.py:50-78); the
int8 loss path is a TPU-native throughput mode, so the tests here pin its
*contract*: the op is exactly its dequantized composition, the STE backward
is analytically correct, the quantized extractor's features stay close to
f32, and a training run through it tracks the bf16 trajectory.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.models.transformer import init_transformer_params
from artist_style_transfer_tpu.models.vgg import (
    init_vgg16_params,
    quantize_vgg16_loss,
    vgg16_features,
    vgg_is_quantized,
)
from artist_style_transfer_tpu.ops.precision import precision
from artist_style_transfer_tpu.ops.qconv import (
    absmax_scale,
    conv2d_frozen_int8,
    quant_i8,
    quant_weight,
)

_DN = ("NHWC", "HWIO", "NHWC")


def _ref_conv(x, w, b, pad):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)), dimension_numbers=_DN
    )
    return y if b is None else y + b


def test_int8_fwd_matches_dequantized_composition():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 8)).astype(np.float32) * 3)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    wq, sw = quant_weight(w)

    y = conv2d_frozen_int8(x, wq, sw, b, 1)
    s_in = absmax_scale(x)
    ref = _ref_conv(
        quant_i8(x, s_in).astype(jnp.float32) * s_in,
        wq.astype(jnp.float32) * sw,
        b,
        1,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_int8_ste_gradient_analytic():
    """dy constructed exactly on the quant grid -> dx must equal the analytic
    STE gradient (an int8 conv of dy*sw with the flipped/transposed weights)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    wq, sw = quant_weight(w)

    dy_grid = rng.integers(-127, 128, size=(1, 6, 6, 8)).astype(np.float32)
    seed = jnp.asarray(dy_grid) / sw  # dy such that dy*sw lies on the grid

    dx, dsw, db = jax.grad(
        lambda x, sw_, b_: jnp.sum(conv2d_frozen_int8(x, wq, sw_, b_, 1) * seed),
        argnums=(0, 1, 2),
    )(x, sw, b)

    dyp = jnp.asarray(dy_grid)
    s_dy = absmax_scale(dyp)
    w_t = jnp.transpose(wq.astype(jnp.float32)[::-1, ::-1], (0, 1, 3, 2))
    ref_dx = _ref_conv(jnp.round(dyp / s_dy) * s_dy, w_t, None, 1)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_dx), rtol=1e-5, atol=1e-4)
    # Frozen layer: weight-scale and bias cotangents are zero.
    assert float(jnp.max(jnp.abs(dsw))) == 0.0
    assert float(jnp.max(jnp.abs(db))) == 0.0


@pytest.mark.slow
@pytest.mark.parametrize("layers", ["deep", "all"])
def test_quantized_vgg_features_close_to_f32(layers):
    rng = np.random.default_rng(2)
    vgg = init_vgg16_params(jax.random.key(0))
    qvgg = quantize_vgg16_loss(vgg, layers=layers, dtype=jnp.float32)
    assert vgg_is_quantized(qvgg) and not vgg_is_quantized(vgg)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32) * 40)

    with precision("default"):
        f = vgg16_features(vgg, x)
        q = vgg16_features(qvgg, x)
        for k in f:
            rel = float(
                jnp.linalg.norm((f[k] - q[k]).ravel())
                / (jnp.linalg.norm(f[k].ravel()) + 1e-9)
            )
            assert rel < 0.06, (k, rel)
        # Gradients flow and are finite through every tap.
        g = jax.grad(
            lambda im: sum(jnp.sum(v**2) for v in vgg16_features(qvgg, im).values())
        )(x)
        assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.slow
def test_train_quantize_loss_tracks_bf16_trajectory():
    from artist_style_transfer_tpu.train.api import train

    rng = np.random.default_rng(3)
    content = (rng.random((8, 32, 32, 3)) * 255).astype(np.float32)
    paintings = (rng.random((3, 32, 32, 3)) * 255).astype(np.float32)
    vgg = init_vgg16_params(jax.random.key(1))
    common = dict(
        style_method="cycle", artist="T", num_epochs=3, batch_size=4,
        content_data_size=8, seed=2, num_steps=2, save_every=0, model_dir="",
        train_size=32, content_images=content, paintings=paintings,
        vgg_params=vgg, wordy=False, compute_dtype="bfloat16",
    )
    with precision("default"):
        _, l_bf = train(**common)
        _, l_q = train(**common, quantize_loss=True)
    assert np.all(l_q[:, 2] > 0) and np.isfinite(l_q).all()
    # Same objective through a slightly-perturbed extractor: the total-loss
    # trajectory must track the bf16 one closely and keep decreasing.
    assert l_q[-1, 2] < l_q[0, 2]
    rel = np.abs(l_q[:, 2] - l_bf[:, 2]) / l_bf[:, 2]
    assert rel.max() < 0.15, rel


@pytest.mark.slow
def test_quantize_loss_dp_trajectory_matches_single_device():
    """Dynamic per-tensor scales are GLOBAL reductions under GSPMD, so the
    DP-sharded quantized step must reproduce the single-device trajectory."""
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

    rng = np.random.default_rng(4)
    N, B, H = 16, 8, 32
    content = jnp.asarray((rng.random((N, H, H, 3)) * 255).astype(np.float32))
    paintings = (rng.random((2, H, H, 3)) * 255).astype(np.float32)
    params0 = init_transformer_params(jax.random.key(0))
    vgg = quantize_vgg16_loss(
        init_vgg16_params(jax.random.key(1)), layers="all", dtype=jnp.float32
    )
    targets = build_style_targets("cycle", vgg, "X", paintings=paintings, batch_size=B)

    def run(mesh):
        params = jax.tree.map(jnp.copy, params0)
        tx = make_optimizer(1e-3, 1e-4, 4, 2, N // B)
        fns = make_step_fns(
            "cycle", vgg, None, targets,
            content_weight=17.0, style_weight=25.0, batch_size=B,
            num_content=N, tx=tx, mesh=mesh, use_pallas=False,
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
    # Looser than the bf16 DP test's 1e-4: round() turns ulp-level
    # reduction-order differences between the sharded and unsharded conv
    # programs into full quantum flips (measured max rel diff 1.1e-4 from
    # a single flipped int8 quantum).
    np.testing.assert_allclose(l8, l1, rtol=1e-3)


def test_gram_int8_fwd_matches_dequantized_composition():
    """gram_matrix_int8 == gram of the dequantized int8 features, exactly."""
    from artist_style_transfer_tpu.ops.gram import gram_matrix_int8, gram_matrix_xla

    rng = np.random.default_rng(6)
    f = jnp.asarray(rng.normal(size=(3, 4, 5, 16)).astype(np.float32) * 7)
    s_f = absmax_scale(f)
    fhat = quant_i8(f, s_f).astype(jnp.float32) * s_f

    g = gram_matrix_int8(f)
    with precision("highest"):
        ref = gram_matrix_xla(fhat)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_gram_int8_ste_gradient_analytic():
    """Cotangent chosen so sym lands on the quant grid -> dF must equal the
    analytic STE gradient (Fq s_f) @ sym exactly."""
    from artist_style_transfer_tpu.ops.gram import gram_matrix_int8

    rng = np.random.default_rng(7)
    n, h, w, c = 2, 3, 4, 8
    f = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    # Symmetric integer-grid cotangent: sym = 2*dg/(c*h*w) is on the grid
    # when dg is symmetric with integer entries times (c*h*w)/2.
    m = rng.integers(-40, 41, size=(n, c, c)).astype(np.float32)
    dg = jnp.asarray((m + np.swapaxes(m, 1, 2)) * (c * h * w) / 2.0)

    _, pull = jax.vjp(gram_matrix_int8, f)
    (df,) = pull(dg)

    s_f = absmax_scale(f)
    fhat = quant_i8(f, s_f).astype(jnp.float32) * s_f
    sym = np.asarray((dg + jnp.swapaxes(dg, 1, 2)) / (c * h * w), np.float32)
    s_sym = absmax_scale(jnp.asarray(sym))
    sym_hat = quant_i8(jnp.asarray(sym), s_sym).astype(jnp.float32) * s_sym
    ref = jnp.einsum("nhwc,ncd->nhwd", fhat, sym_hat)
    np.testing.assert_allclose(np.asarray(df), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_style_loss_gram_quantize_gate():
    """quantize=True routes only C>=256 taps through the int8 gram; the loss
    stays within rounding distance of the exact one."""
    from artist_style_transfer_tpu.ops.losses import style_loss_gram
    from artist_style_transfer_tpu.models.vgg import VGG_LAYER_NAMES

    rng = np.random.default_rng(8)
    sizes = {"relu1_2": (16, 64), "relu2_2": (8, 128),
             "relu3_3": (4, 256), "relu4_3": (2, 512)}
    feats = {
        k: jnp.asarray(rng.normal(size=(2, s, s, ch)).astype(np.float32))
        for k, (s, ch) in sizes.items()
    }
    targets = {
        k: jnp.asarray(rng.normal(size=(ch, ch)).astype(np.float32) * 1e-3)
        for k, (s, ch) in sizes.items()
    }
    assert set(sizes) == set(VGG_LAYER_NAMES)
    with precision("highest"):
        exact = float(style_loss_gram(feats, targets, use_pallas=False))
        quant = float(
            style_loss_gram(feats, targets, use_pallas=False, quantize=True)
        )
    assert quant != exact  # the int8 path actually dispatched
    assert abs(quant - exact) / exact < 2e-2, (quant, exact)


def test_quantize_loss_fold_gate():
    """'deep' quantization keeps the folded (bf16) shallow blocks -> fold OK;
    'all' quantizes the folded region itself -> fold refused."""
    from artist_style_transfer_tpu.train.loop import make_optimizer, make_step_fns
    from artist_style_transfer_tpu.train.styles import build_style_targets

    rng = np.random.default_rng(5)
    paintings = (rng.random((2, 32, 32, 3)) * 255).astype(np.float32)
    tx = make_optimizer(1e-3, 1e-4, 2, 2, 1)
    vgg_deep = quantize_vgg16_loss(
        init_vgg16_params(jax.random.key(1)), layers="deep", dtype=jnp.float32
    )
    targets = build_style_targets(
        "cycle", vgg_deep, "X", paintings=paintings, batch_size=4
    )
    # deep + fold: supported (round 3) — the folded shallow blocks stay bf16
    make_step_fns(
        "cycle", vgg_deep, None, targets,
        content_weight=17.0, style_weight=25.0, batch_size=4,
        num_content=4, tx=tx, fold_batch="vgg",
    )
    vgg_all = quantize_vgg16_loss(
        init_vgg16_params(jax.random.key(1)), layers="all", dtype=jnp.float32
    )
    targets_all = build_style_targets(
        "cycle", vgg_all, "X", paintings=paintings, batch_size=4
    )
    for fold in (True, "vgg"):
        with pytest.raises(NotImplementedError):
            make_step_fns(
                "cycle", vgg_all, None, targets_all,
                content_weight=17.0, style_weight=25.0, batch_size=4,
                num_content=4, tx=tx, fold_batch=fold,
            )
