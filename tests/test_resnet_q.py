"""Int8 ResNet-50 classifier (models/resnet_q.py) + the int8 eval pipeline.

The classifier is frozen in every reference-parity surface (eval() —
reference train_cnn.py:158, inference.py:62) and forward-only in the
quantitative eval (inference.py:153-166), so its convs can ride the int8
MXU with BN folded in. These tests pin:

- BN folding is exact in f32 (conv+BN == folded conv+bias);
- int8 logits stay within rounding distance of the real-dtype forward;
- the quantized eval pipeline end-to-end agrees with the real one when
  the decision is not borderline.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.models.resnet import (
    classifier_apply,
    init_classifier_params,
)
from artist_style_transfer_tpu.models.resnet_q import (
    _fold_bn,
    classifier_apply_int8,
    quantize_classifier,
)
from artist_style_transfer_tpu.ops.conv import conv2d
from artist_style_transfer_tpu.ops.norm import batch_norm_inference
from artist_style_transfer_tpu.ops.precision import set_precision


@pytest.fixture(autouse=True)
def _fast_precision():
    set_precision("default")
    yield
    set_precision("highest")


def test_bn_fold_exact():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)), jnp.float32)
    bn = {
        "gamma": jnp.asarray(rng.standard_normal(16), jnp.float32),
        "beta": jnp.asarray(rng.standard_normal(16), jnp.float32),
        "mean": jnp.asarray(rng.standard_normal(16), jnp.float32),
        "var": jnp.asarray(rng.random(16) + 0.5, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((2, 10, 10, 8)), jnp.float32)
    ref = batch_norm_inference(
        conv2d(x, w, stride=1, padding=1), bn["gamma"], bn["beta"], bn["mean"], bn["var"]
    )
    wf, bf = _fold_bn(w, bn)
    got = conv2d(x, wf, stride=1, padding=1) + bf
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_int8_logits_close_and_argmax_agrees():
    rng = np.random.default_rng(0)
    params = init_classifier_params(jax.random.key(0))
    qp = quantize_classifier(params)
    x = jnp.asarray(rng.standard_normal((4, 96, 96, 3)), jnp.float32)
    lr = np.asarray(classifier_apply(params, x), np.float32)
    lq = np.asarray(classifier_apply_int8(qp, x), np.float32)
    assert lr.shape == lq.shape == (4, 19)
    # quantization rounding stays well below the logit spread
    assert np.abs(lr - lq).max() < 0.1 * lr.std(), (np.abs(lr - lq).max(), lr.std())
    assert (lr.argmax(-1) == lq.argmax(-1)).all()


@pytest.mark.slow
def test_int8_features_close():
    rng = np.random.default_rng(1)
    params = init_classifier_params(jax.random.key(3))
    qp = quantize_classifier(params)
    x = jnp.asarray(rng.standard_normal((2, 96, 96, 3)), jnp.float32)
    fr = np.asarray(classifier_apply(params, x, return_features=True), np.float32)
    fq = np.asarray(classifier_apply_int8(qp, x, return_features=True), np.float32)
    assert fr.shape == fq.shape == (2, 512)
    denom = max(float(np.abs(fr).max()), 1e-6)
    assert np.abs(fr - fq).max() / denom < 0.05


def test_frozen_int8_strided_dgrad_exact():
    """conv2d_frozen_int8 stride-2 backward == exact float dgrad of the
    dequantized conv with the requantized cotangent (the STE contract,
    strided case — needed by the ResNet bottleneck/downsample convs)."""
    from artist_style_transfer_tpu.ops.qconv import (
        absmax_scale,
        conv2d_frozen_int8,
        quant_weight,
    )

    rng = np.random.default_rng(3)
    for k, stride, pad, hw in ((3, 2, 1, 9), (1, 2, 0, 9), (3, 2, 1, 8)):
        x = jnp.asarray(rng.normal(size=(2, hw, hw, 4)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, 4, 8)).astype(np.float32) * 0.3)
        b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        wq, sw = quant_weight(w)
        o = (hw + 2 * pad - k) // stride + 1
        dy_grid = rng.integers(-127, 128, size=(2, o, o, 8)).astype(np.float32)
        seed = jnp.asarray(dy_grid) / sw  # dy*sw lands on the int grid

        dx = jax.grad(
            lambda x: jnp.sum(conv2d_frozen_int8(x, wq, sw, b, pad, stride) * seed)
        )(x)

        # The op folds sw into the cotangent BEFORE quantizing (dyp = dy*sw,
        # here the exact int grid), so the dgrad contraction uses the bare
        # int8 weights: oracle = float dgrad of conv(x, wq) with the
        # requantized dyp as cotangent.
        s_dy = absmax_scale(jnp.asarray(dy_grid))
        dyq = jnp.round(jnp.asarray(dy_grid) / s_dy) * s_dy
        _, pull = jax.vjp(
            lambda x: conv2d(x, wq.astype(jnp.float32), stride=stride, padding=pad), x
        )
        (ref_dx,) = pull(dyq)
        # the int32 path is exact; the float oracle conv carries f32
        # accumulation-order noise at these magnitudes
        np.testing.assert_allclose(
            np.asarray(dx), np.asarray(ref_dx), rtol=1e-4, atol=1e-3
        )


@pytest.mark.slow
def test_classifier_mode_int8_loss_tracks_real_trajectory():
    """'classifier'-mode training with the quantized classifier (int8 fwd +
    STE data gradient through the frozen ResNet-50) must track the
    real-dtype trajectory closely — same contract as the quantized VGG
    loss path."""
    from artist_style_transfer_tpu.models.transformer import init_transformer_params
    from artist_style_transfer_tpu.models.vgg import init_vgg16_params
    from artist_style_transfer_tpu.train.loop import (
        epoch_permutation,
        make_optimizer,
        make_step_fns,
        precompute_content_relu2_2,
    )
    from artist_style_transfer_tpu.train.styles import build_style_targets

    rng = np.random.default_rng(4)
    n, hw = 4, 32
    content = jnp.asarray(rng.random((n, hw, hw, 3), np.float32) * 255)
    paintings = (rng.random((2, hw, hw, 3)) * 255).astype(np.float32)
    params = init_transformer_params(jax.random.key(0))
    vgg = init_vgg16_params(jax.random.key(1))
    clf = init_classifier_params(jax.random.key(2))
    targets = build_style_targets(
        "classifier", vgg, "X", paintings=paintings, batch_size=2, artist_index=3
    )
    r22 = precompute_content_relu2_2(vgg, content)

    def run(clf_params):
        tx = make_optimizer(1e-3, 1e-4, 2, 2, 2)
        fns = make_step_fns(
            "classifier", vgg, clf_params, targets,
            content_weight=17.0, style_weight=25.0,
            batch_size=2, num_content=n, tx=tx, use_pallas=False,
        )
        p = jax.tree.map(jnp.copy, params)
        opt_state = tx.init(p)
        perm = epoch_permutation(0, 0, n)
        _, _, losses = fns.epoch_fn(
            p, opt_state, content, r22, targets.grams, targets.labels,
            perm, jnp.int32(0),
        )
        return np.asarray(losses)

    losses_real = run(clf)
    losses_q = run(quantize_classifier(clf))
    assert np.all(np.isfinite(losses_q))
    # content loss identical (VGG path untouched); style CE within
    # quantization rounding of the real one
    np.testing.assert_allclose(losses_q[:, 0], losses_real[:, 0], rtol=1e-5)
    np.testing.assert_allclose(losses_q[:, 1], losses_real[:, 1], rtol=0.05, atol=0.05)


@pytest.mark.slow
def test_classifier_mode_bf16_compute_runs():
    """Regression: classifier-mode training under compute_dtype='bfloat16'
    used to crash (the frozen classifier's weights were never cast to the
    compute dtype, unlike the VGG's) — found measuring the int8 classifier
    loss path on chip. One bf16 epoch must run and stay finite, with both
    the real and the quantized classifier."""
    from artist_style_transfer_tpu.models.transformer import init_transformer_params
    from artist_style_transfer_tpu.models.vgg import init_vgg16_params
    from artist_style_transfer_tpu.train.loop import (
        epoch_permutation,
        make_optimizer,
        make_step_fns,
        precompute_content_relu2_2,
    )
    from artist_style_transfer_tpu.train.styles import build_style_targets

    rng = np.random.default_rng(5)
    n, hw = 2, 32
    content = jnp.asarray(rng.random((n, hw, hw, 3), np.float32) * 255)
    paintings = (rng.random((2, hw, hw, 3)) * 255).astype(np.float32)
    params = init_transformer_params(jax.random.key(0))
    vgg = init_vgg16_params(jax.random.key(1))
    clf = init_classifier_params(jax.random.key(2))
    targets = build_style_targets(
        "classifier", vgg, "X", paintings=paintings, batch_size=2, artist_index=1
    )
    r22 = precompute_content_relu2_2(vgg, content)
    for clf_params in (clf, quantize_classifier(clf)):
        tx = make_optimizer(1e-3, 1e-4, 2, 2, 1)
        fns = make_step_fns(
            "classifier", vgg, clf_params, targets,
            content_weight=17.0, style_weight=25.0,
            batch_size=2, num_content=n, tx=tx,
            compute_dtype="bfloat16", use_pallas=False,
        )
        p = jax.tree.map(jnp.copy, params)
        _, _, losses = fns.epoch_fn(
            p, tx.init(p), content, r22.astype(jnp.bfloat16), targets.grams,
            targets.labels, epoch_permutation(0, 0, n), jnp.int32(0),
        )
        assert np.all(np.isfinite(np.asarray(losses)))


@pytest.mark.slow
def test_quantized_eval_pipeline_matches_real():
    """evaluate_with_classifier(quantize=True) on a decisive classifier
    (one class's logit boosted far above rounding noise) must produce the
    same accuracy as the real-dtype pipeline."""
    from artist_style_transfer_tpu.infer.evaluate import evaluate_with_classifier
    from artist_style_transfer_tpu.models.transformer import init_transformer_params

    rng = np.random.default_rng(2)
    tr = init_transformer_params(jax.random.key(0))
    clf = init_classifier_params(jax.random.key(1))
    # Make class 7 decisively win: big fc2 bias beats quantization noise.
    clf["head"]["fc2"]["b"] = clf["head"]["fc2"]["b"].at[7].add(100.0)
    images = (rng.random((4, 260, 260, 3)) * 255).astype(np.float32)
    acc_q = evaluate_with_classifier(
        tr, clf, images, artist_index=7, batch_size=4, wordy=False, quantize=True
    )
    acc_r = evaluate_with_classifier(
        tr, clf, images, artist_index=7, batch_size=4, wordy=False
    )
    assert acc_q == acc_r == 100.0
