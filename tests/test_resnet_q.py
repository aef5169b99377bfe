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
