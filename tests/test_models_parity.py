"""Numerical parity of the JAX models vs from-scratch torch oracles.

These are the SURVEY §4 golden tests: they validate both the model math and
the .pth importers (torch state dict -> pytree), which is what makes
reference-trained checkpoints loadable at >35 dB parity.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import jax

from artist_style_transfer_tpu.models import (
    TRANSFORMER_PARAM_COUNT,
    classifier_apply,
    init_transformer_params,
    transformer_apply,
    vgg16_features,
)
from artist_style_transfer_tpu.models.transformer import transformer_param_count
from artist_style_transfer_tpu.utils.torch_import import (
    classifier_params_from_torch,
    transformer_params_from_torch,
    transformer_params_to_torch,
    vgg16_params_from_torch,
)


def _sd_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def psnr(a, b, peak=255.0):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(peak * peak / mse) if mse > 0 else np.inf


def test_transformer_param_count():
    params = init_transformer_params(jax.random.key(0))
    assert transformer_param_count(params) == TRANSFORMER_PARAM_COUNT == 1_712_771


def test_transformer_output_shape_matches_input():
    params = init_transformer_params(jax.random.key(0))
    for h, w in [(64, 64), (32, 48)]:
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        assert transformer_apply(params, x).shape == (1, h, w, 3)


def test_transformer_fast_mode_matches_parity_mode():
    """The fast-precision dispatch set (factored stem/output convs,
    relu_fast, one-pass IN stats) computes the same function as parity
    mode — reassociation-level differences only (here in f32; the measured
    bf16 gap on chip is the PSNR evidence in BENCH_NOTES.md)."""
    from artist_style_transfer_tpu.ops.precision import precision

    params = init_transformer_params(jax.random.key(3))
    x = jnp.asarray(
        np.random.default_rng(5).random((2, 32, 40, 3), np.float32) * 255
    )
    with precision("highest"):
        y_ref = transformer_apply(params, x)
    with precision("default"):
        y_fast = transformer_apply(params, x)
    assert psnr(y_fast, y_ref) > 60.0


def test_transformer_parity_vs_torch():
    """Full-network forward parity with an imported torch checkpoint (PSNR check)."""
    import torch
    from tests.torch_ref import TorchTransformerNet

    torch.manual_seed(0)
    net = TorchTransformerNet().double().eval()

    params = transformer_params_from_torch(_sd_numpy(net))

    rng = np.random.default_rng(0)
    x = (rng.random((2, 32, 40, 3)) * 255).astype(np.float32)

    with torch.no_grad():
        ref = net(torch.from_numpy(x).double().permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()

    ours = np.asarray(jax.jit(transformer_apply)(params, jnp.asarray(x)))
    assert ours.shape == ref.shape
    # f32 vs f64 oracle: PSNR must comfortably clear the 35 dB north star
    p = psnr(ours, ref)
    assert p > 45.0, f"PSNR {p:.1f} dB"


def test_transformer_export_roundtrip():
    """params -> torch state dict -> params is exact."""
    params = init_transformer_params(jax.random.key(1))
    sd = transformer_params_to_torch(params)
    back = transformer_params_from_torch(sd)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vgg16_parity_vs_torch():
    import torch
    from tests.torch_ref import TorchVGG16Features

    torch.manual_seed(1)
    net = TorchVGG16Features().double().eval()
    params = vgg16_params_from_torch(_sd_numpy(net))

    rng = np.random.default_rng(1)
    # Caffe-preprocessed scale: roughly [-124, 151]
    x = (rng.random((1, 64, 64, 3)) * 255 - 115).astype(np.float32)

    with torch.no_grad():
        ref = net(torch.from_numpy(x).double().permute(0, 3, 1, 2))
    ours = jax.jit(vgg16_features)(params, jnp.asarray(x))

    assert set(ours) == {"relu1_2", "relu2_2", "relu3_3", "relu4_3"}
    for key in ours:
        theirs = ref[key].permute(0, 2, 3, 1).numpy()
        got = np.asarray(ours[key])
        assert got.shape == theirs.shape
        denom = np.abs(theirs).max() + 1e-6
        assert np.abs(got - theirs).max() / denom < 1e-4, key

    # just_content returns the relu2_2 tensor alone (train_cnn.py:64-68)
    jc = vgg16_features(params, jnp.asarray(x), just_content=True)
    np.testing.assert_allclose(np.asarray(jc), np.asarray(ours["relu2_2"]), rtol=1e-6)


def test_classifier_parity_vs_torch():
    import torch
    from tests.torch_ref import make_torch_classifier, randomize_bn_stats

    torch.manual_seed(2)
    net = make_torch_classifier(19)
    randomize_bn_stats(net, seed=3)
    net = net.double().eval()

    params = classifier_params_from_torch(_sd_numpy(net))

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 48, 48, 3)).astype(np.float32)

    with torch.no_grad():
        ref = net(torch.from_numpy(x).double().permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(jax.jit(classifier_apply)(params, jnp.asarray(x)))

    assert ours.shape == (2, 19)
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(ours - ref).max() / denom < 2e-3


def test_classifier_argmax_stability():
    """Logit ordering (what the eval metric uses, inference.py:155) is preserved."""
    import torch
    from tests.torch_ref import make_torch_classifier, randomize_bn_stats

    torch.manual_seed(4)
    net = make_torch_classifier(19)
    randomize_bn_stats(net, seed=5)
    net = net.double().eval()
    params = classifier_params_from_torch(_sd_numpy(net))

    rng = np.random.default_rng(4)
    x = rng.standard_normal((4, 48, 48, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x).double().permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(jax.jit(classifier_apply)(params, jnp.asarray(x)))
    np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))
