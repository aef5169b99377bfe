"""Classifier training: train-mode BN parity vs torch, transfer-learning
masking, convergence on separable data, mesh == single-device, pth round-trip.

The reference never trains its classifier (it loads the Kaggle-trained
``models/best-2.pth``, classifier.py:62-63); these tests cover this
framework's own training capability (train/classifier.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from artist_style_transfer_tpu.models.resnet import (
    classifier_apply,
    classifier_apply_train,
    init_classifier_params,
    update_running_stats,
)
from artist_style_transfer_tpu.ops.norm import batch_norm_train
from artist_style_transfer_tpu.train.classifier import (
    augment_batch,
    evaluate_classifier,
    train_classifier,
    trainable_labels,
)


def test_augment_batch_is_flip_crop_of_padded_input():
    """Every augmented image is exactly one (flip, crop-offset) candidate of
    the reflect-padded input; deterministic per key, varying across keys."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 6, 5, 3)).astype(np.float32)
    pad = 2
    out = np.asarray(augment_batch(jax.random.key(1), jnp.asarray(x), pad=pad))
    assert out.shape == x.shape
    np.testing.assert_array_equal(
        out, np.asarray(augment_batch(jax.random.key(1), jnp.asarray(x), pad=pad))
    )
    assert not np.array_equal(
        out, np.asarray(augment_batch(jax.random.key(2), jnp.asarray(x), pad=pad))
    )
    h, w = x.shape[1:3]
    for i in range(x.shape[0]):
        candidates = []
        for img in (x[i], x[i, :, ::-1]):
            padded = np.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
            for oy in range(2 * pad + 1):
                for ox in range(2 * pad + 1):
                    candidates.append(padded[oy: oy + h, ox: ox + w])
        assert any(np.array_equal(out[i], c) for c in candidates), i


def test_batch_norm_train_parity_vs_torch_2d_and_1d():
    rng = np.random.default_rng(0)
    # --- BatchNorm2d over NHWC vs torch NCHW ---
    x = rng.normal(size=(4, 6, 5, 3)).astype(np.float32) * 2 + 1
    gamma = rng.normal(size=(3,)).astype(np.float32)
    beta = rng.normal(size=(3,)).astype(np.float32)
    y, mean, var_unb = batch_norm_train(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta))

    bn = torch.nn.BatchNorm2d(3, momentum=0.1)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(gamma))
        bn.bias.copy_(torch.from_numpy(beta))
    bn.train()
    yt = bn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(y), yt.detach().numpy().transpose(0, 2, 3, 1), rtol=2e-5, atol=2e-5
    )
    # torch running stats after one step: (1-m)*init + m*batch (unbiased var)
    np.testing.assert_allclose(
        np.asarray(0.1 * mean), bn.running_mean.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(0.9 * 1.0 + 0.1 * var_unb), bn.running_var.numpy(), rtol=1e-5, atol=1e-6
    )

    # --- BatchNorm1d over NC ---
    x1 = rng.normal(size=(8, 5)).astype(np.float32)
    g1 = rng.normal(size=(5,)).astype(np.float32)
    b1 = rng.normal(size=(5,)).astype(np.float32)
    y1, m1, v1 = batch_norm_train(jnp.asarray(x1), jnp.asarray(g1), jnp.asarray(b1))
    bn1 = torch.nn.BatchNorm1d(5)
    with torch.no_grad():
        bn1.weight.copy_(torch.from_numpy(g1))
        bn1.bias.copy_(torch.from_numpy(b1))
    bn1.train()
    np.testing.assert_allclose(
        np.asarray(y1), bn1(torch.from_numpy(x1)).detach().numpy(), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_classifier_train_forward_and_stat_update():
    params = init_classifier_params(jax.random.key(0), num_classes=4)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 64, 64, 3)), jnp.float32)
    logits, stats = classifier_apply_train(params, x)
    assert logits.shape == (4, 4)
    assert np.all(np.isfinite(np.asarray(logits)))
    # One stats entry per BN layer: stem + 16 blocks x 3 + 4 downsample + 2 head = 55.
    assert len(stats) == 1 + 16 * 3 + 4 + 2

    new = update_running_stats(params, stats, momentum=0.1)
    # Running stats moved toward batch stats; everything else bit-identical.
    m0 = params["stages"][0][0]["bn1"]["mean"]
    m1 = new["stages"][0][0]["bn1"]["mean"]
    exp = 0.9 * m0 + 0.1 * stats["stages.0.0.bn1"][0]
    np.testing.assert_allclose(np.asarray(m1), np.asarray(exp), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(new["head"]["fc1"]["w"]), np.asarray(params["head"]["fc1"]["w"])
    )
    assert not np.allclose(
        np.asarray(new["head"]["bn1"]["var"]), np.asarray(params["head"]["bn1"]["var"])
    )


def test_trainable_labels_freeze_body():
    params = init_classifier_params(jax.random.key(0), num_classes=3)
    labels = trainable_labels(params, freeze_body=True)
    assert labels["head"]["fc2"]["w"] == "train"
    assert labels["head"]["bn1"]["mean"] == "freeze"  # stats never trained
    assert labels["stem"]["conv"]["w"] == "freeze"
    assert labels["stem"]["bn"]["gamma"] == "train"  # fastai train_bn
    labels_all = trainable_labels(params, freeze_body=False)
    assert labels_all["stem"]["conv"]["w"] == "train"
    assert labels_all["stages"][0][0]["bn1"]["var"] == "freeze"


def _separable_data(n_per_class=12, size=48, num_classes=3, seed=0):
    """Classes = distinct mean colors + noise (easily separable)."""
    rng = np.random.default_rng(seed)
    means = np.asarray([[3.0, -2.0, 0.0], [-3.0, 2.0, 1.0], [0.0, 3.0, -3.0]])
    xs, ys = [], []
    for c in range(num_classes):
        xs.append(
            rng.normal(size=(n_per_class, size, size, 3)).astype(np.float32) * 0.2
            + means[c]
        )
        ys.append(np.full((n_per_class,), c, np.int32))
    return np.concatenate(xs), np.concatenate(ys)


@pytest.mark.slow
def test_train_classifier_learns():
    """Full fine-tune memorizes tiny separable data; eval-mode validation
    follows once the BN running stats catch the batch stats (bn_momentum
    0.5 here — at torch's 0.1 default the eval-mode net lags the train-mode
    net far longer, the standard from-scratch-BN warmup effect)."""
    images, labels = _separable_data(n_per_class=4, size=32)
    best, history = train_classifier(
        images, labels, num_classes=3, num_epochs=6, batch_size=9, lr=1e-3,
        weight_decay=0.0, freeze_body=False, schedule="constant",
        bn_momentum=0.5, val_fraction=0.25, seed=2, wordy=False,
    )
    assert history["train_loss"][-1] < 0.2 < history["train_loss"][0]
    assert history["train_acc"][-1] == 1.0
    assert max(history["val_acc"]) >= 2 / 3
    # evaluate_classifier covers the ragged-tail path (5 images, batch 4).
    acc = evaluate_classifier(best, images[:5], labels[:5], batch_size=4)
    assert 0.0 <= acc <= 1.0


@pytest.mark.slow
def test_train_classifier_freeze_body_semantics():
    """freeze_body=True: body conv weights untouched, head + BN affines
    trained, BN running stats still updated (fastai freeze() train_bn)."""
    images, labels = _separable_data(n_per_class=4, size=32)
    params0 = init_classifier_params(jax.random.key(7), num_classes=3)
    best, history = train_classifier(
        images, labels, num_classes=3, num_epochs=1, batch_size=8, lr=1e-3,
        freeze_body=True, augment=True, val_fraction=0.25, seed=2,
        params=jax.tree.map(lambda a: a, params0), wordy=False,
    )
    assert np.isfinite(history["train_loss"][0])
    np.testing.assert_array_equal(
        np.asarray(best["stages"][1][0]["conv2"]["w"]),
        np.asarray(params0["stages"][1][0]["conv2"]["w"]),
    )
    assert not np.allclose(
        np.asarray(best["head"]["fc2"]["w"]), np.asarray(params0["head"]["fc2"]["w"])
    )
    assert not np.allclose(
        np.asarray(best["stem"]["bn"]["gamma"]), np.asarray(params0["stem"]["bn"]["gamma"])
    )
    assert not np.allclose(
        np.asarray(best["stem"]["bn"]["mean"]), np.asarray(params0["stem"]["bn"]["mean"])
    )


@pytest.mark.slow
def test_train_classifier_mesh_matches_single_device():
    """DP training step == single-device: BN reductions become global-batch
    stats under GSPMD automatically (batch sharded over the 8-device mesh)."""
    from artist_style_transfer_tpu.parallel.mesh import make_mesh

    images, labels = _separable_data(n_per_class=8, size=32)
    # augment=True also checks the in-graph RNG: threefry results are
    # sharding-invariant, so the augmented DP trajectory must still match.
    kwargs = dict(
        num_classes=3, num_epochs=1, batch_size=8, lr=1e-3,
        freeze_body=True, augment=True, val_fraction=0.25, seed=2, wordy=False,
    )
    params0 = init_classifier_params(jax.random.key(3), num_classes=3)
    p_single, h_single = train_classifier(
        images, labels, params=jax.tree.map(lambda a: a, params0), **kwargs
    )
    mesh = make_mesh(shape=(8,))
    p_mesh, h_mesh = train_classifier(
        images, labels, params=jax.tree.map(lambda a: a, params0), mesh=mesh, **kwargs
    )
    np.testing.assert_allclose(
        h_mesh["train_loss"], h_single["train_loss"], rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(p_mesh["head"]["fc2"]["w"]),
        np.asarray(p_single["head"]["fc2"]["w"]),
        rtol=2e-4, atol=2e-6,
    )


def test_classifier_pth_export_roundtrip(tmp_path):
    """export_classifier_pth -> load_torch_state_dict -> params: identical
    logits, and the state dict carries the reference's exact key layout."""
    from artist_style_transfer_tpu.train.checkpoint import export_classifier_pth
    from artist_style_transfer_tpu.utils.torch_import import (
        classifier_params_from_torch,
        load_torch_state_dict,
    )

    params = init_classifier_params(jax.random.key(1), num_classes=19)
    path = str(tmp_path / "best-2.pth")
    export_classifier_pth(path, params)

    raw = torch.load(path, map_location="cpu", weights_only=True)
    assert set(raw.keys()) == {"model"}
    assert "0.0.weight" in raw["model"] and "1.8.bias" in raw["model"]
    assert "0.4.0.downsample.0.weight" in raw["model"]
    assert raw["model"]["0.1.num_batches_tracked"].dtype == torch.int64

    back = classifier_params_from_torch(load_torch_state_dict(path))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 64, 64, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(classifier_apply(back, x)),
        np.asarray(classifier_apply(params, x)),
        rtol=1e-5, atol=1e-5,
    )
