"""Batch->H folded shallow-VGG path: exactness vs the direct composition.

The fold (models.vgg._vgg16_features_folded) makes the C<128 conv1/conv2
blocks batch-1 by stacking images along H with zero separator rows (which
double as each image's SAME zero padding — VGG convs are zero-padded). These
tests pin the invariants the fast training path relies on:

- folded taps equal direct taps on the content rows, zeros on separators
- content/style losses with ``folded=True`` equal the unfolded ones
- the full training step (loss + grads through the transformer) matches
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artist_style_transfer_tpu.models.transformer import init_transformer_params
from artist_style_transfer_tpu.models.vgg import (
    FOLD_PAD,
    init_vgg16_params,
    vgg16_features,
)
from artist_style_transfer_tpu.ops.precision import set_precision
from artist_style_transfer_tpu.train.loop import (
    epoch_permutation,
    make_optimizer,
    make_step_fns,
    precompute_content_relu2_2,
)
from artist_style_transfer_tpu.train.styles import build_style_targets

H = W = 32
N = 3


@pytest.fixture(autouse=True)
def _fast_precision():
    set_precision("default")
    yield
    set_precision("highest")


def _content_rows(folded, pad):
    n, bf, w, c = folded.shape
    h = bf - pad
    return folded[:, pad // 2 : pad // 2 + h]


def test_folded_taps_match_direct():
    vgg_params = init_vgg16_params(jax.random.key(1))
    x = jnp.asarray(np.random.default_rng(0).random((N, H, W, 3), np.float32) * 2 - 1)

    direct = vgg16_features(vgg_params, x)
    folded = vgg16_features(vgg_params, x, fold_batch=True)

    for name, pad in FOLD_PAD.items():
        if pad:
            got = _content_rows(folded[name], pad)
            # separator rows are exactly zero (they act as the next conv's pad)
            sep = np.asarray(folded[name][:, : pad // 2])
            assert np.all(sep == 0), name
        else:
            got = folded[name]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(direct[name]), rtol=1e-5, atol=1e-6
        )

    # just_content variant returns the folded relu2_2 tensor
    jc = vgg16_features(vgg_params, x, just_content=True, fold_batch=True)
    np.testing.assert_allclose(
        np.asarray(_content_rows(jc, FOLD_PAD["relu2_2"])),
        np.asarray(direct["relu2_2"]),
        rtol=1e-5,
        atol=1e-6,
    )


def test_fold_gate_rejects_unaligned_shapes():
    vgg_params = init_vgg16_params(jax.random.key(1))
    x = jnp.zeros((2, 30, 32, 3), jnp.float32)  # H % 4 != 0
    out = vgg16_features(vgg_params, x, fold_batch=True)
    assert out["relu1_2"].shape[1] == 30  # fell back to the direct path


@pytest.mark.parametrize(
    "mode,fold",
    [("cycle", True), ("classifier", True), ("cycle", "vgg"), ("classifier", "vgg")],
)
def test_folded_step_matches_unfolded(mode, fold):
    rng = np.random.default_rng(4)
    content = jnp.asarray(rng.random((2 * N, H, W, 3), np.float32) * 255)
    paintings = (rng.random((3, H, W, 3)) * 255).astype(np.float32)
    params = init_transformer_params(jax.random.key(0))
    vgg_params = init_vgg16_params(jax.random.key(1))
    clf_params = None
    if mode == "classifier":
        from artist_style_transfer_tpu.models.resnet import init_classifier_params

        clf_params = init_classifier_params(jax.random.key(2))

    targets = build_style_targets(
        mode, vgg_params, "X", paintings=paintings, batch_size=N,
        artist_index=1 if mode == "classifier" else None,
    )
    r22 = precompute_content_relu2_2(vgg_params, content)

    def run(fold_arg):
        tx = make_optimizer(1e-3, 1e-4, 2, 2, 2)
        fns = make_step_fns(
            mode, vgg_params, clf_params, targets,
            content_weight=17.0, style_weight=25.0,
            batch_size=N, num_content=2 * N, tx=tx,
            use_pallas=False, fold_batch=fold_arg,
        )
        p = jax.tree.map(jnp.copy, params)  # epoch_fn donates its params buffers
        opt_state = tx.init(p)
        perm = epoch_permutation(0, 0, 2 * N)
        p, opt_state, losses = fns.epoch_fn(
            p, opt_state, content, r22, targets.grams, targets.labels,
            perm, jnp.int32(0),
        )
        return np.asarray(losses), jax.tree.leaves(p)

    losses_d, leaves_d = run(False)
    losses_f, leaves_f = run(fold)
    np.testing.assert_allclose(losses_f, losses_d, rtol=2e-4)
    # Params after 2 Adam steps: float-reassociation noise in noise-level
    # gradient elements is amplified to ~sign(g)*lr by Adam's first-step
    # normalization, so the bound here is O(2*steps*lr)=4e-3, not
    # grad-tight. The grad-tight exactness checks are
    # test_folded_grads_match_direct / test_transformer_folded_grads_*.
    for a, b in zip(leaves_f, leaves_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-3)


@pytest.mark.slow
def test_vgg_fold_with_quantized_deep_loss():
    """fold_batch='vgg' composes with quantize_loss='deep': the folded bf16
    shallow blocks meet the int8-MXU deep blocks at the pool2 unfold, and
    the trajectory matches the direct quantized step."""
    from artist_style_transfer_tpu.models.vgg import quantize_vgg16_loss

    rng = np.random.default_rng(7)
    content = jnp.asarray(rng.random((2 * N, H, W, 3), np.float32) * 255)
    paintings = (rng.random((3, H, W, 3)) * 255).astype(np.float32)
    params = init_transformer_params(jax.random.key(0))
    vgg_q = quantize_vgg16_loss(init_vgg16_params(jax.random.key(1)), "deep")

    targets = build_style_targets(
        "cycle", vgg_q, "X", paintings=paintings, batch_size=N
    )
    r22 = precompute_content_relu2_2(vgg_q, content)

    def run(fold_arg):
        tx = make_optimizer(1e-3, 1e-4, 2, 2, 2)
        fns = make_step_fns(
            "cycle", vgg_q, None, targets,
            content_weight=17.0, style_weight=25.0,
            batch_size=N, num_content=2 * N, tx=tx,
            use_pallas=False, fold_batch=fold_arg,
        )
        p = jax.tree.map(jnp.copy, params)
        opt_state = tx.init(p)
        perm = epoch_permutation(0, 0, 2 * N)
        p, opt_state, losses = fns.epoch_fn(
            p, opt_state, content, r22, targets.grams, None, perm, jnp.int32(0)
        )
        return np.asarray(losses), jax.tree.leaves(p)

    losses_d, leaves_d = run(False)
    losses_f, leaves_f = run("vgg")
    np.testing.assert_allclose(losses_f, losses_d, rtol=2e-4)
    for a, b in zip(leaves_f, leaves_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-3)


def test_vgg_fold_rejects_shallow_quantized_loss():
    """quantize_loss='all' quantizes the folded region -> refuse the fold."""
    from artist_style_transfer_tpu.models.vgg import quantize_vgg16_loss

    rng = np.random.default_rng(8)
    paintings = (rng.random((3, H, W, 3)) * 255).astype(np.float32)
    vgg_q = quantize_vgg16_loss(init_vgg16_params(jax.random.key(1)), "all")
    targets = build_style_targets(
        "cycle", vgg_q, "X", paintings=paintings, batch_size=N
    )
    tx = make_optimizer(1e-3, 1e-4, 2, 2, 2)
    with pytest.raises(NotImplementedError, match="quantize_loss"):
        make_step_fns(
            "cycle", vgg_q, None, targets,
            content_weight=17.0, style_weight=25.0,
            batch_size=N, num_content=2 * N, tx=tx,
            use_pallas=False, fold_batch="vgg",
        )


@pytest.mark.slow
def test_transformer_folded_matches_direct():
    """Folded transformer forward == direct fast-mode forward (all shapes)."""
    from artist_style_transfer_tpu.models.transformer import transformer_apply

    params = init_transformer_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    for n, h, w in [(3, 32, 32), (2, 64, 48), (4, 24, 36)]:
        x = jnp.asarray(rng.random((n, h, w, 3), np.float32) * 255)
        direct = transformer_apply(params, x)
        folded = transformer_apply(params, x, fold_batch=True)
        np.testing.assert_allclose(
            np.asarray(folded), np.asarray(direct), rtol=1e-4, atol=1e-5
        )
    # gate rejections fall back to the direct path (identical results)
    for shape in [(1, 32, 32, 3), (2, 30, 32, 3), (2, 16, 32, 3)]:
        x = jnp.asarray(rng.random(shape, np.float32) * 255)
        np.testing.assert_array_equal(
            np.asarray(transformer_apply(params, x, fold_batch=True)),
            np.asarray(transformer_apply(params, x)),
        )


def test_transformer_folded_grads_match_direct():
    from artist_style_transfer_tpu.models.transformer import transformer_apply

    params = init_transformer_params(jax.random.key(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((N, H, W, 3), np.float32) * 255)
    tgt = jnp.asarray(rng.random((N, H, W, 3), np.float32) * 255)

    def loss(p, fold):
        return jnp.mean((transformer_apply(p, x, fold_batch=fold) - tgt) ** 2)

    ld, gd = jax.jit(jax.value_and_grad(lambda p: loss(p, False)))(params)
    lf, gf = jax.jit(jax.value_and_grad(lambda p: loss(p, True)))(params)
    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gf)):
        a, b = np.asarray(a), np.asarray(b)
        # atol scaled to the leaf's magnitude: reassociation noise only
        np.testing.assert_allclose(a, b, atol=1e-5 + 5e-5 * np.abs(a).max())


@pytest.mark.slow
@pytest.mark.parametrize("fold", [True, "vgg"])
def test_folded_dp_step_matches_single_device(fold):
    """DP fold via shard_map: each device folds its LOCAL batch shard
    (train.loop grad_fn_sharded); the mesh trajectory must match the
    single-device folded one (same global batches, pmean of per-shard
    means == global mean for equal shards). Covers both fold modes
    (transformer+VGG, and the 'vgg' loss-branch-only fold)."""
    from artist_style_transfer_tpu.parallel import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )

    rng = np.random.default_rng(7)
    n, b = 16, 8
    content = jnp.asarray(rng.random((n, H, W, 3), np.float32) * 255)
    paintings = (rng.random((3, H, W, 3)) * 255).astype(np.float32)
    params = init_transformer_params(jax.random.key(0))
    vgg_params = init_vgg16_params(jax.random.key(1))
    targets = build_style_targets(
        "cycle", vgg_params, "X", paintings=paintings, batch_size=b
    )
    r22_full = precompute_content_relu2_2(vgg_params, content)
    mesh = make_mesh(shape=(4,), devices=jax.devices()[:4])

    def run(mesh_arg):
        tx = make_optimizer(1e-3, 1e-4, 2, 2, n // b)
        fns = make_step_fns(
            "cycle", vgg_params, None, targets,
            content_weight=17.0, style_weight=25.0,
            batch_size=b, num_content=n, tx=tx, mesh=mesh_arg,
            use_pallas=False, fold_batch=fold,
        )
        p = jax.tree.map(jnp.copy, params)
        c, r = content, r22_full
        if mesh_arg is not None:
            c = jax.device_put(c, batch_sharding(mesh_arg))
            r = jax.device_put(r, batch_sharding(mesh_arg))
            p = jax.device_put(p, replicated_sharding(mesh_arg))
        opt_state = tx.init(p)
        out_losses = []
        for epoch in range(2):
            perm = epoch_permutation(0, epoch, n)
            p, opt_state, losses = fns.epoch_fn(
                p, opt_state, c, r, targets.grams, targets.labels,
                perm, jnp.int32(epoch * (n // b)),
            )
            out_losses.append(np.asarray(losses))
        return np.concatenate(out_losses), jax.tree.leaves(p)

    losses_s, leaves_s = run(None)
    losses_m, leaves_m = run(mesh)
    np.testing.assert_allclose(losses_m, losses_s, rtol=2e-4)
    # Same Adam-amplified reassociation-noise bound as
    # test_folded_step_matches_unfolded (local N=2 folds vs one N=8 fold).
    for a, b_ in zip(leaves_m, leaves_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=5e-3)


def test_folded_grads_match_direct():
    """Tight exactness: grads through the folded VGG match the direct path."""
    from artist_style_transfer_tpu.models.transformer import transformer_apply
    from artist_style_transfer_tpu.ops.image import vgg_caffe_preprocess
    from artist_style_transfer_tpu.ops.losses import content_loss, style_loss_gram
    from artist_style_transfer_tpu.train.styles import select_step_grams

    rng = np.random.default_rng(4)
    content = jnp.asarray(rng.random((N, H, W, 3), np.float32) * 255)
    paintings = (rng.random((3, H, W, 3)) * 255).astype(np.float32)
    params = init_transformer_params(jax.random.key(0))
    vgg_params = init_vgg16_params(jax.random.key(1))
    targets = build_style_targets(
        "cycle", vgg_params, "X", paintings=paintings, batch_size=N
    )
    g0 = select_step_grams(targets.grams, jnp.int32(0), targets.num_cycle)
    r22 = vgg16_features(vgg_params, vgg_caffe_preprocess(content), just_content=True)

    def loss(p, fold):
        gen = transformer_apply(p, content)
        feats = vgg16_features(vgg_params, vgg_caffe_preprocess(gen), fold_batch=fold)
        c = 17.0 * content_loss(feats["relu2_2"], r22, folded=fold)
        s = 25.0 * style_loss_gram(feats, g0, folded=fold)
        return c + s

    ld, gd = jax.jit(jax.value_and_grad(lambda p: loss(p, False)))(params)
    lf, gf = jax.jit(jax.value_and_grad(lambda p: loss(p, True)))(params)
    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)
