"""Training-stack tests: loss parity vs torch, optimizer parity, smoke train,
checkpoint resume, and deterministic data order."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.models import init_transformer_params
from artist_style_transfer_tpu.train.loop import (
    epoch_permutation,
    make_optimizer,
    make_step_fns,
    precompute_content_relu2_2,
)
from artist_style_transfer_tpu.train.styles import build_style_targets
from artist_style_transfer_tpu.utils.torch_import import (
    transformer_params_from_torch,
    vgg16_params_from_torch,
)

H = W = 32
B = 2


def _make_oracles():
    import torch
    from tests.torch_ref import TorchTransformerNet, TorchVGG16Features

    torch.manual_seed(7)
    tnet = TorchTransformerNet().double().eval()
    tvgg = TorchVGG16Features().double().eval()
    params = transformer_params_from_torch(
        {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    )
    vgg_params = vgg16_params_from_torch(
        {k: v.detach().numpy() for k, v in tvgg.state_dict().items()}
    )
    return tnet, tvgg, params, vgg_params


def _torch_gram(f):
    import torch

    b, c, h, w = f.shape
    fl = f.reshape(b, c, h * w)
    return torch.bmm(fl, fl.transpose(1, 2)) / (c * h * w)


NEG_MEAN = np.array([-103.939, -116.779, -123.68])


def test_loss_parity_random_mode():
    """Our jitted loss == the reference loss formula computed in torch f64."""
    import torch

    tnet, tvgg, params, vgg_params = _make_oracles()
    rng = np.random.default_rng(0)
    content = (rng.random((B, H, W, 3)) * 255).astype(np.float32)
    style_img = (rng.random((H, W, 3)) * 255).astype(np.float32)
    cw, sw = 17.0, 25.0

    # --- torch reference computation (train_cnn.py:298-325 semantics) ---
    tc = torch.from_numpy(content).double().permute(0, 3, 1, 2)
    ts = torch.from_numpy(style_img).double().permute(2, 0, 1)[None]
    neg = torch.from_numpy(NEG_MEAN).reshape(1, 3, 1, 1)
    with torch.no_grad():
        style_feats = tvgg(ts + neg)
        target_grams = {k: _torch_gram(v) for k, v in style_feats.items()}
        gen = tnet(tc)
        gen_feats = tvgg(gen + neg)
        content_feats = tvgg(tc + neg)
        c_loss = cw * torch.nn.functional.mse_loss(
            gen_feats["relu2_2"], content_feats["relu2_2"]
        )
        s_loss = 0.0
        for k, v in gen_feats.items():
            s_loss = s_loss + torch.nn.functional.mse_loss(
                _torch_gram(v), target_grams[k]
            )
        s_loss = sw * s_loss
    ref_total = float(c_loss + s_loss)

    # --- ours ---
    targets = build_style_targets(
        "random",
        vgg_params,
        "X",
        paintings=style_img[None],
        batch_size=B,
        rng=np.random.default_rng(1),
    )
    tx = make_optimizer(1e-3, 0.0, 10, 2, 1)
    fns = make_step_fns(
        "random", vgg_params, None, targets,
        content_weight=cw, style_weight=sw, batch_size=B, num_content=B, tx=tx,
        use_pallas=False,
    )
    r22 = precompute_content_relu2_2(vgg_params, jnp.asarray(content))
    total, (c_l, s_l) = fns.loss_fn(
        params, jnp.asarray(content), r22, targets.grams, None, jnp.int32(0)
    )
    np.testing.assert_allclose(float(c_l), float(c_loss), rtol=2e-3)
    np.testing.assert_allclose(float(s_l), float(s_loss), rtol=2e-3)
    np.testing.assert_allclose(float(total), ref_total, rtol=2e-3)


def test_smartaverage_averages_features_not_grams():
    """'smartaverage' = gram(mean(features)), not mean(gram) (train_cnn.py:224-244)."""
    _, _, _, vgg_params = _make_oracles()
    rng = np.random.default_rng(2)
    paintings = (rng.random((3, H, W, 3)) * 255).astype(np.float32)

    t = build_style_targets("smartaverage", vgg_params, "X", paintings=paintings, batch_size=1)

    from artist_style_transfer_tpu.models.vgg import vgg16_features
    from artist_style_transfer_tpu.ops.gram import gram_matrix_xla
    from artist_style_transfer_tpu.ops.image import vgg_caffe_preprocess

    feats = vgg16_features(vgg_params, vgg_caffe_preprocess(jnp.asarray(paintings)))
    for k in feats:
        mean_feat = jnp.mean(feats[k], axis=0, keepdims=True)
        expect = gram_matrix_xla(mean_feat)[0]
        np.testing.assert_allclose(np.asarray(t.grams[k]), np.asarray(expect), rtol=1e-4, atol=1e-6)
        # and it differs from mean-of-grams
        mean_gram = jnp.mean(gram_matrix_xla(feats[k]), axis=0)
        assert not np.allclose(np.asarray(t.grams[k]), np.asarray(mean_gram), rtol=1e-3)


def test_cycle_targets_index_per_step():
    _, _, _, vgg_params = _make_oracles()
    rng = np.random.default_rng(3)
    paintings = (rng.random((3, H, W, 3)) * 255).astype(np.float32)
    t = build_style_targets("cycle", vgg_params, "X", paintings=paintings, batch_size=1)
    assert t.num_cycle == 3
    for k, v in t.grams.items():
        assert v.shape[0] == 3
    g0 = t.gram_for_step(jnp.int32(0))
    g3 = t.gram_for_step(jnp.int32(3))  # wraps: 3 % 3 == 0
    g1 = t.gram_for_step(jnp.int32(1))
    for k in g0:
        np.testing.assert_array_equal(np.asarray(g0[k]), np.asarray(g3[k]))
        assert not np.array_equal(np.asarray(g0[k]), np.asarray(g1[k]))


def test_optimizer_matches_torch_adam():
    """optax chain == torch.optim.Adam(lr, weight_decay) + StepLR(gamma=.5)."""
    import torch

    w0 = np.linspace(-1, 1, 12).astype(np.float32).reshape(3, 4)
    tgt = np.ones((3, 4), np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()).double())
    opt = torch.optim.Adam([tw], lr=0.01, weight_decay=0.1)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=2, gamma=0.5)
    t_tgt = torch.from_numpy(tgt).double()

    tx = make_optimizer(lr=0.01, weight_decay=0.1, num_epochs=4, num_steps=2, steps_per_epoch=1)
    jw = jnp.asarray(w0)
    state = tx.init(jw)

    for step in range(4):  # 4 epochs of 1 step; LR halves after epoch 2
        opt.zero_grad()
        loss = ((tw - t_tgt) ** 2).mean()
        loss.backward()
        opt.step()
        sched.step()

        grads = jax.grad(lambda w: jnp.mean((w - jnp.asarray(tgt)) ** 2))(jw)
        updates, state = tx.update(grads, state, jw)
        jw = jax.tree.map(lambda p, u: p + u, jw, updates)

        np.testing.assert_allclose(
            np.asarray(jw), tw.detach().numpy(), rtol=1e-5, atol=1e-7,
            err_msg=f"step {step}",
        )


def test_epoch_permutation_deterministic():
    p1 = np.asarray(epoch_permutation(2, 5, 64))
    p2 = np.asarray(epoch_permutation(2, 5, 64))
    p3 = np.asarray(epoch_permutation(2, 6, 64))
    np.testing.assert_array_equal(p1, p2)
    assert not np.array_equal(p1, p3)
    assert sorted(p1.tolist()) == list(range(64))


def test_epoch_lower_compile_only_memory_analysis():
    """StepFns.epoch_lower: AOT-lower the epoch without executing.

    This is the HBM-sizing tool (tools/memprobe.py) used to pick batch
    sizes on the relayed TPU backend, where an actual OOM hangs the relay
    — the lowering must accept ShapeDtypeStructs and compile() must yield
    a memory analysis, with no device execution.
    """
    rng = np.random.default_rng(0)
    paintings = (rng.random((2, H, W, 3)) * 255).astype(np.float32)
    params = init_transformer_params(jax.random.key(0))
    from artist_style_transfer_tpu.models.vgg import init_vgg16_params

    vgg_params = init_vgg16_params(jax.random.key(1))
    targets = build_style_targets(
        "cycle", vgg_params, "x", paintings=paintings, batch_size=B
    )
    tx = make_optimizer(1e-3, 1e-4, 2, 2, 2)
    fns = make_step_fns(
        "cycle", vgg_params, None, targets,
        content_weight=17.0, style_weight=25.0,
        batch_size=B, num_content=2 * B, tx=tx, use_pallas=False,
    )
    content = jax.ShapeDtypeStruct((2 * B, H, W, 3), jnp.float32)
    r22 = jax.ShapeDtypeStruct((2 * B, H // 2, W // 2, 128), jnp.float32)
    opt_state = jax.eval_shape(tx.init, params)
    perm = jax.ShapeDtypeStruct((2 * B,), jnp.int32)
    lowered = fns.epoch_lower(
        params, opt_state, content, r22, targets.grams, None, perm,
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    ma = lowered.compile().memory_analysis()
    assert ma.temp_size_in_bytes > 0


@pytest.mark.parametrize("mode", ["random", "average", "smartaverage", "cycle"])
def test_train_smoke_gram_modes(mode, tmp_path):
    """End-to-end train() on tiny synthetic data: runs, losses finite & improving."""
    from artist_style_transfer_tpu.train import train

    rng = np.random.default_rng(5)
    content = (rng.random((4, H, W, 3)) * 255).astype(np.float32)
    paintings = (rng.random((2, H, W, 3)) * 255).astype(np.float32)
    _, _, _, vgg_params = _make_oracles()

    params, losses = train(
        style_method=mode,
        artist="TestArtist",
        num_epochs=3,
        batch_size=2,
        content_data_size=4,
        seed=2,
        save_every=2,
        model_dir=str(tmp_path),
        content_images=content,
        paintings=paintings,
        avg_image=paintings.mean(0),
        vgg_params=vgg_params,
        export_pth=False,
        wordy=False,
        use_pallas=False,
    )
    assert losses.shape == (3, 3)
    assert np.all(np.isfinite(losses))
    assert losses[-1, 2] < losses[0, 2]  # total loss decreases on tiny fixture
    # checkpoints: epochs 0, 2 and final 3
    d = tmp_path / "TestArtist" / mode
    names = {p.name for p in d.iterdir()}
    assert any(n.endswith("_0.ckpt") for n in names)
    assert any(n.endswith("_3.ckpt") for n in names)


def test_train_bf16_mixed_precision(tmp_path):
    """bf16 compute mode: loss trajectory tracks f32 and still improves."""
    from artist_style_transfer_tpu.train import train

    rng = np.random.default_rng(9)
    content = (rng.random((4, H, W, 3)) * 255).astype(np.float32)
    paintings = (rng.random((1, H, W, 3)) * 255).astype(np.float32)
    _, _, _, vgg_params = _make_oracles()

    kwargs = dict(
        style_method="random", artist="A", num_epochs=3, batch_size=2,
        content_data_size=4, seed=2, content_images=content,
        paintings=paintings, vgg_params=vgg_params,
        export_pth=False, wordy=False, use_pallas=False, model_dir=None,
    )
    _, l32 = train(compute_dtype="float32", **kwargs)
    _, l16 = train(compute_dtype="bfloat16", **kwargs)
    assert np.all(np.isfinite(l16))
    assert l16[-1, 2] < l16[0, 2]
    # same trajectory to within bf16 tolerance
    np.testing.assert_allclose(l16, l32, rtol=0.1)


def test_train_classifier_mode_smoke(tmp_path):
    from artist_style_transfer_tpu.models.resnet import init_classifier_params
    from artist_style_transfer_tpu.train import train

    rng = np.random.default_rng(6)
    content = (rng.random((2, H, W, 3)) * 255).astype(np.float32)
    _, _, _, vgg_params = _make_oracles()
    clf = init_classifier_params(jax.random.key(0))

    params, losses = train(
        style_method="classifier",
        artist="Pablo_Picasso",
        num_epochs=2,
        batch_size=2,
        content_data_size=2,
        model_dir=str(tmp_path),
        content_images=content,
        vgg_params=vgg_params,
        classifier_params=clf,
        export_pth=False,
        wordy=False,
    )
    assert np.all(np.isfinite(losses))


def test_train_preview_images(tmp_path):
    from artist_style_transfer_tpu.train import train

    rng = np.random.default_rng(10)
    content = (rng.random((2, H, W, 3)) * 255).astype(np.float32)
    paintings = (rng.random((1, H, W, 3)) * 255).astype(np.float32)
    _, _, _, vgg_params = _make_oracles()

    train(
        style_method="random", artist="A", num_epochs=2, batch_size=2,
        content_data_size=2, model_dir=str(tmp_path), preview_every=1,
        content_images=content, paintings=paintings, vgg_params=vgg_params,
        export_pth=False, wordy=False, use_pallas=False,
    )
    d = tmp_path / "A" / "random"
    assert (d / "preview_0.png").exists()
    assert (d / "preview_1.png").exists()
    assert (d / "style.jpg").exists()


@pytest.mark.slow
def test_train_resume(tmp_path):
    """Resume from the latest checkpoint reproduces uninterrupted training."""
    from artist_style_transfer_tpu.train import train

    rng = np.random.default_rng(7)
    content = (rng.random((2, H, W, 3)) * 255).astype(np.float32)
    paintings = (rng.random((1, H, W, 3)) * 255).astype(np.float32)
    _, _, _, vgg_params = _make_oracles()

    kwargs = dict(
        style_method="random",
        artist="A",
        batch_size=2,
        content_data_size=2,
        seed=2,
        save_every=1,
        content_images=content,
        paintings=paintings,
        vgg_params=vgg_params,
        export_pth=False,
        wordy=False,
        use_pallas=False,
    )
    p_full, l_full = train(num_epochs=4, model_dir=str(tmp_path / "full"), **kwargs)

    # interrupted run: stop after 2 of 4 epochs, then resume to completion
    train(num_epochs=4, max_epochs_this_run=2, model_dir=str(tmp_path / "part"), **kwargs)
    p_res, l_res = train(num_epochs=4, model_dir=str(tmp_path / "part"), resume=True, **kwargs)
    np.testing.assert_allclose(l_res, l_full, rtol=1e-4)

    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_res)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_train_resume_second_run_prefix(tmp_path):
    """Resume picks up a run checkpointed under the bumped 'transfer2_'
    prefix (2nd run in the same dir) instead of silently restarting and
    overwriting the first run's 'transfer_' files (ADVICE r1)."""
    import os

    from artist_style_transfer_tpu.train import train

    rng = np.random.default_rng(8)
    content = (rng.random((2, H, W, 3)) * 255).astype(np.float32)
    paintings = (rng.random((1, H, W, 3)) * 255).astype(np.float32)
    _, _, _, vgg_params = _make_oracles()

    kwargs = dict(
        style_method="random", artist="A", batch_size=2, content_data_size=2,
        seed=2, save_every=1, content_images=content, paintings=paintings,
        vgg_params=vgg_params, export_pth=False, wordy=False,
        use_pallas=False, model_dir=str(tmp_path),
    )
    # run 1 completes -> transfer_ files exist
    train(num_epochs=2, **kwargs)
    d = tmp_path / "A" / "random"
    first_files = {n: os.path.getmtime(d / n) for n in os.listdir(d) if "transfer_" in n}
    assert first_files

    # run 2 in the same dir -> bumped transfer2_ prefix; interrupt it
    train(num_epochs=4, max_epochs_this_run=2, **kwargs)
    assert any("transfer2_" in n for n in os.listdir(d))

    # resume must continue run 2 (epoch 2 -> 4), not restart run 1
    _, l_res = train(num_epochs=4, resume=True, **kwargs)
    assert np.all(l_res >= 0), "all 4 epochs accounted for (first 2 restored)"
    assert any(n.startswith("transfer2_") and n.endswith("_4.ckpt") for n in os.listdir(d))
    # run 1's files untouched
    for n, mtime in first_files.items():
        assert os.path.getmtime(d / n) == mtime, f"{n} was overwritten"
