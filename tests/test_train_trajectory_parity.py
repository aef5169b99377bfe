"""End-to-end multi-epoch training-trajectory parity vs a float64 torch run.

The strongest parity statement we can make without the reference's
pretrained artifacts: starting from identical weights and identical data
order, our jitted f32 training loop and a float64 torch reimplementation of
the reference loop (train_cnn.py:282-378 semantics: Adam + weight decay,
StepLR, per-epoch loss sums) produce matching loss trajectories and
near-identical final parameters over several epochs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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
N = 4  # content images
B = 2
EPOCHS = 3
LR = 0.01
WD = 1e-4
CW, SW = 17.0, 25.0


@pytest.mark.slow
def test_three_epoch_trajectory_matches_torch():
    import torch
    from tests.torch_ref import TorchTransformerNet, TorchVGG16Features

    torch.manual_seed(3)
    tnet = TorchTransformerNet().double()
    tvgg = TorchVGG16Features().double().eval()
    for p in tvgg.parameters():
        p.requires_grad_(False)

    params = transformer_params_from_torch(
        {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    )
    vgg_params = vgg16_params_from_torch(
        {k: v.detach().numpy() for k, v in tvgg.state_dict().items()}
    )

    rng = np.random.default_rng(42)
    content = (rng.random((N, H, W, 3)) * 255).astype(np.float32)
    style_img = (rng.random((H, W, 3)) * 255).astype(np.float32)

    # Shared data order: our deterministic permutations drive both loops.
    perms = [np.asarray(epoch_permutation(0, e, N)) for e in range(EPOCHS)]

    # ---------------- ours (jitted f32) ----------------
    targets = build_style_targets(
        "random", vgg_params, "X", paintings=style_img[None], batch_size=B,
        rng=np.random.default_rng(0),
    )
    steps_per_epoch = N // B
    tx = make_optimizer(LR, WD, EPOCHS, 2, steps_per_epoch)
    fns = make_step_fns(
        "random", vgg_params, None, targets,
        content_weight=CW, style_weight=SW, batch_size=B, num_content=N,
        tx=tx, use_pallas=False,
    )
    content_dev = jnp.asarray(content)
    r22 = precompute_content_relu2_2(vgg_params, content_dev)
    opt_state = tx.init(params)
    ours_losses = []
    p = params
    for e in range(EPOCHS):
        p, opt_state, el = fns.epoch_fn(
            p, opt_state, content_dev, r22, targets.grams, None,
            jnp.asarray(perms[e]), jnp.int32(e * steps_per_epoch),
        )
        ours_losses.append(np.asarray(el).sum(axis=0))
    ours_losses = np.stack(ours_losses)

    # ---------------- torch reference loop (f64) ----------------
    neg_mean = torch.tensor([-103.939, -116.779, -123.68]).reshape(1, 3, 1, 1).double()

    def torch_gram(f):
        b, c, h, w = f.shape
        fl = f.reshape(b, c, h * w)
        return torch.bmm(fl, fl.transpose(1, 2)) / (c * h * w)

    with torch.no_grad():
        ts = torch.from_numpy(style_img.transpose(2, 0, 1)[None]).double()
        style_feats = tvgg(ts + neg_mean)
        target_grams = {k: torch_gram(v) for k, v in style_feats.items()}

    opt = torch.optim.Adam(tnet.parameters(), lr=LR, weight_decay=WD)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=EPOCHS // 2, gamma=0.5)
    tc_all = torch.from_numpy(content.transpose(0, 3, 1, 2)).double()
    with torch.no_grad():
        content_feats_all = tvgg(tc_all + neg_mean)["relu2_2"]

    torch_losses = []
    for e in range(EPOCHS):
        sums = np.zeros(3)
        for s in range(steps_per_epoch):
            idx = perms[e][s * B : (s + 1) * B]
            batch = tc_all[idx]
            opt.zero_grad()
            gen = tnet(batch)
            gen_feats = tvgg(gen + neg_mean)
            c_loss = CW * torch.nn.functional.mse_loss(
                gen_feats["relu2_2"], content_feats_all[idx]
            )
            s_loss = 0.0
            for k, v in gen_feats.items():
                s_loss = s_loss + torch.nn.functional.mse_loss(torch_gram(v), target_grams[k])
            s_loss = SW * s_loss
            total = c_loss + s_loss
            total.backward()
            opt.step()
            sums += [float(c_loss), float(s_loss), float(total)]
        sched.step()
        torch_losses.append(sums.copy())
    torch_losses = np.stack(torch_losses)

    # Trajectory parity: f32 jitted loop vs f64 eager reference semantics.
    # The first epoch must match tightly; later epochs accumulate the
    # inherent f32-vs-f64 drift of a chaotic optimization (observed ~1%/3
    # epochs), so the bound widens with epoch index.
    np.testing.assert_allclose(ours_losses[0], torch_losses[0], rtol=1e-3)
    np.testing.assert_allclose(ours_losses, torch_losses, rtol=3e-2)

    # Final params stay close after 6 optimizer steps (Adam normalizes tiny
    # grads, so bound by aggregate drift, not elementwise equality).
    _assert_params_close(p, tnet)


def _assert_params_close(p, tnet, updates: float = 1.5):
    """Adam updates are +-lr per step regardless of grad magnitude, and f32
    vs f64 sign flips on near-zero grads drift by whole updates — bound the
    aggregate (RMS) drift by a few update magnitudes, not elementwise."""
    theirs = transformer_params_from_torch(
        {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    )
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(theirs)):
        d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
        assert np.sqrt((d * d).mean()) < updates * LR, "RMS param divergence"


def test_ragged_final_batch_matches_torch():
    """content_data_size=5, batch_size=2: the kept partial batch matches a
    torch DataLoader run with drop_last=False (reference train_cnn.py:170)."""
    import torch
    from tests.torch_ref import TorchTransformerNet, TorchVGG16Features

    N_r, B_r, EPOCHS_r = 5, 2, 2
    torch.manual_seed(7)
    tnet = TorchTransformerNet().double()
    tvgg = TorchVGG16Features().double().eval()
    for prm in tvgg.parameters():
        prm.requires_grad_(False)

    params = transformer_params_from_torch(
        {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    )
    vgg_params = vgg16_params_from_torch(
        {k: v.detach().numpy() for k, v in tvgg.state_dict().items()}
    )

    rng = np.random.default_rng(5)
    content = (rng.random((N_r, H, W, 3)) * 255).astype(np.float32)
    style_img = (rng.random((H, W, 3)) * 255).astype(np.float32)
    perms = [np.asarray(epoch_permutation(0, e, N_r)) for e in range(EPOCHS_r)]
    steps_per_epoch = -(-N_r // B_r)  # 3: two full + one ragged

    # ---------------- ours ----------------
    targets = build_style_targets(
        "random", vgg_params, "X", paintings=style_img[None], batch_size=B_r,
        rng=np.random.default_rng(0),
    )
    tx = make_optimizer(LR, WD, EPOCHS_r, 2, steps_per_epoch)
    fns = make_step_fns(
        "random", vgg_params, None, targets,
        content_weight=CW, style_weight=SW, batch_size=B_r, num_content=N_r,
        tx=tx, use_pallas=False,
    )
    assert fns.steps_per_epoch == steps_per_epoch
    content_dev = jnp.asarray(content)
    r22 = precompute_content_relu2_2(vgg_params, content_dev)
    opt_state = tx.init(params)
    ours = []
    p = params
    for e in range(EPOCHS_r):
        p, opt_state, el = fns.epoch_fn(
            p, opt_state, content_dev, r22, targets.grams, None,
            jnp.asarray(perms[e]), jnp.int32(e * steps_per_epoch),
        )
        el = np.asarray(el)
        assert el.shape == (steps_per_epoch, 3)
        ours.append(el)
    ours = np.concatenate(ours)

    # ---------------- torch, keeping the ragged batch ----------------
    neg_mean = torch.tensor([-103.939, -116.779, -123.68]).reshape(1, 3, 1, 1).double()

    def torch_gram(f):
        b, c, h, w = f.shape
        fl = f.reshape(b, c, h * w)
        return torch.bmm(fl, fl.transpose(1, 2)) / (c * h * w)

    with torch.no_grad():
        ts = torch.from_numpy(style_img.transpose(2, 0, 1)[None]).double()
        target_grams = {k: torch_gram(v) for k, v in tvgg(ts + neg_mean).items()}

    opt = torch.optim.Adam(tnet.parameters(), lr=LR, weight_decay=WD)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=EPOCHS_r // 2, gamma=0.5)
    tc_all = torch.from_numpy(content.transpose(0, 3, 1, 2)).double()
    with torch.no_grad():
        content_feats_all = tvgg(tc_all + neg_mean)["relu2_2"]

    theirs = []
    for e in range(EPOCHS_r):
        for s in range(steps_per_epoch):
            idx = perms[e][s * B_r : (s + 1) * B_r]  # last slice is ragged (1)
            batch = tc_all[idx]
            opt.zero_grad()
            gen_feats = tvgg(tnet(batch) + neg_mean)
            c_loss = CW * torch.nn.functional.mse_loss(
                gen_feats["relu2_2"], content_feats_all[idx]
            )
            s_loss = sum(
                torch.nn.functional.mse_loss(
                    torch_gram(v), target_grams[k].expand(len(idx), -1, -1)
                )
                for k, v in gen_feats.items()
            )
            s_loss = SW * s_loss
            total = c_loss + s_loss
            total.backward()
            opt.step()
            theirs.append([float(c_loss), float(s_loss), float(total)])
        sched.step()
    theirs = np.asarray(theirs)

    # Per-STEP parity including the ragged steps (MSE normalizes by the true
    # ragged batch size in both). First step is pre-update (tight); later
    # steps accumulate the inherent f32-vs-f64 optimization drift, as in the
    # 3-epoch test above.
    np.testing.assert_allclose(ours[0], theirs[0], rtol=1e-3)
    np.testing.assert_allclose(ours, theirs, rtol=3e-2)
    # Batch-of-1 grads are noisier, so sign-flip drift runs slightly higher
    # than in the full-batch test above (~1.6 updates observed).
    _assert_params_close(p, tnet, updates=2.5)
