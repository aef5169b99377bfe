"""Diffusion (C20) tests: process math, UNet shapes, training step, guided sampling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.diffusion import (
    GaussianDiffusion,
    diff_model_apply,
    diff_sample,
    init_diff_model,
    train_diffusion,
)

T = 16  # tiny schedule for tests
HW = 16


def test_schedule_coefficients():
    d = GaussianDiffusion.make(num_timesteps=T)
    assert d.num_timesteps == T
    acp = np.asarray(d.alphas_cumprod)
    assert np.all(np.diff(acp) < 0) and acp[0] < 1.0 and acp[-1] > 0.0
    np.testing.assert_allclose(
        np.asarray(d.sqrt_alphas_cumprod) ** 2 + np.asarray(d.sqrt_one_minus_alphas_cumprod) ** 2,
        1.0,
        rtol=1e-5,
    )


def test_q_sample_and_x0_roundtrip():
    d = GaussianDiffusion.make(num_timesteps=T)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, HW, HW, 3)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, HW, HW, 3)).astype(np.float32))
    t = jnp.asarray([3, 9], jnp.int32)
    x_t = d.q_sample(x0, t, noise)
    # recovering x0 from the true eps must be exact
    x0_rec = d.predict_x0_from_eps(x_t, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_unet_shapes_and_conditioning():
    params = init_diff_model(jax.random.key(0), num_classes=5, base_channels=32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, HW, HW, 3)).astype(np.float32))
    t = jnp.asarray([1, 5], jnp.int32)
    out_a = diff_model_apply(params, x, t, jnp.asarray([0, 1], jnp.int32))
    out_b = diff_model_apply(params, x, t, jnp.asarray([2, 3], jnp.int32))
    assert out_a.shape == x.shape
    # conditioning must change the output — the final conv is near-zero-
    # initialized (standard diffusion practice), so compare against exact
    # equality, not allclose's default tolerance
    assert np.abs(np.asarray(out_a) - np.asarray(out_b)).max() > 0.0
    out_c = diff_model_apply(params, x, jnp.asarray([9, 12], jnp.int32), jnp.asarray([0, 1], jnp.int32))
    assert np.abs(np.asarray(out_a) - np.asarray(out_c)).max() > 0.0


def test_train_diffusion_reduces_loss():
    rng = np.random.default_rng(2)
    imgs = (rng.random((8, HW, HW, 3)) * 255).astype(np.float32)
    labels = np.arange(8) % 3
    params, diffusion, losses = train_diffusion(
        imgs, labels, num_classes=3, num_timesteps=T, num_epochs=4,
        batch_size=4, base_channels=32, lr=3e-4, wordy=False,
    )
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_cosine_schedule_properties():
    """Cosine alpha-bar: monotone decreasing from ~1, betas in (0, 0.999]."""
    d = GaussianDiffusion.make(num_timesteps=100, schedule="cosine")
    acp = np.asarray(d.alphas_cumprod)
    betas = np.asarray(d.betas)
    assert acp[0] > 0.99
    assert np.all(np.diff(acp) < 0)
    assert betas.min() > 0 and betas.max() <= 0.999
    # q_sample must still be variance-preserving at every t
    assert np.allclose(
        np.asarray(d.sqrt_alphas_cumprod) ** 2
        + np.asarray(d.sqrt_one_minus_alphas_cumprod) ** 2,
        1.0,
        atol=1e-5,
    )
    with np.testing.assert_raises(ValueError):
        GaussianDiffusion.make(num_timesteps=10, schedule="bogus")


def test_train_diffusion_ema_weights():
    """EMA-returned weights differ from raw and lag the last update."""
    rng = np.random.default_rng(4)
    imgs = (rng.random((4, HW, HW, 3)) * 255).astype(np.float32)
    labels = np.arange(4) % 2
    kwargs = dict(
        num_classes=2, num_timesteps=T, num_epochs=2, batch_size=2,
        base_channels=32, lr=3e-4, wordy=False, seed=7,
    )
    p_raw, _, l_raw = train_diffusion(imgs, labels, ema_decay=None, **kwargs)
    p_ema, _, l_ema = train_diffusion(imgs, labels, ema_decay=0.9, **kwargs)
    np.testing.assert_allclose(l_raw, l_ema, rtol=1e-6)  # same trajectory
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(p_raw), jax.tree.leaves(p_ema))
    ]
    assert max(diffs) > 0.0  # EMA is not the raw weights


def test_diff_sample_shapes_and_guidance():
    from artist_style_transfer_tpu.models.resnet import init_classifier_params

    params = init_diff_model(jax.random.key(0), num_classes=3, base_channels=32)
    diffusion = GaussianDiffusion.make(num_timesteps=T)
    y = jnp.asarray([0, 2], jnp.int32)

    out = diff_sample(params, diffusion, jax.random.key(1), y, shape=(HW, HW))
    assert out.shape == (2, HW, HW, 3)
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 255.0 and np.all(np.isfinite(o))

    clf = init_classifier_params(jax.random.key(2), num_classes=3)
    guided = diff_sample(
        params, diffusion, jax.random.key(1), y, shape=(HW, HW),
        classifier_params=clf, guidance_scale=2.0,
    )
    assert guided.shape == (2, HW, HW, 3)
    assert not np.allclose(np.asarray(guided), o)  # guidance changes the samples


def test_diff_sample_ddim_deterministic_and_guided():
    """DDIM fast sampler: steps<<T model evals, eta=0 fully deterministic,
    guidance folds into eps via the same x_hat0 trick as DDPM sampling."""
    from artist_style_transfer_tpu.diffusion import diff_sample_ddim
    from artist_style_transfer_tpu.models.resnet import init_classifier_params

    params = init_diff_model(jax.random.key(0), num_classes=3, base_channels=32)
    diffusion = GaussianDiffusion.make(num_timesteps=T)
    y = jnp.asarray([0, 2], jnp.int32)

    a = diff_sample_ddim(params, diffusion, jax.random.key(1), y, shape=(HW, HW), steps=6)
    b = diff_sample_ddim(params, diffusion, jax.random.key(1), y, shape=(HW, HW), steps=6)
    assert a.shape == (2, HW, HW, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # eta=0: deterministic
    o = np.asarray(a)
    assert o.min() >= 0.0 and o.max() <= 255.0 and np.all(np.isfinite(o))
    # different key -> different initial noise -> different samples
    c = diff_sample_ddim(params, diffusion, jax.random.key(9), y, shape=(HW, HW), steps=6)
    assert not np.allclose(np.asarray(c), o)
    # eta=1 adds per-step noise on the subsequence
    d = diff_sample_ddim(
        params, diffusion, jax.random.key(1), y, shape=(HW, HW), steps=6, eta=1.0
    )
    assert not np.allclose(np.asarray(d), o)
    # steps == T runs the full subsequence; guidance changes the samples
    clf = init_classifier_params(jax.random.key(2), num_classes=3)
    g = diff_sample_ddim(
        params, diffusion, jax.random.key(1), y, shape=(HW, HW), steps=6,
        classifier_params=clf, guidance_scale=2.0,
    )
    assert np.all(np.isfinite(np.asarray(g))) and not np.allclose(np.asarray(g), o)


def test_diff_sample_dpmpp_deterministic_and_converges():
    """DPM-Solver++(2M): deterministic given the key, valid range, guided,
    and — the second-order claim — closer to the fine-grained DDIM ODE
    solution at a small step budget than first-order DDIM at that budget."""
    from artist_style_transfer_tpu.diffusion import diff_sample_ddim, diff_sample_dpmpp
    from artist_style_transfer_tpu.models.resnet import init_classifier_params

    params = init_diff_model(jax.random.key(0), num_classes=3, base_channels=32)
    diffusion = GaussianDiffusion.make(num_timesteps=T)
    y = jnp.asarray([0, 2], jnp.int32)

    a = diff_sample_dpmpp(params, diffusion, jax.random.key(1), y, shape=(HW, HW), steps=8)
    b = diff_sample_dpmpp(params, diffusion, jax.random.key(1), y, shape=(HW, HW), steps=8)
    assert a.shape == (2, HW, HW, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # deterministic
    o = np.asarray(a)
    assert o.min() >= 0.0 and o.max() <= 255.0 and np.all(np.isfinite(o))
    c = diff_sample_dpmpp(params, diffusion, jax.random.key(9), y, shape=(HW, HW), steps=8)
    assert not np.allclose(np.asarray(c), o)  # key changes the initial noise
    clf = init_classifier_params(jax.random.key(2), num_classes=3)
    g = diff_sample_dpmpp(
        params, diffusion, jax.random.key(1), y, shape=(HW, HW), steps=8,
        classifier_params=clf, guidance_scale=2.0,
    )
    assert np.all(np.isfinite(np.asarray(g))) and not np.allclose(np.asarray(g), o)

    # Both samplers discretize the same probability-flow ODE: against a
    # fine DDIM(eta=0) reference from the same initial noise, the 8-step
    # DPM++ sample must land close on the [0,255] scale. (The ORDER claim
    # is asserted on an analytic linear model below — a random-weight UNet
    # under x0 clipping collapses every sampler to nearly the same image,
    # so order comparisons here are noise.)
    ref = np.asarray(
        diff_sample_ddim(params, diffusion, jax.random.key(1), y, shape=(HW, HW), steps=T)
    )
    err_dpm = float(np.mean((o - ref) ** 2) ** 0.5)
    assert err_dpm < 2.0, err_dpm


def test_dpmpp_second_order_on_linear_model(monkeypatch):
    """Solver-order check on analytic dynamics: with a LINEAR eps model
    (eps = c*x, no clipping) the probability-flow ODE is smooth, and the
    second-order multistep solver at a small step budget must beat
    first-order DDIM at the same budget against a fine-step reference."""
    import artist_style_transfer_tpu.diffusion.sample as smod

    # Distinct shapes/T from every other test so the patched model gets a
    # fresh trace (jit caches by shape, not by global identity).
    monkeypatch.setattr(smod, "diff_model_apply", lambda p, x, t, y: 0.25 * x)
    T2, HW2 = 200, 8
    params = init_diff_model(jax.random.key(0), num_classes=3, base_channels=32)
    diffusion = GaussianDiffusion.make(num_timesteps=T2)
    y = jnp.asarray([0], jnp.int32)
    kw = dict(shape=(HW2, HW2), clip_x0=False)

    def rms(a, b):
        return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2) ** 0.5)

    ref = smod.diff_sample_ddim(params, diffusion, jax.random.key(3), y, steps=T2, **kw)
    err_dpm = rms(smod.diff_sample_dpmpp(params, diffusion, jax.random.key(3), y, steps=8, **kw), ref)
    err_ddim = rms(smod.diff_sample_ddim(params, diffusion, jax.random.key(3), y, steps=8, **kw), ref)
    assert err_dpm < err_ddim, (err_dpm, err_ddim)


def test_unet_rejects_indivisible_extent():
    """H,W % 4 != 0 desyncs skip shapes; must fail with a clear error."""
    params = init_diff_model(jax.random.key(0), num_classes=2, base_channels=32)
    x = jnp.zeros((1, 50, 48, 3), jnp.float32)
    with pytest.raises(ValueError, match="divisible by 4"):
        diff_model_apply(params, x, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))


def test_diff_sample_separate_classifier_labels():
    """classifier_y conditions guidance independently of the model's y."""
    from artist_style_transfer_tpu.models.resnet import init_classifier_params

    params = init_diff_model(jax.random.key(0), num_classes=2, base_channels=32)
    diffusion = GaussianDiffusion.make(num_timesteps=T)
    clf = init_classifier_params(jax.random.key(2), num_classes=19)
    y = jnp.asarray([0, 1], jnp.int32)
    a = diff_sample(
        params, diffusion, jax.random.key(1), y, shape=(HW, HW),
        classifier_params=clf, guidance_scale=2.0,
        classifier_y=jnp.asarray([3, 7], jnp.int32),
    )
    b = diff_sample(
        params, diffusion, jax.random.key(1), y, shape=(HW, HW),
        classifier_params=clf, guidance_scale=2.0,
        classifier_y=jnp.asarray([11, 15], jnp.int32),
    )
    assert a.shape == (2, HW, HW, 3)
    assert not np.allclose(np.asarray(a), np.asarray(b))


# --- Fréchet eval (CFID) ---------------------------------------------------


def test_frechet_distance_analytic():
    """frechet_distance matches the closed form for known Gaussians."""
    from artist_style_transfer_tpu.diffusion.evaluate import frechet_distance

    rng = np.random.default_rng(0)
    d = 6
    mu1, mu2 = rng.standard_normal(d), rng.standard_normal(d)
    # diagonal covariances -> FID = |dmu|^2 + sum (sqrt(a_i) - sqrt(b_i))^2
    a, b = rng.random(d) + 0.5, rng.random(d) + 0.5
    want = float(np.sum((mu1 - mu2) ** 2) + np.sum((np.sqrt(a) - np.sqrt(b)) ** 2))
    got = frechet_distance(mu1, np.diag(a), mu2, np.diag(b))
    np.testing.assert_allclose(got, want, rtol=1e-10)

    # identical Gaussians (dense covariance) -> exactly 0
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    s = q @ np.diag(rng.random(d) + 0.1) @ q.T
    assert abs(frechet_distance(mu1, s, mu1, s)) < 1e-9

    # rotation-invariant sanity: distance is symmetric
    s2 = q @ np.diag(rng.random(d) + 0.1) @ q.T
    np.testing.assert_allclose(
        frechet_distance(mu1, s, mu2, s2), frechet_distance(mu2, s2, mu1, s), rtol=1e-9
    )


def test_cfid_discriminates():
    """CFID ~0 for the same image set, larger for a disjoint noisy set."""
    from artist_style_transfer_tpu.diffusion.evaluate import cfid
    from artist_style_transfer_tpu.models.resnet import init_classifier_params

    rng = np.random.default_rng(1)
    clf = init_classifier_params(jax.random.key(0), num_classes=3)
    real = (rng.random((12, HW, HW, 3)) * 255).astype(np.float32)
    same = cfid(clf, real, real.copy(), batch=6)
    other = (rng.random((12, HW, HW, 3)) * 64).astype(np.float32)  # darker set
    far = cfid(clf, real, other, batch=6)
    assert abs(same) < 1e-6
    assert far > same + 1e-3


def test_cfid_sampler_curve_artifact_trend():
    """The committed CFID-vs-steps artifact (tools/diffusion_quality_curve.py,
    measured on-chip round 5) must exhibit the quality ordering the sampler
    docs claim — measured, not cited (VERDICT r4 #8):

    - DDPM-1000 (stochastic, full chain) is strictly the best sampler;
    - DPM-Solver++(2M) at 12 steps matches DDIM-50 quality (the
      "12-20 steps reach DDIM-50 quality" claim, diffusion/cli.py) —
      and DPM++-4 still matches where DDIM-5 has already slipped
      (second-order multistep vs first-order);
    - quality degrades monotonically as DDIM steps drop to the extreme
      (50 -> 5 -> 3 -> 2), and same for DPM++ (12 -> 2);
    - every sampler sits far above the real-vs-real floor (~0).

    Regenerate with: python tools/diffusion_quality_curve.py --epochs 80
    """
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "goldens", "diffusion_cfid_curve.json")
    art = json.load(open(path))
    c = {k: v["cfid"] for k, v in art["curve"].items()}
    floor = art["real_vs_real_floor"]

    for name in ("ddpm-1000", "ddim-50", "ddim-5", "ddim-3", "ddim-2",
                 "dpmpp-20", "dpmpp-12", "dpmpp-4", "dpmpp-2"):
        assert name in c, f"missing {name}"

    # stochastic DDPM best, all samplers well above the floor
    assert c["ddpm-1000"] == min(c.values()), c
    assert all(v > floor + 5e-3 for v in c.values()), (floor, c)

    # the headline claim: DPM++-12 reaches DDIM-50 quality
    assert c["dpmpp-12"] <= c["ddim-50"] * 1.05 + 1e-9, c
    # second-order solver: DPM++-4 still at DDIM-50 level
    assert c["dpmpp-4"] <= c["ddim-50"] * 1.05 + 1e-9, c

    # monotone (non-decreasing CFID) as steps drop to the extreme
    assert c["ddim-50"] <= c["ddim-5"] <= c["ddim-3"] <= c["ddim-2"], c
    assert c["dpmpp-12"] <= c["dpmpp-2"], c
    # the extreme-low-step breakdown is a REAL degradation, not noise
    assert c["ddim-2"] >= c["ddim-50"] * 1.05, c
    assert c["dpmpp-2"] >= c["dpmpp-12"] * 1.05, c
