"""`diff_sample` — class-conditional DDPM sampling with classifier guidance.

Reverse process with the mean shifted by the gradient of the artist
classifier's log-probability (Dhariwal & Nichol classifier guidance). The
pretrained ResNet-50 is a *clean-image* classifier, so the gradient is taken
through the predicted x0 (x_hat0 trick) rather than on the noisy x_t — this
is what lets the reference's `best-2.pth` supply the guidance signal
directly (SURVEY §0: the build treats C20 as standard class-conditional
guided Gaussian diffusion with the same classifier).

The full T-step reverse loop is one jitted ``lax.scan``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.diffusion.gaussian import GaussianDiffusion, _extract
from artist_style_transfer_tpu.diffusion.unet import diff_model_apply
from artist_style_transfer_tpu.models.resnet import classifier_apply
from artist_style_transfer_tpu.ops.image import bgr_to_rgb, torchvision_normalize


def _classifier_logprob_grad(classifier_params, x0_pm1: jax.Array, y: jax.Array) -> jax.Array:
    """grad_x log p(y | x0) where x0 is in [-1, 1] BGR."""

    def logp(x):
        # [-1,1] BGR -> RGB [0,1] -> torchvision stats, as 'classifier' mode does
        rgb01 = bgr_to_rgb((x + 1.0) * 0.5)
        logits = classifier_apply(classifier_params, torchvision_normalize(rgb01))
        lp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.sum(jnp.take_along_axis(lp, y[:, None], axis=-1))

    return jax.grad(logp)(x0_pm1)


@functools.partial(
    jax.jit, static_argnames=("shape", "guidance_scale", "clip_x0")
)
def diff_sample(
    params: dict,
    diffusion: GaussianDiffusion,
    key: jax.Array,
    y: jax.Array,  # (N,) artist class ids in the MODEL's label space
    shape: tuple[int, int] = (64, 64),
    classifier_params=None,
    guidance_scale: float = 0.0,
    clip_x0: bool = True,
    classifier_y: jax.Array | None = None,
) -> jax.Array:
    """Sample class-conditional images. Returns NHWC BGR [0, 255] float32.

    ``y`` indexes the diffusion model's own class embedding (the training
    corpus's label space); ``classifier_y`` indexes the guidance
    classifier's label space (the 19-artist head of ``best-2.pth``,
    classifier.py:43-66). They differ whenever the model was trained on a
    corpus whose artist enumeration isn't ARTISTS_19 — pass both in that
    case; ``classifier_y`` defaults to ``y``.
    """
    if classifier_y is None:
        classifier_y = y
    n = y.shape[0]
    h, w = shape
    key, k0 = jax.random.split(key)
    x = jax.random.normal(k0, (n, h, w, 3), jnp.float32)
    T = diffusion.num_timesteps

    def step(carry, t_rev):
        x, key = carry
        t = T - 1 - t_rev
        tb = jnp.full((n,), t, jnp.int32)
        eps = diff_model_apply(params, x, tb, y)
        x0 = diffusion.predict_x0_from_eps(x, tb, eps)
        if clip_x0:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = diffusion.q_posterior_mean(x0, x, tb)
        if classifier_params is not None and guidance_scale > 0.0:
            grad = _classifier_logprob_grad(classifier_params, x0, classifier_y)
            mean = mean + guidance_scale * _extract(
                diffusion.posterior_variance, tb, x.ndim
            ) * grad
        key, kn = jax.random.split(key)
        noise = jax.random.normal(kn, x.shape, x.dtype)
        nonzero = (t > 0).astype(x.dtype)
        logvar = _extract(diffusion.posterior_log_variance, tb, x.ndim)
        x = mean + nonzero * jnp.exp(0.5 * logvar) * noise
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, key), jnp.arange(T))
    # [-1, 1] -> BGR [0, 255]
    return jnp.clip((x + 1.0) * 127.5, 0.0, 255.0)


@functools.partial(
    jax.jit,
    static_argnames=("shape", "steps", "eta", "guidance_scale", "clip_x0"),
)
def diff_sample_ddim(
    params: dict,
    diffusion: GaussianDiffusion,
    key: jax.Array,
    y: jax.Array,
    shape: tuple[int, int] = (64, 64),
    steps: int = 50,
    eta: float = 0.0,
    classifier_params=None,
    guidance_scale: float = 0.0,
    clip_x0: bool = True,
    classifier_y: jax.Array | None = None,
) -> jax.Array:
    """DDIM sampling (Song et al. 2021) over a ``steps``-long timestep
    subsequence — the fast sampler: 10-50 model evaluations instead of T.

    ``eta=0`` is the deterministic DDIM ODE (same key => same images, and
    the only randomness is the initial noise); ``eta=1`` recovers
    DDPM-like stochasticity on the subsequence. Classifier guidance uses
    the same x_hat0 trick as :func:`diff_sample` (clean-image classifier),
    folded into eps before the x0/direction split. Returns NHWC BGR
    [0, 255] float32.
    """
    import numpy as np

    if classifier_y is None:
        classifier_y = y
    n = y.shape[0]
    h, w = shape
    key, k0 = jax.random.split(key)
    x = jax.random.normal(k0, (n, h, w, 3), jnp.float32)
    T = diffusion.num_timesteps
    steps = min(steps, T)
    # Ascending subsequence 0..T-1 (endpoints included), walked in reverse;
    # static at trace time so the scan constants fold.
    ts = np.unique(np.linspace(0, T - 1, num=steps).round().astype(np.int64))
    pairs = np.stack([ts, np.concatenate(([-1], ts[:-1]))], axis=1)[::-1].copy()
    acp = diffusion.alphas_cumprod

    def step(carry, pair):
        x, key = carry
        t, t_prev = pair[0], pair[1]
        tb = jnp.full((n,), t, jnp.int32)
        a_t = acp[t]
        a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
        eps = diff_model_apply(params, x, tb, y)
        x0 = diffusion.predict_x0_from_eps(x, tb, eps)
        if clip_x0:
            x0 = jnp.clip(x0, -1.0, 1.0)
        if classifier_params is not None and guidance_scale > 0.0:
            grad = _classifier_logprob_grad(classifier_params, x0, classifier_y)
            eps = eps - guidance_scale * jnp.sqrt(1.0 - a_t) * grad
            x0 = diffusion.predict_x0_from_eps(x, tb, eps)
            if clip_x0:
                x0 = jnp.clip(x0, -1.0, 1.0)
        # eps consistent with the (clipped/guided) x0
        eps_hat = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t)
        sigma = (
            eta
            * jnp.sqrt((1.0 - a_prev) / (1.0 - a_t))
            * jnp.sqrt(jnp.maximum(1.0 - a_t / a_prev, 0.0))
        )
        direction = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps_hat
        key, kn = jax.random.split(key)
        noise = jax.random.normal(kn, x.shape, x.dtype)
        x = (
            jnp.sqrt(a_prev) * x0
            + direction
            + jnp.where(t_prev >= 0, sigma, 0.0) * noise
        )
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, key), jnp.asarray(pairs, jnp.int32))
    return jnp.clip((x + 1.0) * 127.5, 0.0, 255.0)


@functools.partial(
    jax.jit, static_argnames=("shape", "steps", "guidance_scale", "clip_x0")
)
def diff_sample_dpmpp(
    params: dict,
    diffusion: GaussianDiffusion,
    key: jax.Array,
    y: jax.Array,
    shape: tuple[int, int] = (64, 64),
    steps: int = 20,
    classifier_params=None,
    guidance_scale: float = 0.0,
    clip_x0: bool = True,
    classifier_y: jax.Array | None = None,
) -> jax.Array:
    """DPM-Solver++(2M) sampling (Lu et al. 2022) — the fastest sampler.

    A second-order multistep solver for the probability-flow ODE in the
    data(x0)-prediction parameterization: each step extrapolates from the
    current AND previous x0 predictions, so 10-20 model evaluations reach
    the quality DDIM needs 50-100 for. Deterministic given the key (the
    only randomness is the initial noise). Update rule, with
    lambda_t = log(alpha_t / sigma_t) (half log-SNR), h_i = lambda_i -
    lambda_{i-1}, r = h_{i-1} / h_i:

        D_i = (1 + 1/(2r)) x0_i - 1/(2r) x0_{i-1}          (first step: x0_i)
        x_i = (sigma_i / sigma_{i-1}) x_{i-1} - alpha_i (e^{-h_i} - 1) D_i

    The final step applies the same multistep update with t = 0 as the
    target: there sigma_0 = sqrt(beta_0) is the schedule's tiny noise
    floor rather than exactly zero, so x keeps a negligible
    (sig_0/sig_prev) carry of the previous state plus the second-order D
    term. Requires ``steps >= 2`` (a single step would never enter the
    update loop and return the initial Gaussian noise). Classifier
    guidance folds into eps before the x0 prediction, exactly as in
    :func:`diff_sample_ddim`. Returns NHWC BGR [0, 255] float32.
    """
    import numpy as np

    if steps < 2:
        raise ValueError(
            f"diff_sample_dpmpp needs steps >= 2 (multistep solver), got {steps}"
        )
    if classifier_y is None:
        classifier_y = y
    n = y.shape[0]
    h_, w_ = shape
    key, k0 = jax.random.split(key)
    x = jax.random.normal(k0, (n, h_, w_, 3), jnp.float32)
    T = diffusion.num_timesteps
    steps = min(steps, T)
    ts = np.ascontiguousarray(
        np.unique(np.linspace(0, T - 1, num=steps).round().astype(np.int64))[::-1]
    )
    # Schedule coefficients on the (static) subsequence. ``diffusion`` is a
    # traced pytree under jit, so these stay jnp scalars; the Python loop
    # below still unrolls statically over the subsequence.
    acp = diffusion.alphas_cumprod[jnp.asarray(ts)].astype(jnp.float32)
    alph = jnp.sqrt(acp)
    sig = jnp.sqrt(1.0 - acp)
    lam = jnp.log(alph / jnp.maximum(sig, 1e-20))

    def predict_x0(x, t):
        tb = jnp.full((n,), t, jnp.int32)
        eps = diff_model_apply(params, x, tb, y)
        x0 = diffusion.predict_x0_from_eps(x, tb, eps)
        if clip_x0:
            x0 = jnp.clip(x0, -1.0, 1.0)
        if classifier_params is not None and guidance_scale > 0.0:
            a_t = diffusion.alphas_cumprod[t]
            grad = _classifier_logprob_grad(classifier_params, x0, classifier_y)
            eps = eps - guidance_scale * jnp.sqrt(1.0 - a_t) * grad
            x0 = diffusion.predict_x0_from_eps(x, tb, eps)
            if clip_x0:
                x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    # Python loop over the (static, small) timestep subsequence: per-step
    # solver constants fold at trace time, and each iteration reuses the
    # previous iteration's model evaluation (the multistep trick — exactly
    # one model eval per step). x ends at ts[-1] = 0, where the remaining
    # sigma_0 ~ sqrt(beta_0) noise floor is negligible.
    q_prev = predict_x0(x, int(ts[0]))  # Q_0 at the noisiest time
    q_prev_prev = None
    for i in range(1, len(ts)):
        h_i = lam[i] - lam[i - 1]
        if q_prev_prev is None:
            D = q_prev  # first-order warmup step
        else:
            r = (lam[i - 1] - lam[i - 2]) / h_i
            D = (1.0 + 1.0 / (2.0 * r)) * q_prev - (1.0 / (2.0 * r)) * q_prev_prev
        x = (sig[i] / sig[i - 1]) * x - (alph[i] * jnp.expm1(-h_i)) * D
        if i < len(ts) - 1:
            q_prev_prev = q_prev
            q_prev = predict_x0(x, int(ts[i]))
    return jnp.clip((x + 1.0) * 127.5, 0.0, 255.0)
