"""Gaussian diffusion process: schedules, q-sampling, posterior — all jit-safe.

Standard DDPM (Ho et al. 2020) with the linear beta schedule used by guided
diffusion. Everything is precomputed as (T,) arrays gathered by timestep
inside jit.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _extract(arr: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep coefficients and broadcast to image rank."""
    out = arr[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Precomputed diffusion coefficients for T steps (pytree of arrays)."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    @staticmethod
    def make(
        num_timesteps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        schedule: str = "linear",
    ):
        """Build coefficient tables for T steps.

        ``schedule``: 'linear' (DDPM, Ho et al. 2020) or 'cosine'
        (improved-DDPM, Nichol & Dhariwal 2021: alpha-bar follows
        cos^2((t/T + s)/(1 + s) * pi/2), s = 0.008, betas clipped at 0.999
        — better sample quality at low step counts for small images, which
        is exactly the painting-corpus regime).
        """
        if schedule == "cosine":
            s = 0.008
            steps = np.arange(num_timesteps + 1, dtype=np.float64)
            f = np.cos((steps / num_timesteps + s) / (1.0 + s) * np.pi / 2.0) ** 2
            acp_full = f / f[0]
            betas = np.clip(1.0 - acp_full[1:] / acp_full[:-1], 0.0, 0.999)
        elif schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)
        else:
            raise ValueError(f"unknown schedule {schedule!r}")
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        # log-variance clipped at t=0 as in DDPM (variance 0 there)
        post_logvar = np.log(np.append(post_var[1], post_var[1:]))
        f = lambda a: jnp.asarray(a, jnp.float32)
        return GaussianDiffusion(
            betas=f(betas),
            alphas_cumprod=f(acp),
            sqrt_alphas_cumprod=f(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f(np.sqrt(1.0 - acp)),
            sqrt_recip_alphas_cumprod=f(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=f(np.sqrt(1.0 / acp - 1.0)),
            posterior_variance=f(post_var),
            posterior_log_variance=f(post_logvar),
            posterior_mean_coef1=f(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        )

    def q_sample(self, x0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """Forward process: x_t = sqrt(acp_t) x0 + sqrt(1-acp_t) eps."""
        return (
            _extract(self.sqrt_alphas_cumprod, t, x0.ndim) * x0
            + _extract(self.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * noise
        )

    def predict_x0_from_eps(self, x_t: jax.Array, t: jax.Array, eps: jax.Array) -> jax.Array:
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
        )

    def q_posterior_mean(self, x0: jax.Array, x_t: jax.Array, t: jax.Array) -> jax.Array:
        return (
            _extract(self.posterior_mean_coef1, t, x0.ndim) * x0
            + _extract(self.posterior_mean_coef2, t, x0.ndim) * x_t
        )


jax.tree_util.register_dataclass(
    GaussianDiffusion,
    data_fields=[f.name for f in dataclasses.fields(GaussianDiffusion)],
    meta_fields=[],
)
