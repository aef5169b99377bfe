"""Diffusion training: epsilon-prediction MSE over artist-labeled paintings.

Standard DDPM objective; the corpus (paintings + artist labels) is the same
``get_painting_dataset(for_classifier=True)``-shaped data the classifier
pipeline uses, HBM-resident, with the whole epoch as one jitted
``lax.scan`` (same hot-loop architecture as train/loop.py).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from artist_style_transfer_tpu.diffusion.gaussian import GaussianDiffusion
from artist_style_transfer_tpu.diffusion.unet import diff_model_apply, init_diff_model
from artist_style_transfer_tpu.parallel.mesh import shard_batch
from artist_style_transfer_tpu.train.loop import epoch_permutation
from artist_style_transfer_tpu.utils.logging import MetricLogger


def train_diffusion(
    images_bgr_255: np.ndarray,  # (N, H, W, 3)
    labels: np.ndarray,  # (N,)
    *,
    num_classes: int = 19,
    num_timesteps: int = 1000,
    num_epochs: int = 10,
    batch_size: int = 16,
    lr: float = 1e-4,
    seed: int = 0,
    base_channels: int = 64,
    mesh=None,
    params: dict | None = None,
    wordy: bool = True,
    schedule: str = "linear",
    ema_decay: float | None = 0.999,
):
    """Train `diff_model`; returns (params, diffusion, losses[epoch]).

    ``ema_decay`` maintains an exponential moving average of the weights
    inside the jitted epoch (standard for diffusion sample quality); the
    returned params ARE the EMA weights (set ``ema_decay=None`` for raw).
    ``schedule`` selects the beta schedule ('linear' or 'cosine').
    """
    log = MetricLogger(None, stdout=wordy)
    diffusion = GaussianDiffusion.make(num_timesteps, schedule=schedule)
    if params is None:
        params = init_diff_model(
            jax.random.key(seed), num_classes=num_classes, base_channels=base_channels
        )

    data = jnp.asarray(images_bgr_255, jnp.float32) / 127.5 - 1.0  # [-1, 1]
    y_all = jnp.asarray(labels, jnp.int32)
    n = data.shape[0]
    steps_per_epoch = n // batch_size
    if steps_per_epoch == 0:
        raise ValueError("fewer images than batch_size")

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p, x0, y, key):
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (x0.shape[0],), 0, num_timesteps)
        noise = jax.random.normal(kn, x0.shape, x0.dtype)
        x_t = diffusion.q_sample(x0, t, noise)
        eps = diff_model_apply(p, x_t, t, y)
        return jnp.mean(jnp.square(eps - noise))

    grad_fn = jax.value_and_grad(loss_fn)

    @jax.jit
    def epoch_fn(params, ema, opt_state, perm, key):
        def body(carry, i):
            params, ema, opt_state, key = carry
            key, kstep = jax.random.split(key)
            idx = jax.lax.dynamic_slice_in_dim(perm, i * batch_size, batch_size)
            x0 = shard_batch(jnp.take(data, idx, axis=0), mesh)
            y = shard_batch(jnp.take(y_all, idx, axis=0), mesh)
            loss, grads = grad_fn(params, x0, y, kstep)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema_decay is not None:
                ema = jax.tree.map(
                    lambda e, p: e * ema_decay + p * (1.0 - ema_decay), ema, params
                )
            return (params, ema, opt_state, key), loss

        (params, ema, opt_state, _), losses = jax.lax.scan(
            body, (params, ema, opt_state, key), jnp.arange(steps_per_epoch)
        )
        return params, ema, opt_state, jnp.mean(losses)

    ema = params if ema_decay is not None else params  # same pytree either way
    losses = np.zeros((num_epochs,), np.float64)
    for epoch in range(num_epochs):
        t0 = time.time()
        perm = epoch_permutation(seed, epoch, n)
        key = jax.random.fold_in(jax.random.key(seed + 1), epoch)
        params, ema, opt_state, loss = epoch_fn(params, ema, opt_state, perm, key)
        losses[epoch] = float(jax.device_get(loss))
        log.log("diffusion_epoch", epoch=epoch + 1, loss=losses[epoch], secs=round(time.time() - t0, 2))
    return (ema if ema_decay is not None else params), diffusion, losses
