"""Artist-classifier training — the workflow that produced ``models/best-2.pth``.

The reference repo only *consumes* a pretrained ResNet-50 artist classifier
(``/root/reference/classifier.py:62-63``); the model itself was trained in the
upstream Kaggle notebook the reference credits (``/root/reference/README.md:34-35``,
"~90.2%"). This module closes that loop TPU-natively, so a user without the
Google-Drive artifact can produce an equivalent classifier from the painting
corpus:

- fastai-style transfer learning: ``freeze_body=True`` trains the head plus
  every BatchNorm affine (fastai ``freeze()``'s ``train_bn=True`` default),
  ``freeze_body=False`` fine-tunes everything;
- one-cycle cosine LR schedule (``optax.cosine_onecycle_schedule`` — the
  fastai ``fit_one_cycle`` recipe) or a constant-LR ``fit``;
- optional in-graph augmentation (:func:`augment_batch`: random flip +
  random crop, compiled into the training step — no host-side image ops);
- training-mode BN via :func:`models.resnet.classifier_apply_train`, with
  torch-momentum running-stat updates. Under a data-parallel mesh the batch
  stats are *global*-batch stats automatically (GSPMD turns the BN reductions
  into cross-device all-reduces);
- best-validation-accuracy checkpointing (the reference artifact is literally
  named ``best-2.pth`` — fastai's ``SaveModelCallback`` naming) and export of
  a reference-loadable ``{'model': state_dict}`` ``.pth``.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from artist_style_transfer_tpu.models.resnet import (
    classifier_apply,
    classifier_apply_train,
    init_classifier_params,
    update_running_stats,
)
from artist_style_transfer_tpu.parallel.mesh import (
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from artist_style_transfer_tpu.train.loop import epoch_permutation
from artist_style_transfer_tpu.utils.logging import MetricLogger


def trainable_labels(params: dict, freeze_body: bool) -> dict:
    """'train'/'freeze' label pytree for ``optax.multi_transform``.

    BN running statistics are never gradient-trained (they update through
    :func:`update_running_stats`). With ``freeze_body=True`` the body's conv
    weights are frozen but every BN affine stays trainable — fastai's
    ``freeze()`` keeps norm layers training (``train_bn=True``), the stage-1
    recipe behind the upstream ~90.2% model.
    """

    def f(path, _leaf):
        parts = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        if parts[-1] in ("mean", "var"):
            return "freeze"
        if not freeze_body:
            return "train"
        if parts[0] == "head":
            return "train"
        return "train" if parts[-1] in ("gamma", "beta") else "freeze"

    return jax.tree_util.tree_map_with_path(f, params)


def weight_decay_mask(params) -> dict:
    """True only for conv/linear weight matrices ('w' leaves).

    fastai's ``Learner`` default ``wd_bn_bias=False`` excludes norm-layer
    affines and biases from weight decay; this mask reproduces that for the
    ``optax.adamw`` decay term. Path-based, so it also works on the
    ``MaskedNode`` pytrees ``optax.multi_transform`` hands the inner
    transform.
    """

    def f(path, _leaf):
        parts = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        return parts[-1] == "w"

    return jax.tree_util.tree_map_with_path(f, params)


def make_classifier_optimizer(
    params: dict,
    lr: float,
    total_steps: int,
    weight_decay: float,
    freeze_body: bool,
    schedule: str = "onecycle",
) -> optax.GradientTransformation:
    """AdamW over the trainable subset; ``schedule`` picks the LR policy:
    'onecycle' (fastai ``fit_one_cycle``, the upstream recipe) or 'constant'
    (fastai ``fit``)."""
    if schedule == "constant":
        sched = optax.constant_schedule(lr)
    elif schedule == "onecycle":
        sched = optax.cosine_onecycle_schedule(
            transition_steps=max(total_steps, 1), peak_value=lr, pct_start=0.25
        )
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    return optax.multi_transform(
        {"train": optax.adamw(sched, weight_decay=weight_decay,
                              mask=weight_decay_mask),
         "freeze": optax.set_to_zero()},
        trainable_labels(params, freeze_body),
    )


def augment_batch(key: jax.Array, x: jax.Array, pad: int = 8) -> jax.Array:
    """Jit-compiled train-time augmentation: per-image random horizontal
    flip + random crop from a reflect-padded canvas (the flip/zoom core of
    the fastai ``get_transforms()`` recipe the upstream notebook used).

    Static shapes throughout — the random crop is a vmapped
    ``lax.dynamic_slice`` over per-image offsets, so the whole thing lives
    inside the training step's compiled graph (no host-side image ops).
    """
    kf, kh, kw = jax.random.split(key, 3)
    n, h, w, c = x.shape
    flip = jax.random.bernoulli(kf, 0.5, (n,))
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    oh = jax.random.randint(kh, (n,), 0, 2 * pad + 1)
    ow = jax.random.randint(kw, (n,), 0, 2 * pad + 1)

    def crop(img, yoff, xoff):
        return jax.lax.dynamic_slice(img, (yoff, xoff, 0), (h, w, c))

    return jax.vmap(crop)(xp, oh, ow)


def _split_train_val(n: int, val_fraction: float, seed: int):
    """Deterministic shuffled index split (validation first, like fastai's
    ``RandomSplitter``)."""
    perm = np.random.default_rng(seed).permutation(n)
    n_val = int(round(n * val_fraction))
    return perm[n_val:], perm[:n_val]


@jax.jit
def _predict(params: dict, x: jax.Array) -> jax.Array:
    return jnp.argmax(classifier_apply(params, x), axis=-1)


def evaluate_classifier(
    params: dict, images, labels, batch_size: int = 64, mesh=None
) -> float:
    """Inference-mode accuracy over ``(images, labels)``.

    Batched with one ragged tail at its own static shape (same jit-shape
    policy as the training loop). The jitted predictor is module-level so
    per-epoch validation reuses one compiled executable per batch shape.
    """
    infer = _predict
    n = images.shape[0]
    correct = 0
    for start in range(0, n, batch_size):
        xb = jnp.asarray(images[start: start + batch_size])
        divisible = mesh is not None and xb.shape[0] % mesh.devices.size == 0
        xb = shard_batch(xb, mesh if divisible else None)
        pred = np.asarray(infer(params, xb))
        correct += int((pred == np.asarray(labels[start: start + batch_size])).sum())
    return correct / max(n, 1)


def train_classifier(
    images,
    labels,
    *,
    num_classes: int = 19,
    num_epochs: int = 8,
    batch_size: int = 32,
    lr: float = 1e-3,
    weight_decay: float = 1e-2,
    freeze_body: bool = True,
    schedule: str = "onecycle",
    augment: bool = False,
    bn_momentum: float = 0.1,
    val_fraction: float = 0.2,
    seed: int = 2,
    params: dict | None = None,
    mesh=None,
    wordy: bool = True,
    metrics_path: str | None = None,
) -> tuple[dict, dict]:
    """Train the artist classifier; returns ``(best_params, history)``.

    ``images``: (N, H, W, 3) float32 RGB torchvision-normalized NHWC —
    exactly what ``data.get_painting_dataset(for_classifier=True)`` yields
    (reference dataset.py:201-221 semantics). ``labels``: (N,) int artist
    indices. ``params=None`` starts from random init; pass an imported
    pytree (``utils.torch_import.classifier_params_from_torch``) to
    fine-tune a pretrained model instead.

    ``best_params`` is the highest-validation-accuracy snapshot (ties: the
    earliest), falling back to the final params when there is no validation
    split. ``history`` has per-epoch train loss/acc and val acc.
    """
    images = np.asarray(images, np.float32)
    labels = np.asarray(labels, np.int32)
    n = images.shape[0]
    train_idx, val_idx = _split_train_val(n, val_fraction, seed)
    if len(train_idx) < batch_size:
        raise ValueError(
            f"train split ({len(train_idx)}) smaller than batch_size ({batch_size})"
        )
    steps_per_epoch = len(train_idx) // batch_size  # drop-last, fastai-style

    if mesh is not None and batch_size % mesh.devices.size != 0:
        raise ValueError(
            f"batch_size ({batch_size}) must divide over the "
            f"{mesh.devices.size}-device mesh"
        )
    if params is None:
        params = init_classifier_params(jax.random.key(seed), num_classes)
    else:
        # The epoch step donates its param buffers; copy so the caller's
        # pytree stays alive.
        params = jax.tree.map(lambda a: jnp.array(a, copy=True), params)
    tx = make_classifier_optimizer(
        params, lr, num_epochs * steps_per_epoch, weight_decay, freeze_body,
        schedule,
    )
    rep = replicated_sharding(mesh) if mesh is not None else None
    if rep is not None:
        params = jax.device_put(params, rep)
    opt_state = tx.init(params)

    # Device-resident corpus, replicated across the mesh; each epoch is ONE
    # compiled lax.scan (the style trainer's zero-host-traffic design,
    # train/loop.py) — batches gather in-graph from the permutation, the
    # only per-epoch host traffic is the permutation upload and the scalar
    # metric fetch.
    corpus = jax.device_put(jnp.asarray(images[train_idx]), rep)
    corpus_labels = jax.device_put(jnp.asarray(labels[train_idx]), rep)
    val_images, val_labels = images[val_idx], labels[val_idx]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch_fn(params, opt_state, corpus, corpus_labels, perm, epoch_idx, aug_key):
        def body(carry, s):
            params, opt_state = carry
            idx = jax.lax.dynamic_slice_in_dim(perm, s * batch_size, batch_size)
            xb = jnp.take(corpus, idx, axis=0)
            yb = jnp.take(corpus_labels, idx, axis=0)
            if mesh is not None:
                xb = jax.lax.with_sharding_constraint(xb, batch_sharding(mesh))
            if augment:
                key = jax.random.fold_in(
                    aug_key, epoch_idx * steps_per_epoch + s
                )
                xb = augment_batch(key, xb)

            def loss_fn(p):
                logits, stats = classifier_apply_train(p, xb)
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits, yb
                ).mean()
                acc = jnp.mean((jnp.argmax(logits, -1) == yb).astype(jnp.float32))
                return loss, (stats, acc)

            (loss, (stats, acc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = update_running_stats(params, stats, bn_momentum)
            return (params, opt_state), (loss, acc)

        (params, opt_state), (losses, accs) = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps_per_epoch)
        )
        return params, opt_state, jnp.mean(losses), jnp.mean(accs)

    log = MetricLogger(metrics_path, stdout=wordy)
    history: dict = {"train_loss": [], "train_acc": [], "val_acc": []}
    best_acc, best_params = -1.0, None
    # Augmentation stream: deterministic from (seed, global step), disjoint
    # from the init key (seed) and the shuffle stream (epoch_permutation).
    aug_key = jax.random.key(seed + 0x5EED)
    for epoch in range(num_epochs):
        t0 = time.time()
        perm = jnp.asarray(np.asarray(epoch_permutation(seed, epoch, len(train_idx))))
        params, opt_state, ep_loss, ep_acc = epoch_fn(
            params, opt_state, corpus, corpus_labels, perm,
            jnp.int32(epoch), aug_key,
        )
        ep_loss, ep_acc = float(ep_loss), float(ep_acc)
        val_acc = (
            evaluate_classifier(params, val_images, val_labels, batch_size, mesh)
            if len(val_idx)
            else float("nan")
        )
        history["train_loss"].append(ep_loss)
        history["train_acc"].append(ep_acc)
        history["val_acc"].append(val_acc)
        log.log(
            "classifier_epoch", epoch=epoch, train_loss=ep_loss,
            train_acc=ep_acc, val_acc=val_acc, secs=time.time() - t0,
        )
        # fastai SaveModelCallback: keep the best-validation snapshot.
        # Copied: the next epoch donates the live params' buffers.
        if len(val_idx) and val_acc > best_acc:
            best_acc = val_acc
            best_params = jax.tree.map(jnp.copy, params)
    log.close()
    if best_params is None:
        best_params = params
    return best_params, history


def main(argv=None):
    import argparse
    import os

    from artist_style_transfer_tpu.data.datasets import get_painting_dataset
    from artist_style_transfer_tpu.train.checkpoint import (
        export_classifier_pth,
        save_params_npz,
    )

    ap = argparse.ArgumentParser(
        description="Train the ResNet-50 artist classifier on the painting corpus "
        "(the upstream workflow behind models/best-2.pth)."
    )
    ap.add_argument("--num_epochs", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--weight_decay", type=float, default=1e-2)
    ap.add_argument("--unfreeze", action="store_true",
                    help="fine-tune the whole body (default: head+BN only)")
    ap.add_argument("--schedule", choices=("onecycle", "constant"),
                    default="onecycle",
                    help="LR policy: fastai fit_one_cycle (default) or fit")
    ap.add_argument("--augment", action="store_true",
                    help="in-graph train-time augmentation (random flip + "
                    "random crop from a reflect-padded canvas)")
    ap.add_argument("--val_fraction", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=2)
    ap.add_argument("--rescale_height", type=int, default=256)
    ap.add_argument("--rescale_width", type=int, default=256)
    ap.add_argument("--init_pth", default=None,
                    help="warm-start from an existing classifier .pth")
    ap.add_argument("--out_dir", default="models")
    ap.add_argument("--overwrite", action="store_true",
                    help="allow overwriting an existing best-2.pth")
    ap.add_argument("--data_parallel", action="store_true",
                    help="shard batches over all local devices (batch_size "
                    "must divide the device count)")
    ap.add_argument("--metrics", default=None, help="JSONL metrics path")
    args = ap.parse_args(argv)

    from artist_style_transfer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    mesh = None
    if args.data_parallel:
        from artist_style_transfer_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    images, labels = get_painting_dataset(
        for_classifier=True,
        rescale_height=args.rescale_height,
        rescale_width=args.rescale_width,
        wordy=True,
    )
    params = None
    if args.init_pth:
        from artist_style_transfer_tpu.utils.torch_import import (
            classifier_params_from_torch,
            load_torch_state_dict,
        )

        params = classifier_params_from_torch(load_torch_state_dict(args.init_pth))
    best, history = train_classifier(
        images, labels,
        num_epochs=args.num_epochs, batch_size=args.batch_size, lr=args.lr,
        weight_decay=args.weight_decay, freeze_body=not args.unfreeze,
        schedule=args.schedule, augment=args.augment,
        val_fraction=args.val_fraction, seed=args.seed, params=params,
        mesh=mesh, metrics_path=args.metrics,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    pth = os.path.join(args.out_dir, "best-2.pth")
    if os.path.exists(pth) and not args.overwrite:
        # Never clobber an existing artifact by default — best-2.pth is the
        # pretrained checkpoint every other subsystem loads.
        pth = os.path.join(args.out_dir, "best-2-retrained.pth")
        print(f"best-2.pth exists; writing {pth} (use --overwrite to replace)")
    export_classifier_pth(pth, best)
    save_params_npz(os.path.join(args.out_dir, "classifier.npz"), best)
    if args.val_fraction > 0:
        print(f"best val acc {max(history['val_acc']):.4f}; exported {pth}")
    else:
        print(
            f"no validation split; final train acc "
            f"{history['train_acc'][-1]:.4f}; exported {pth}"
        )


if __name__ == "__main__":
    main()
