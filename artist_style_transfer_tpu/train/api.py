"""``train()`` — the public training entry point.

Signature mirrors the reference ``train()`` kwargs exactly
(train_cnn.py:144-146): style_method, artist, num_epochs, batch_size,
content_data_size, seed, num_steps, content_weight, style_weight, lr,
save_every — plus keyword-only TPU-native extensions (mesh, dtype, paths,
and in-memory data hooks used by the tests).

Flow (reference call stack SURVEY §3.1, rebuilt):
  seed -> init TransformerNet -> load VGG (+classifier) -> content corpus to
  device -> style targets to device -> precompute content relu2_2 -> one
  jitted lax.scan per epoch -> checkpoints + loss bookkeeping.
"""

from __future__ import annotations

import os
import random as _random
import time

import jax
import jax.numpy as jnp
import numpy as np

from artist_style_transfer_tpu.models.resnet import ARTISTS_19
from artist_style_transfer_tpu.models.transformer import init_transformer_params
from artist_style_transfer_tpu.train import checkpoint as ckpt
from artist_style_transfer_tpu.train.loop import (
    epoch_permutation,
    make_optimizer,
    make_step_fns,
    precompute_content_relu2_2,
)
from artist_style_transfer_tpu.train.styles import MODES, build_style_targets
from artist_style_transfer_tpu.utils.logging import MetricLogger
from artist_style_transfer_tpu.utils.torch_import import (
    classifier_params_from_torch,
    load_torch_state_dict,
    vgg16_params_from_torch,
)


def train(
    style_method: str = "random",
    artist: str = "Albrecht_Dürer",
    num_epochs: int = 200,
    batch_size: int = 4,
    content_data_size: int = 256,
    seed: int = 2,
    num_steps: int = 2,
    content_weight: float = 17.0,
    style_weight: float = 25.0,
    lr: float = 0.0024,
    save_every: int = 10,
    *,
    train_size: int = 224,
    weight_decay: float = 1e-4,
    model_dir: str = "models",
    vgg_path: str = "models/vgg16-00b39a1b.pth",
    classifier_path: str = "models/best-2.pth",
    content_dir: str = "images/content/",
    archive_dir: str = "images/archive/",
    cache_dir: str = "dicts/",
    mesh=None,
    resume: bool = False,
    max_epochs_this_run: int | None = None,
    preview_every: int = 0,
    export_pth: bool = True,
    wordy: bool = True,
    # Streaming-corpus mode (corpus > HBM): a callable (epoch: int) ->
    # iterable of (B, H, W, 3) BGR [0,255] host batches. The corpus never
    # becomes device-resident; batches flow through
    # data.prefetch.device_prefetch (2 in flight, host->device DMA of batch
    # k+1 overlapping step k) into a per-batch jitted step that computes
    # content features in-graph. With a mesh, every yielded batch must be
    # divisible by the mesh size. content_data_size still sets
    # steps-per-epoch for the LR schedule.
    content_stream=None,
    # In-memory data/param hooks (tests + programmatic use); when provided,
    # the corresponding file/dataset loads are skipped.
    content_images: np.ndarray | None = None,
    paintings: np.ndarray | None = None,
    avg_image: np.ndarray | None = None,
    vgg_params=None,
    classifier_params=None,
    use_pallas: str | bool = "auto",
    compute_dtype: str = "float32",
    # Batch->H folded shallow layers: measured slower for TRAINING on chip
    # ("auto" -> off, see train/loop.py); explicit True keeps the
    # shard-mapped fold path exercisable (tests, future toolchains).
    fold_batch: str | bool = "auto",
    remat: bool = False,
    profile_dir: str | None = None,
    log_every_batches: int = 12,  # reference BATCH_INFO_EVERY (train_cnn.py:29)
    reference_typo_stats: bool = False,  # reproduce train_cnn.py:272's 0.546 G mean
    # Int8-MXU frozen-VGG loss path (ops/qconv.py): True = quantize the
    # compute-bound deep convs (conv3_1..conv4_3), "all" = every conv but
    # the stem. Targets, content features, and the train step all use the
    # same quantized extractor, so the loss stays a consistent metric.
    quantize_loss: bool | str = False,
    # Int8-MXU QAT transformer forward (models/transformer_qat.py): interior
    # convs run int8 fwd + int8 STE data gradient; weight gradients stay
    # exact real-dtype. True/'trunk' = the 12 quarter-res 128-channel convs
    # (the measured throughput win); 'all' = every interior conv (matches
    # the int8 serving numerics of infer.stylize_int8 most closely).
    qat: bool | str = False,
    # Int8-MXU grams for the deep (C>=256) style taps: 'auto' enables them
    # iff the loss extractor is quantized (quantize_loss) — the relu3_3
    # feature quant CSEs with conv4_1's input quant; False opts out, True
    # forces them with a bf16 extractor.
    quantize_gram: bool | str = "auto",
):
    """Train a TransformerNet for ``artist`` with the given style method.

    Returns (params, losses) where ``losses`` is the reference's
    (num_epochs, 3) array of per-epoch [content, style, total] sums
    (train_cnn.py:281, :376-378).
    """
    if style_method not in MODES:
        print("enter valid style method!")  # train_cnn.py:274
        return 0

    # Reference seeds all RNGs (train_cnn.py:147-151); our device-side
    # randomness derives from jax keys folded per epoch.
    np.random.seed(seed)
    _random.seed(seed)
    nprng = np.random.default_rng(seed)

    # Compute the checkpoint prefix BEFORE anything writes into the directory:
    # the reference's transfer_/transfer2_ choice keys off dir emptiness
    # (train_cnn.py:173-178).
    prefix = None
    if model_dir:
        if resume:
            # Probe both transfer_/transfer2_ stems for the newest checkpoint
            # (a 2nd run in this dir checkpoints under transfer2_).
            prefix = ckpt.resume_prefix(
                model_dir, artist, style_method, content_weight, style_weight
            )
        else:
            prefix = ckpt.save_dir_prefix(
                model_dir, artist, style_method, content_weight, style_weight, bump=True
            )

    log = MetricLogger(
        jsonl_path=os.path.join(model_dir, artist, style_method, "metrics.jsonl")
        if model_dir
        else None,
        stdout=wordy,
    )

    # --- Models -----------------------------------------------------------
    params = init_transformer_params(jax.random.key(seed))
    if vgg_params is None:
        vgg_params = vgg16_params_from_torch(load_torch_state_dict(vgg_path))
    if style_method == "classifier" and classifier_params is None:
        classifier_params = classifier_params_from_torch(load_torch_state_dict(classifier_path))
    if quantize_loss:
        from artist_style_transfer_tpu.models.vgg import quantize_vgg16_loss

        # Quantize ONCE here so style targets, the content relu2_2
        # precompute, and the train step all share the identical int8
        # extractor (the loss is then exactly zero at a perfect match).
        vgg_params = quantize_vgg16_loss(
            vgg_params,
            layers="deep" if quantize_loss is True else quantize_loss,
            dtype=jnp.dtype(compute_dtype),
        )
        # NOTE: classifier mode does NOT auto-quantize the frozen
        # classifier loss net. It is frozen here too (train_cnn.py:158)
        # and an int8 STE path exists (models/resnet_q.py — pass a
        # quantize_classifier() pytree as classifier_params to use it,
        # trajectory-tested), but it MEASURED SLOWER on chip: 606.9 vs
        # 662.0 img/s at b64/224 bf16 — 53 BN-interleaved convs pay a
        # dynamic quant/requant pass each in forward AND STE backward,
        # the same structural cost that closed QAT (BENCH_NOTES round 3).
        # The int8 classifier stays the dispatched win for the
        # forward-only eval pipeline (+72%). Also note quantize_loss
        # 'deep' has no effect on the VGG in this mode: the content loss
        # uses just_content (relu2_2 early exit, train_cnn.py:64-68),
        # which never reaches the quantized deep convs.

    # --- Content corpus (device-resident for the whole run) ----------------
    if content_stream is not None:
        content_data = None
        n_content = content_data_size
    else:
        if content_images is None:
            from artist_style_transfer_tpu.data.datasets import get_content_dataset

            if wordy:
                print("Getting content dataset!")  # train_cnn.py:168
            content_images = get_content_dataset(
                content_data_size, train_size, train_size, content_dir=content_dir, seed=seed
            )
        content_data = jnp.asarray(content_images, jnp.float32)
        n_content = content_data.shape[0]

    # --- Style targets ------------------------------------------------------
    if wordy:
        print("Getting style dataset and features!")  # train_cnn.py:180
    t0 = time.time()
    artist_index = ARTISTS_19.index(artist) if style_method == "classifier" else None
    if style_method in ("random", "cycle", "smartaverage") and paintings is None:
        from artist_style_transfer_tpu.data.datasets import get_painting_dataset

        corpus = get_painting_dataset(
            for_classifier=False,
            rescale_height=train_size,
            rescale_width=train_size,
            archive_dir=archive_dir,
            cache_dir=cache_dir,
        )
        paintings = corpus[artist]
    if style_method == "average" and avg_image is None:
        from artist_style_transfer_tpu.data.datasets import get_avg_dataset

        avg_image = get_avg_dataset(
            rescale_height=train_size, rescale_width=train_size,
            archive_dir=archive_dir, cache_dir=cache_dir,
        )[artist]

    targets = build_style_targets(
        style_method,
        vgg_params,
        artist,
        paintings=paintings,
        avg_image=avg_image,
        batch_size=batch_size,
        artist_index=artist_index,
        rng=nprng,
    )
    log.log("style_targets_built", mode=style_method, secs=round(time.time() - t0, 2))

    # --- Style preview (reference train_cnn.py:191-196) ---------------------
    if prefix is not None and targets.style_preview_bgr is not None:
        _save_style_jpg(
            os.path.dirname(prefix),
            targets.style_preview_bgr,
            second=os.path.basename(prefix).startswith("transfer2"),
        )

    # --- Multi-host: lift everything entering the global-mesh jit (directly
    # or closed into the step fns) to global replicated arrays. Committed
    # host-local arrays are rejected by a multi-process jit; passthrough
    # unless jax.process_count() > 1, so single-process meshes are untouched.
    if mesh is not None:
        from artist_style_transfer_tpu.parallel.distributed import make_global

        vgg_params = make_global(mesh, vgg_params)
        classifier_params = make_global(mesh, classifier_params)
        targets.grams = make_global(mesh, targets.grams)
        targets.labels = make_global(mesh, targets.labels)
        content_data = make_global(mesh, content_data)

    # --- Optimizer + compiled epoch ----------------------------------------
    # ceil: the ragged final batch is kept, like the reference DataLoader
    # (train_cnn.py:170); it counts as a step for the LR schedule too.
    steps_per_epoch = -(-n_content // batch_size)
    tx = make_optimizer(lr, weight_decay, num_epochs, num_steps, steps_per_epoch)
    opt_state = tx.init(params)
    fns = make_step_fns(
        style_method,
        vgg_params,
        classifier_params,
        targets,
        content_weight=content_weight,
        style_weight=style_weight,
        batch_size=batch_size,
        num_content=n_content,
        tx=tx,
        mesh=mesh,
        use_pallas=use_pallas,
        compute_dtype=compute_dtype,
        fold_batch=fold_batch,
        remat=remat,
        reference_typo_stats=reference_typo_stats,
        qat=qat,
        quantize_gram=quantize_gram,
    )

    content_r22 = None
    if content_data is not None:
        content_r22 = precompute_content_relu2_2(
            vgg_params,
            content_data,
            dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else None,
        )

    start_epoch = 0
    losses = np.full((num_epochs, 3), -1.0, np.float64)
    if resume and prefix is not None:
        found = ckpt.latest_checkpoint(prefix)
        if found is not None:
            path, _ = found
            restored = ckpt.restore_checkpoint(
                path,
                {"params": params, "completed": np.asarray(0, np.int64), "opt_state": opt_state},
            )
            params, opt_state = restored["params"], restored["opt_state"]
            start_epoch = int(restored["completed"])
            loss_path = path[: -len(".ckpt")] + ".npy"
            if os.path.exists(loss_path):
                prev = np.load(loss_path)
                n = min(len(prev), num_epochs)
                losses[:n] = prev[:n]
            log.log("resumed", checkpoint=path, epoch=start_epoch)

    if mesh is not None:
        # (passthrough when single-process; see make_global above)
        params = make_global(mesh, params)
        opt_state = make_global(mesh, opt_state)
        content_r22 = make_global(mesh, content_r22)

    grams = targets.grams
    labels = targets.labels

    # --- Epoch loop ---------------------------------------------------------
    if wordy:
        print("Training!")  # train_cnn.py:278
    run_start = time.time()
    end_epoch = num_epochs
    if max_epochs_this_run is not None:
        # Time-sliced training: stop early but keep the full-run LR schedule;
        # a later resume=True call continues seamlessly.
        end_epoch = min(num_epochs, start_epoch + max_epochs_this_run)
    profiling = False
    # Streaming mode: the step counter advances by the ACTUAL number of
    # streamed batches (which may differ from the content_data_size-derived
    # steps_per_epoch), so 'cycle' Gram indices never repeat or skip across
    # epochs. Resume seeds it from the nominal count (best effort — stream
    # lengths of past runs are unknown).
    stream_step = start_epoch * steps_per_epoch
    for epoch in range(start_epoch, end_epoch):
        if profile_dir and epoch == start_epoch + 1 and not profiling:
            # Trace the second epoch (first includes compilation) —
            # SURVEY §5 tracing/profiling equivalent.
            jax.profiler.start_trace(profile_dir)
            profiling = True
        t_ep = time.time()
        if content_stream is not None:
            params, opt_state, step_losses, epoch_images = _run_stream_epoch(
                fns, params, opt_state, content_stream, epoch,
                jnp.int32(stream_step), grams, labels, mesh,
            )
            stream_step += len(step_losses)
        else:
            base_step = jnp.int32(epoch * steps_per_epoch)
            perm = epoch_permutation(seed, epoch, n_content)
            params, opt_state, step_losses = fns.epoch_fn(
                params, opt_state, content_data, content_r22, grams, labels, perm, base_step
            )
            epoch_images = n_content  # exact even with a ragged tail batch
        step_losses = np.asarray(jax.device_get(step_losses), np.float64)
        el = step_losses.sum(axis=0)
        if profiling:
            jax.profiler.stop_trace()
            profiling = False
            log.log("profile_written", dir=profile_dir)
        losses[epoch] = el
        if log_every_batches:
            # Per-batch telemetry (reference prints losses every
            # BATCH_INFO_EVERY batches, train_cnn.py:355-357). The scan
            # already stacks per-step losses, so this costs nothing extra
            # on device; a NaN step is identifiable from metrics.jsonl.
            # range over the ACTUAL step count — a streamed epoch may run
            # more or fewer batches than the nominal steps_per_epoch.
            for s in range(0, len(step_losses), log_every_batches):
                log.log(
                    "batch",
                    epoch=epoch + 1,
                    batch=s + 1,
                    content_loss=float(step_losses[s, 0]),
                    style_loss=float(step_losses[s, 1]),
                    total_loss=float(step_losses[s, 2]),
                    stdout=False,
                )
        dt = time.time() - t_ep
        log.log(
            "epoch",
            epoch=epoch + 1,
            content_loss=float(el[0]),
            style_loss=float(el[1]),
            total_loss=float(el[2]),
            secs=round(dt, 3),
            images_per_sec=round(epoch_images / dt, 1),
        )
        if prefix is not None and save_every and epoch % save_every == 0:
            ckpt.save_checkpoint(prefix, epoch, params, opt_state, losses, completed_epochs=epoch + 1)
        if (
            prefix is not None and preview_every and epoch % preview_every == 0
            and content_data is not None
        ):
            # Content/Style/Transformed panel, written as a file — the
            # reference's live matplotlib preview (train_cnn.py:337-354)
            # without blocking the hot loop.
            from artist_style_transfer_tpu.infer.stylize import save_figure, stylize

            first = content_data[:1]
            out = np.asarray(jax.device_get(stylize(params, first)))[0]
            save_figure(
                os.path.join(os.path.dirname(prefix), f"preview_{epoch}.png"),
                np.asarray(jax.device_get(first))[0],
                out,
                targets.style_preview_bgr,
            )

    total = time.time() - run_start
    log.log("trained", secs=round(total, 2))  # train_cnn.py:387
    if prefix is not None:
        if end_epoch < num_epochs:
            # Early stop (time slice): persist the resume point.
            ckpt.save_checkpoint(
                prefix, end_epoch - 1, params, opt_state, losses, completed_epochs=end_epoch
            )
        else:
            ckpt.save_checkpoint(
                prefix, num_epochs, params, opt_state, losses, completed_epochs=num_epochs
            )
            ckpt.save_params_npz(f"{prefix}_{num_epochs}.npz", params)
            if export_pth:
                ckpt.export_pth(f"{prefix}_{num_epochs}.pth", params)
    log.close()
    return params, losses


def train_from_config(config, **overrides):
    """Run :func:`train` from a :class:`TrainConfig` dataclass.

    Config fields map 1:1 onto train() arguments; keyword overrides win.
    """
    from artist_style_transfer_tpu.utils.config import TrainConfig

    assert isinstance(config, TrainConfig)
    mesh = overrides.pop("mesh", None)
    if mesh is None and config.mesh_shape is not None:
        from artist_style_transfer_tpu.parallel import make_mesh

        mesh = make_mesh(shape=tuple(config.mesh_shape))
    kwargs = dict(
        style_method=config.style_method,
        artist=config.artist,
        num_epochs=config.num_epochs,
        batch_size=config.batch_size,
        content_data_size=config.content_data_size,
        seed=config.seed,
        num_steps=config.num_steps,
        content_weight=config.content_weight,
        style_weight=config.style_weight,
        lr=config.lr,
        save_every=config.save_every,
        train_size=config.train_size,
        weight_decay=config.weight_decay,
        model_dir=config.model_dir,
        compute_dtype=config.compute_dtype,
        log_every_batches=config.log_every_batches,
        # data_dir is the root of the reference's images/ layout
        # (dataset.py:12-13): content under <data_dir>/content/, the Kaggle
        # archive under <data_dir>/archive/.
        content_dir=os.path.join(config.data_dir, "content/"),
        archive_dir=os.path.join(config.data_dir, "archive/"),
        mesh=mesh,
    )
    kwargs.update(overrides)
    return train(**kwargs)


def _run_stream_epoch(
    fns, params, opt_state, content_stream, epoch, base_step, grams, labels, mesh
):
    """One epoch over a streamed corpus: host batches flow through
    device_prefetch (2 transfers in flight) into the per-batch jitted step.

    Loss scalars are fetched only after the epoch so steps stay async.
    """
    from artist_style_transfer_tpu.data.prefetch import device_prefetch

    sharding = None
    if mesh is not None:
        from artist_style_transfer_tpu.parallel.mesh import batch_sharding

        sharding = batch_sharding(mesh)
    out = []
    n_images = 0
    batches = (np.asarray(b, np.float32) for b in content_stream(epoch))
    for i, batch in enumerate(device_prefetch(batches, buffer_size=2, sharding=sharding)):
        n_images += int(batch.shape[0])
        params, opt_state, l3 = fns.stream_step_fn(
            params, opt_state, batch, grams, labels, base_step + i
        )
        out.append(l3)
    if not out:
        raise ValueError(f"content_stream yielded no batches for epoch {epoch}")
    losses = np.stack([np.asarray(jax.device_get(l)) for l in out])
    return params, opt_state, losses, n_images


def _save_style_jpg(directory: str, image_bgr_255: np.ndarray, second: bool = False) -> None:
    """Write style.jpg / style2.jpg like the reference (train_cnn.py:191-196)."""
    try:
        import cv2
    except ImportError:
        return
    name = "style2.jpg" if second else "style.jpg"
    cv2.imwrite(
        os.path.join(directory, name),
        np.clip(image_bgr_255, 0, 255).astype(np.uint8),
    )
