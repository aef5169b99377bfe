"""The jitted training hot loop (reference train_cnn.py:282-359, rebuilt TPU-first).

Key differences from the reference's eager loop:

- One ``lax.scan`` per epoch: data indexing, forward, VGG, losses, backward,
  Adam update, and LR schedule are a single compiled XLA program. No host
  sync, no per-step dispatch, no ``plt.pause`` blocking the loop
  (train_cnn.py:337-357).
- The content corpus is HBM-resident; batches are gathers of a
  per-epoch permutation (deterministic from (seed, epoch) — SURVEY §5
  failure recovery). The reference copies each batch host->device per step
  (train_cnn.py:298).
- Content relu2_2 features are precomputed once per run — they are
  constants of the optimization (the reference recomputes
  ``VGG(content_batch)`` every step, train_cnn.py:300).
- 'cycle' Gram targets are indexed in-graph (``step % P``); the reference
  re-uploads a CPU-stored Gram dict every step (train_cnn.py:218, :323).
- Optimizer: optax chain reproducing torch ``Adam(lr, weight_decay)``
  (L2-into-gradient, eps outside the sqrt) + StepLR(gamma=0.5) semantics
  (train_cnn.py:247-248).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from artist_style_transfer_tpu.models.transformer import transformer_apply
from artist_style_transfer_tpu.models.vgg import (
    fold_batch_ok,
    vgg16_features,
    vgg_is_quantized,
)
from artist_style_transfer_tpu.models.resnet import classifier_apply
from artist_style_transfer_tpu.ops.image import (
    bgr_to_rgb,
    torchvision_normalize,
    vgg_caffe_preprocess,
)
from artist_style_transfer_tpu.ops.losses import (
    content_loss,
    cross_entropy_loss,
    style_loss_gram,
)
from artist_style_transfer_tpu.ops.precision import get_precision
from artist_style_transfer_tpu.parallel.mesh import shard_batch, spatial_size
from artist_style_transfer_tpu.train.styles import StyleTargets, select_step_grams


def make_optimizer(
    lr: float,
    weight_decay: float,
    num_epochs: int,
    num_steps: int,
    steps_per_epoch: int,
) -> optax.GradientTransformation:
    """torch Adam(lr, weight_decay) + StepLR(num_epochs//num_steps, 0.5).

    torch Adam folds weight decay into the gradient *before* the moment
    update (not AdamW), and applies eps outside the sqrt — hence
    ``add_decayed_weights`` first and ``eps_root=0``. StepLR steps per
    *epoch* (train_cnn.py:375); expressed here per optimizer step.
    """
    decay_every = max(1, (num_epochs // max(1, num_steps)) * steps_per_epoch)

    def schedule(step):
        return lr * 0.5 ** (step // decay_every)

    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0),
        optax.scale_by_learning_rate(schedule),
    )


# mesh -> measured max relative wgrad error of the minimal spatial repro
# (see spatial_wgrad_selfcheck); each mesh is probed once per process.
_SPATIAL_WGRAD_CACHE: dict = {}

# Reduction-order noise between the sharded and replicated gradients is
# ~1e-6 relative; the diagnosed miscompile is ~2-3 relative. Anything in
# between would be a new bug — refuse it too.
_SPATIAL_WGRAD_TOL = 0.05


def spatial_wgrad_selfcheck(mesh) -> float:
    """Max relative weight-gradient error of the minimal spatial-sharding repro.

    The ROADMAP repro of the round-2 XLA:CPU GSPMD bug: ``grad of
    mean(conv2d(x, w)**2)`` (k=3 SAME, NHWC) with x's H axis sharded over
    the mesh's 'space' axis, compared against the replicated gradient.
    Forward and data gradient are exact everywhere; on the buggy CPU
    backend the WEIGHT gradient comes back ~3x wrong. Returns ~0 on a
    correct backend. Cheap (a 4-channel 3x3 conv), run once per mesh.
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from artist_style_transfer_tpu.parallel.mesh import spatial_size as _ssize

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((1, 8 * _ssize(mesh), 8, 4)).astype(np.float32)
    w_np = rng.standard_normal((3, 3, 4, 4)).astype(np.float32)

    def loss(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.mean(y * y)

    grad = jax.jit(jax.grad(loss, argnums=1))
    dw_ref = np.asarray(grad(jnp.asarray(x_np), jnp.asarray(w_np)))
    # make_array_from_callback (each process supplies its addressable
    # shards) instead of device_put of a host array: on a multi-PROCESS
    # mesh device_put to a sharding spanning non-addressable devices
    # raises, and real multihost TPU is exactly where this gate must run.
    xs = NamedSharding(mesh, P(None, "space"))
    ws = NamedSharding(mesh, P())
    x_sh = jax.make_array_from_callback(x_np.shape, xs, lambda idx: x_np[idx])
    w_rep = jax.make_array_from_callback(w_np.shape, ws, lambda idx: w_np[idx])
    # out replicated => every process can read the full gradient
    dw_sh = np.asarray(
        jax.jit(jax.grad(loss, argnums=1), out_shardings=ws)(x_sh, w_rep)
    )
    return float(np.max(np.abs(dw_sh - dw_ref)) / (np.max(np.abs(dw_ref)) + 1e-12))


def _require_spatial_training(mesh) -> None:
    """Refuse 'space'>1 training meshes whose backend miscompiles the wgrad.

    CPU backends are refused outright (the diagnosed XLA:CPU GSPMD
    miscompile — dw off ~3x for k>1 convs with H sharded; forward, dgrad,
    k=1 all exact). Other backends (real multi-chip TPU, where spatial
    partitioning is mature) run :func:`spatial_wgrad_selfcheck` once and
    are enabled iff the repro's gradients match — no source edit needed on
    correct hardware, and a regressed toolchain still refuses rather than
    training with silently wrong gradients.
    """
    platform = mesh.devices.flat[0].platform
    if platform == "cpu":
        raise NotImplementedError(
            "training over a mesh with a 'space'>1 axis is not supported on "
            "the CPU backend: XLA:CPU GSPMD miscompiles halo'd conv weight "
            "gradients (diagnosed round 2; spatial_wgrad_selfcheck "
            "reproduces it). Use a pure 'data' mesh; spatial sharding is "
            "inference-only here (infer.stylize_spatial)."
        )
    err = _SPATIAL_WGRAD_CACHE.get(mesh)
    if err is None:
        err = spatial_wgrad_selfcheck(mesh)
        _SPATIAL_WGRAD_CACHE[mesh] = err
    if err > _SPATIAL_WGRAD_TOL:
        raise NotImplementedError(
            f"training over a 'space'>1 mesh is disabled on this backend "
            f"({platform}): the spatial wgrad self-check measured "
            f"{err:.3g} relative error (tolerance {_SPATIAL_WGRAD_TOL}) — "
            "the halo'd conv weight-gradient miscompile is present; "
            "refusing to train with silently wrong gradients."
        )


@dataclasses.dataclass(frozen=True)
class StepFns:
    """Compiled train-epoch and preview functions for one configuration."""

    # (params, opt_state, data, r22, grams, labels, perm, base_step)
    #   -> (params, opt_state, per-step (steps_per_epoch, 3) loss stack)
    epoch_fn: Callable
    loss_fn: Callable
    steps_per_epoch: int
    # Streaming-corpus step (corpus > HBM): (params, opt_state, batch,
    # grams, labels, step) -> (params, opt_state, (3,) losses). The batch
    # arrives from data.prefetch.device_prefetch; its relu2_2 content
    # features are computed in-graph (they cannot be precomputed when the
    # corpus streams through).
    stream_step_fn: Callable | None = None
    # AOT lowering of the epoch under the same signature as epoch_fn:
    # epoch_lower(*args).compile().memory_analysis() gives HBM sizing
    # WITHOUT executing — the only safe way to probe batch limits on the
    # relayed TPU backend (an actual OOM hangs the relay for hours).
    epoch_lower: Callable | None = None


def make_step_fns(
    mode: str,
    vgg_params,
    classifier_params,
    targets: StyleTargets,
    *,
    content_weight: float,
    style_weight: float,
    batch_size: int,
    num_content: int,
    tx: optax.GradientTransformation,
    mesh=None,
    use_pallas: str | bool = "auto",
    compute_dtype: str = "float32",
    remat: bool = False,
    reference_typo_stats: bool = False,
    fold_batch: str | bool = "auto",
    qat: bool | str = False,
    quantize_gram: bool | str = "auto",
) -> StepFns:
    """Build the jitted epoch function for a training configuration.

    Static configuration (mode, weights, shapes) is closed over; dynamic
    state (params, optimizer state, data, permutation, step counter) flows
    through arguments so one compilation serves the whole run.

    ``compute_dtype='bfloat16'`` runs the forward/backward in bf16 (mixed
    precision: master params, optimizer state, and loss reductions stay
    f32) — the throughput mode; 'float32' is the parity mode.
    """
    # Partial final batch: the reference DataLoader keeps it
    # (train_cnn.py:170, drop_last defaults False), so when batch_size does
    # not divide the corpus the epoch runs floor(N/B) full steps in the scan
    # plus ONE ragged step jitted at its own static shape (compiled once per
    # run — shapes stay static, no masking needed, and the MSE mean
    # normalizes by the true ragged size exactly like torch).
    steps_full = num_content // batch_size
    num_tail = num_content % batch_size
    steps_per_epoch = steps_full + (1 if num_tail else 0)
    if steps_full == 0:
        raise ValueError(
            f"content_data_size={num_content} < batch_size={batch_size}"
        )
    if spatial_size(mesh) > 1:
        # Refuse CPU (diagnosed XLA:CPU GSPMD wgrad miscompile, round 2);
        # self-check other backends once per mesh and enable iff the
        # minimal repro's gradients match (see _require_spatial_training).
        _require_spatial_training(mesh)
    just_content = mode == "classifier"
    cdtype = jnp.dtype(compute_dtype)
    # Batch->H folding of the shallow VGG + transformer layers (see
    # models.vgg._vgg16_features_folded / models.transformer
    # ._transformer_apply_folded): numerically exact, but measured a 3x
    # LOSS for the train step on the real chip (see the "auto" gate
    # below), so it is opt-in here. Single-device it applies directly;
    # under a multi-device mesh the fold's (N,...)->(1,N*B,...) reshape
    # would merge the DP-sharded batch axis into H (GSPMD resolves that
    # with gathers), so the gradient is instead computed under
    # ``shard_map`` and each device folds its LOCAL batch shard — same
    # math (per-image norms, equal-size shards => pmean of per-shard mean
    # losses/grads == global mean), same per-chip layout.
    if fold_batch == "auto":
        # Measured on the real chip: FULL fold (b96/224 bf16 'cycle') 235
        # img/s vs 710 direct; 'vgg'-only fold (b128/224 bf16 + int8 deep
        # loss, round 3) 484.7 vs 867.9 direct. Both LOSE big: even with
        # zero-separator folds (whose fold/unfold VJP is pad/slice, no
        # scatters) the folded blocks' batch-1 BACKWARD convs hit their own
        # N=1 layout pathology, swamping the forward layout win the
        # stylize/eval paths enjoy. Training therefore defaults to the
        # direct path; both fold modes remain available explicitly (and the
        # fold stays the dispatched win for forward-only stylize/eval).
        fold_batch = False
    # fold_mode: False = direct; True = fold transformer + VGG shallow
    # blocks; 'vgg' = fold only the VGG loss branch (transformer direct).
    fold_mode = fold_batch if fold_batch in (True, "vgg") else False
    fold_global = fold_mode if _mesh_size(mesh) == 1 else False
    use_shmap = (
        bool(fold_mode)
        and _mesh_size(mesh) > 1
        and batch_size % mesh.devices.size == 0
    )
    # Quantized (int8) loss-path VGG params pass through untouched: their
    # int8/scale leaves must not be cast, and their real-unit leaves were
    # already materialized in the compute dtype by quantize_vgg16_loss.
    vgg_quant = vgg_is_quantized(vgg_params)
    # Int8-MXU grams for the deep (C>=256) taps: rides along with the
    # quantized loss extractor by default (the relu3_3 feature quant is
    # shared with conv4_1's input quant by CSE — see ops.gram
    # .gram_matrix_int8); the bf16/f32 parity path is untouched.
    if quantize_gram == "auto":
        quantize_gram = vgg_quant
    vgg_compute = (
        jax.tree.map(lambda a: a.astype(cdtype), vgg_params)
        if cdtype != jnp.float32 and not vgg_quant
        else vgg_params
    )
    # Classifier-mode loss net: like the VGG, the frozen classifier's
    # weights follow the compute dtype (conv operands must agree). The
    # quantized pytree (models/resnet_q.quantize_classifier) is left
    # untouched — its int8 weights / f32 scales / folded-BN biases are
    # dtype-exact already.
    from artist_style_transfer_tpu.models.resnet_q import classifier_is_quantized

    clf_compute = (
        jax.tree.map(lambda a: a.astype(cdtype), classifier_params)
        if (
            classifier_params is not None
            and cdtype != jnp.float32
            and not classifier_is_quantized(classifier_params)
        )
        else classifier_params
    )
    if fold_mode and vgg_quant:
        from artist_style_transfer_tpu.models.vgg import fold_params_ok

        if not fold_params_ok(vgg_params):
            raise NotImplementedError(
                "fold_batch training needs the shallow VGG blocks in bf16: "
                "quantize_loss='all' quantizes conv1_2..conv2_2, which have "
                "no folded int8 variant; use quantize_loss='deep'"
            )
    if qat and fold_mode is True:
        raise NotImplementedError(
            "qat training uses the int8 transformer forward, which has no "
            "batch->H folded variant; use fold_batch='vgg' (loss-branch "
            "fold) or 'auto' (direct path)"
        )

    def _make_loss_fn(fold):
        # ``fold``: False | True (transformer + VGG) | 'vgg' (VGG only).
        fold_tr = fold is True
        fold_vgg = bool(fold)

        # Rematerialization trades recompute FLOPs for activation memory —
        # worthwhile here because training is HBM-bound with MXU headroom,
        # so the freed memory buys a larger (better-utilizing) batch.
        def _tr_apply(p, x):
            if qat:
                # Int8-MXU QAT forward/STE backward (models/transformer_qat):
                # the trained net's interior convs ride the int8 MXU like the
                # quantize_loss VGG does; weight grads stay exact real-dtype.
                from artist_style_transfer_tpu.models.transformer_qat import (
                    transformer_apply_qat,
                )

                return transformer_apply_qat(
                    p, x, layers="trunk" if qat is True else qat
                )
            return transformer_apply(p, x, fold_batch=fold_tr)

        tr_apply = jax.checkpoint(_tr_apply) if remat else _tr_apply

        def _vgg_apply(p, x):
            return vgg16_features(
                p, x, just_content=just_content,
                fold_batch=fold_vgg and fold_batch_ok(x.shape),
            )

        vgg_apply = jax.checkpoint(_vgg_apply) if remat else _vgg_apply

        def loss_fn(params, batch, content_r22, grams, labels, step, vgg_p=None, clf_p=None):
            vgg_p = vgg_compute if vgg_p is None else vgg_p
            clf_p = clf_compute if clf_p is None else clf_p
            if cdtype != jnp.float32:
                params = jax.tree.map(lambda a: a.astype(cdtype), params)
                batch = batch.astype(cdtype)
            gen = tr_apply(params, batch)
            # Must mirror vgg16_features' internal fold gate exactly, so the
            # loss rescaling is applied iff the taps actually arrive folded.
            from artist_style_transfer_tpu.models.vgg import fold_params_ok

            folded = (
                fold_vgg
                and fold_batch_ok(batch.shape)
                and get_precision() != "highest"
                and fold_params_ok(vgg_p)
            )
            gen_feats = vgg_apply(vgg_p, vgg_caffe_preprocess(gen))
            gen_r22 = gen_feats if just_content else gen_feats["relu2_2"]
            c_loss = content_weight * content_loss(
                gen_r22, content_r22, use_pallas=use_pallas, folded=folded
            )

            if mode == "classifier":
                # BGR [0,255] -> RGB [0,1] -> torchvision stats
                # (train_cnn.py:312; default = the correct 0.456 G mean, not
                # the reference's 0.546 typo; reference_typo_stats=True
                # reproduces the typo for strict trajectory comparison)
                rgb01 = bgr_to_rgb(gen) / 255.0
                from artist_style_transfer_tpu.models.resnet_q import (
                    classifier_apply_int8,
                    classifier_is_quantized,
                )

                # quantize_loss in classifier mode: the frozen classifier's
                # forward + STE data gradient ride the int8 MXU, like the
                # frozen VGG (models/resnet_q.py).
                clf_apply = (
                    classifier_apply_int8
                    if classifier_is_quantized(clf_p)
                    else classifier_apply
                )
                logits = clf_apply(
                    clf_p, torchvision_normalize(rgb01, reference_typo_stats)
                )
                s_loss = style_weight * cross_entropy_loss(logits, labels)
            else:
                step_grams = select_step_grams(
                    grams, step, targets.num_cycle if mode == "cycle" else 0
                )
                s_loss = style_weight * style_loss_gram(
                    gen_feats, step_grams, use_pallas=use_pallas, folded=folded,
                    quantize=bool(quantize_gram),
                )
            total = c_loss + s_loss
            return total, (c_loss, s_loss)

        return loss_fn

    loss_fn = _make_loss_fn(fold_global)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    if use_shmap:
        from jax.sharding import PartitionSpec as _P

        _local_grad = jax.value_and_grad(_make_loss_fn(fold_mode), has_aux=True)

        def _local_step(params, batch, r22, grams, labels, step, vgg_p, clf_p):
            (total, (c_l, s_l)), g = _local_grad(
                params, batch, r22, grams, labels, step, vgg_p, clf_p
            )
            pm = lambda t: jax.lax.pmean(t, "data")  # noqa: E731
            return (pm(total), (pm(c_l), pm(s_l))), jax.tree.map(pm, g)

        _dp = _P("data")
        grad_fn_sharded = jax.shard_map(
            _local_step,
            mesh=mesh,
            in_specs=(_P(), _dp, _dp, _P(), _dp, _P(), _P(), _P()),
            out_specs=_P(),
        )
    else:
        grad_fn_sharded = None

    # Frozen VGG weights enter the compiled epoch as a real argument, not a
    # closure constant — closed-over arrays get baked into the HLO as
    # literals, bloating the program and round-tripping the weights through
    # the host at lowering time.
    # The ragged tail batch only DP-shards cleanly when the mesh divides it.
    tail_mesh = (
        mesh if (mesh is not None and num_tail % mesh.devices.size == 0) else None
    )

    def epoch_arg_fn(params, opt_state, content_data, content_r22, grams,
                     labels, perm, base_step, vgg_p, clf_p):
        def one_step(params, opt_state, idx, step, step_mesh):
            batch = shard_batch(jnp.take(content_data, idx, axis=0), step_mesh)
            r22 = shard_batch(jnp.take(content_r22, idx, axis=0), step_mesh)
            step_labels = None if labels is None else labels[: idx.shape[0]]
            # Full DP steps fold each device's local shard under shard_map;
            # the ragged tail (step_mesh=None there) uses the global path.
            gf = (
                grad_fn_sharded
                if (grad_fn_sharded is not None and step_mesh is not None)
                else grad_fn
            )
            (total, (c_l, s_l)), grads = gf(
                params, batch, r22, grams, step_labels, step, vgg_p, clf_p
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, jnp.stack([c_l, s_l, total])

        def body(carry, i):
            params, opt_state = carry
            idx = jax.lax.dynamic_slice_in_dim(perm, i * batch_size, batch_size)
            params, opt_state, losses = one_step(
                params, opt_state, idx, base_step + i, mesh
            )
            return (params, opt_state), losses

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps_full)
        )
        if num_tail:
            idx = jax.lax.dynamic_slice_in_dim(perm, steps_full * batch_size, num_tail)
            params, opt_state, tail_losses = one_step(
                params, opt_state, idx, base_step + steps_full, tail_mesh
            )
            losses = jnp.concatenate([losses, tail_losses[None]], axis=0)
        # Per-step [content, style, total] stack — callers sum for the
        # reference's per-epoch bookkeeping (train_cnn.py:376-378) and log
        # per-batch entries (train_cnn.py:355-357) from the same array.
        return params, opt_state, losses

    epoch_core = jax.jit(epoch_arg_fn, donate_argnums=(0, 1))

    def epoch_jit(params, opt_state, content_data, content_r22, grams, labels, perm, base_step):
        return epoch_core(
            params, opt_state, content_data, content_r22, grams, labels,
            perm, base_step, vgg_compute, clf_compute,
        )

    # --- Streaming step (one jit per distinct batch shape) ------------------
    def stream_step_arg(params, opt_state, batch, grams, labels, step,
                        vgg_full, vgg_p, clf_p):
        divisible = batch.shape[0] % _mesh_size(mesh) == 0
        batch = shard_batch(batch, mesh if divisible else None)
        # Same computation as precompute_content_relu2_2, inlined: full-f32
        # features (vgg_full) cast to the resident-path storage dtype so the
        # streaming trajectory matches the resident one; the generated-image
        # pass inside grad_fn still uses the compute-dtype VGG.
        r22 = vgg16_features(vgg_full, vgg_caffe_preprocess(batch), just_content=True)
        if cdtype != jnp.float32:
            r22 = r22.astype(cdtype)
        step_labels = None if labels is None else labels[: batch.shape[0]]
        gf = grad_fn_sharded if (grad_fn_sharded is not None and divisible) else grad_fn
        (total, (c_l, s_l)), grads = gf(
            params, batch, r22, grams, step_labels, step, vgg_p, clf_p
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, jnp.stack([c_l, s_l, total])

    stream_core = jax.jit(stream_step_arg, donate_argnums=(0, 1))

    def stream_step_jit(params, opt_state, batch, grams, labels, step):
        return stream_core(
            params, opt_state, batch, grams, labels, step,
            vgg_params, vgg_compute, clf_compute,
        )

    def epoch_lower(params, opt_state, content_data, content_r22, grams, labels,
                    perm, base_step):
        return epoch_core.lower(
            params, opt_state, content_data, content_r22, grams, labels,
            perm, base_step, vgg_compute, clf_compute,
        )

    return StepFns(
        epoch_fn=epoch_jit,
        loss_fn=loss_fn,
        steps_per_epoch=steps_per_epoch,
        stream_step_fn=stream_step_jit,
        epoch_lower=epoch_lower,
    )


def _mesh_size(mesh) -> int:
    return 1 if mesh is None else int(mesh.devices.size)


@jax.jit
def _r22_chunk(vgg_params, images):
    return vgg16_features(vgg_params, vgg_caffe_preprocess(images), just_content=True)


def precompute_content_relu2_2(
    vgg_params, content_data: jax.Array, chunk: int = 16, dtype=None
) -> jax.Array:
    """relu2_2 features of the whole content corpus, computed once, device-resident.

    ``dtype=bfloat16`` halves the (large: 6.4 MB/image at 224x224) resident
    footprint for mixed-precision runs; features are computed in f32 first.
    """
    outs = []
    n = content_data.shape[0]
    for i in range(0, n - n % chunk, chunk):
        outs.append(_r22_chunk(vgg_params, jax.lax.dynamic_slice_in_dim(content_data, i, chunk)))
    if n % chunk:
        tail = content_data[n - n % chunk :]
        outs.append(
            vgg16_features(vgg_params, vgg_caffe_preprocess(tail), just_content=True)
        )
    out = jnp.concatenate(outs, axis=0)
    return out.astype(dtype) if dtype is not None else out


def epoch_permutation(seed: int, epoch: int, n: int) -> jax.Array:
    """Deterministic shuffle for (seed, epoch) — restartable mid-run (SURVEY §5)."""
    return jax.random.permutation(jax.random.fold_in(jax.random.key(seed), epoch), n)
