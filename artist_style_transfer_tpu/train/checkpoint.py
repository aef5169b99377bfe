"""Checkpointing: save/resume for params + optimizer state + step.

The reference is save-only (torch.save of the state dict every
``save_every`` epochs, train_cnn.py:383-390; loads via strict
load_state_dict, cnn.py:41-42). This module provides:

- the same directory semantics: ``<model_dir>/<artist>/<method>/
  transfer[2]_<cw>-<sw>_<epoch>`` (train_cnn.py:173-178) — the ``transfer2``
  name bump when the directory is non-empty included;
- resumable checkpoints (params + opt state + epoch) via Orbax;
- ``.pth`` export so reference tooling can load our trained nets.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_dir_prefix(model_dir: str, artist: str, method: str, cw, sw, bump: bool = True) -> str:
    """Reference checkpoint naming (train_cnn.py:173-178), including the
    'transfer2' bump if the directory already has files.

    ``bump=False`` (used when resuming) always returns the primary
    'transfer_' prefix so the resumed run continues its own checkpoints.
    """
    d = os.path.join(model_dir, artist, method)
    os.makedirs(d, exist_ok=True)
    stem = "transfer_" if (not bump or not os.listdir(d)) else "transfer2_"
    # Reference formats weights with str(); ints print bare (17-25).
    return os.path.join(d, f"{stem}{fmt_weight(cw)}-{fmt_weight(sw)}")


def fmt_weight(w) -> str:
    return str(int(w)) if float(w) == int(w) else str(w)


def resume_prefix(model_dir: str, artist: str, method: str, cw, sw) -> str:
    """Prefix to resume from: probe BOTH name stems.

    A second run in the same artist/method dir checkpoints under
    'transfer2_' (the reference's name bump, train_cnn.py:173-178), so
    resuming must not blindly resolve 'transfer_' — that would silently
    restart at epoch 0 and overwrite the first run. Picks the stem whose
    newest checkpoint is most recently modified; warns loudly when neither
    has one.
    """
    d = os.path.join(model_dir, artist, method)
    w = f"{fmt_weight(cw)}-{fmt_weight(sw)}"
    candidates = [os.path.join(d, f"{stem}{w}") for stem in ("transfer_", "transfer2_")]
    best, best_mtime = None, -1.0
    for prefix in candidates:
        found = latest_checkpoint(prefix)
        if found is not None:
            mtime = os.path.getmtime(found[0])
            if mtime > best_mtime:
                best, best_mtime = prefix, mtime
    if best is None:
        import warnings

        warnings.warn(
            f"resume=True but no checkpoint found under {d}; starting fresh",
            stacklevel=2,
        )
        os.makedirs(d, exist_ok=True)
        return candidates[0]
    return best


def save_checkpoint(
    prefix: str,
    epoch_label: int,
    params,
    opt_state=None,
    losses: np.ndarray | None = None,
    completed_epochs: int | None = None,
) -> str:
    """Save a resumable checkpoint at ``<prefix>_<epoch_label>.ckpt`` (+ losses .npy).

    ``epoch_label`` follows reference file naming (train_cnn.py:383-390:
    mid-run saves are labeled with the just-finished epoch index, the final
    save with num_epochs); ``completed_epochs`` is the resume cursor — the
    number of fully-completed epochs.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(f"{prefix}_{epoch_label}.ckpt")
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": params,
        # 0-d ndarray, not a numpy scalar — orbax rejects np.int64 leaves
        "completed": np.asarray(
            completed_epochs if completed_epochs is not None else epoch_label + 1,
            np.int64,
        ),
    }
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if losses is not None:
        np.save(f"{prefix}_{epoch_label}.npy", losses)
    return path


def restore_checkpoint(path: str, like: dict):
    """Restore a checkpoint saved by :func:`save_checkpoint`.

    ``like`` is a pytree of the same structure/shape (e.g. freshly-initialized
    params/opt_state) used as the restore template.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
    return ckptr.restore(os.path.abspath(path), template)


def latest_checkpoint(prefix: str) -> tuple[str, int] | None:
    """Find the newest ``<prefix>_<epoch>.ckpt`` for resume-from-latest."""
    d = os.path.dirname(prefix)
    stem = os.path.basename(prefix)
    best = None
    if not os.path.isdir(d):
        return None
    for name in os.listdir(d):
        if name.startswith(stem + "_") and name.endswith(".ckpt"):
            try:
                ep = int(name[len(stem) + 1 : -len(".ckpt")])
            except ValueError:
                continue
            if best is None or ep > best[1]:
                best = (os.path.join(d, name), ep)
    return best


def _path_key(kp) -> str:
    parts = []
    for k in kp:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def save_params_npz(path: str, params) -> None:
    """Flat-npz export of a param pytree — the lightweight inference artifact
    (no optimizer state, no orbax dependency to read)."""
    flat = {
        _path_key(kp): np.asarray(leaf)
        for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    np.savez(path, **flat)


def load_params_npz(path: str, template):
    """Load a :func:`save_params_npz` artifact into ``template``'s structure."""
    import jax.numpy as jnp

    z = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [jnp.asarray(z[_path_key(kp)]) for kp, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def export_pth(path: str, params) -> None:
    """Export TransformerNet params as a reference-loadable ``.pth`` state dict.

    Tensors are written in float64, the reference's working dtype (cnn.py:43).
    """
    import torch

    from artist_style_transfer_tpu.utils.torch_import import transformer_params_to_torch

    sd = transformer_params_to_torch(jax.device_get(params))
    torch_sd = {k: torch.from_numpy(np.asarray(v, np.float64)) for k, v in sd.items()}
    torch.save(torch_sd, path)


def export_classifier_pth(path: str, params) -> None:
    """Export a trained artist classifier as a reference-loadable ``.pth``.

    Nested under ``{'model': state_dict}`` exactly as the reference loads
    ``models/best-2.pth`` (classifier.py:62-63). Float tensors stay f32
    (the reference casts with ``.double()`` after loading, classifier.py:66).
    """
    import torch

    from artist_style_transfer_tpu.utils.torch_import import classifier_params_to_torch

    sd = classifier_params_to_torch(jax.device_get(params))
    # np.array(..., copy=True) keeps the buffer writable — torch.from_numpy
    # warns on the read-only arrays jax.device_get hands back.
    torch_sd = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
    torch.save({"model": torch_sd}, path)
