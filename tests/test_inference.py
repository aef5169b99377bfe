"""Inference-path tests: stylize shapes, .npz/.pth loaders, eval pipeline, Gatys."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.models import init_transformer_params
from artist_style_transfer_tpu.models.resnet import init_classifier_params
from artist_style_transfer_tpu.models.vgg import init_vgg16_params


def test_stylize_clips_to_uint8():
    from artist_style_transfer_tpu.infer.stylize import stylize

    params = init_transformer_params(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)) * 255, jnp.float32)
    out = stylize(params, x)
    assert out.dtype == jnp.uint8
    assert out.shape == (1, 32, 32, 3)


def test_stylize_batched_groups_shapes():
    from artist_style_transfer_tpu.infer.stylize import stylize_batched

    params = init_transformer_params(jax.random.key(0))
    rng = np.random.default_rng(1)
    images = [
        (rng.random((32, 32, 3)) * 255).astype(np.float32),
        (rng.random((32, 48, 3)) * 255).astype(np.float32),
        (rng.random((32, 32, 3)) * 255).astype(np.float32),
    ]
    outs = stylize_batched(params, images)
    assert outs[0].shape == (32, 32, 3)
    assert outs[1].shape == (32, 48, 3)
    # same-shaped inputs batched together must equal their solo results
    solo = stylize_batched(params, [images[0]])[0]
    np.testing.assert_array_equal(outs[0], solo)


def test_save_figure_show_headless_degrades_to_file(tmp_path, monkeypatch):
    """``save_figure(show=True)`` on a headless host (no DISPLAY) must not
    attempt an interactive backend — it writes the figure file and returns
    without blocking (reference inference.py:152 parity is opt-in and
    GUI-gated)."""
    from artist_style_transfer_tpu.infer.stylize import save_figure

    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.setattr("sys.platform", "linux")
    img = np.zeros((8, 8, 3), np.uint8)
    path = str(tmp_path / "fig.png")
    save_figure(path, img, img, show=True)  # must not block or raise
    import os

    assert os.path.getsize(path) > 0


def test_save_figure_show_failure_degrades_to_warning(tmp_path, monkeypatch):
    """A stale/invalid DISPLAY passes the gate but makes ``plt.show()``
    raise; the figure file is already written, so the CLI must get a
    warning, not the exception — and the figure must still be closed
    (round-4 advisor)."""
    import matplotlib
    import matplotlib.pyplot as plt

    from artist_style_transfer_tpu.infer.stylize import save_figure

    monkeypatch.setenv("DISPLAY", ":99")  # non-empty but invalid
    monkeypatch.setattr(matplotlib, "get_backend", lambda: "qtagg")

    def boom():
        raise RuntimeError("could not connect to display :99")

    monkeypatch.setattr(plt, "show", boom)
    img = np.zeros((8, 8, 3), np.uint8)
    path = str(tmp_path / "fig.png")
    with pytest.warns(UserWarning, match="interactive show failed"):
        save_figure(path, img, img, show=True)
    import os

    assert os.path.getsize(path) > 0
    assert plt.get_fignums() == []  # the figure was closed despite the failure


def test_params_npz_roundtrip(tmp_path):
    from artist_style_transfer_tpu.train.checkpoint import load_params_npz, save_params_npz

    params = init_transformer_params(jax.random.key(2))
    path = str(tmp_path / "p.npz")
    save_params_npz(path, params)
    template = init_transformer_params(jax.random.key(3))
    back = load_params_npz(path, template)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# The exact message the relay surfaces when the folded compile SIGABRTs the
# TPU compile helper (probed on-chip, round 4 — see stylize._FOLD_CRASH_SIGNATURES).
_CRASH_MSG = (
    "INTERNAL: http://127.0.0.1:8103/remote_compile: HTTP 500: "
    "tpu_compile_helper subprocess exit signal SIGABRT (6)"
)


def _stylize_module():
    import importlib

    # NOTE: ``import ...infer.stylize as S`` would bind the re-exported
    # *function* (infer/__init__ shadows the submodule attribute).
    return importlib.import_module("artist_style_transfer_tpu.infer.stylize")


def test_stylize_default_never_folds(monkeypatch):
    """Winners-only dispatch (round 4): the default stylize path is the
    direct formulation — no folded compile is ever attempted."""
    S = _stylize_module()
    params = init_transformer_params(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)) * 255, jnp.float32)
    real = S._stylize_core
    calls = []

    def fake(params, images, clip=True, fold_batch=True):
        calls.append(fold_batch)
        return real(params, images, clip, False)

    monkeypatch.setattr(S, "_stylize_core", fake)
    monkeypatch.setattr(S, "_fold_broken", False)
    out = S.stylize(params, x)
    assert out.shape == (2, 32, 32, 3) and out.dtype == jnp.uint8
    assert calls == [False]
    assert not S._fold_broken


def test_stylize_folded_compile_crash_falls_back(monkeypatch):
    """Round-3 toolchain mitigation: when the opt-in folded forward's
    compile dies with the KNOWN helper-crash signature, stylize() retries
    the direct path and LATCHES it for subsequent calls."""
    S = _stylize_module()

    params = init_transformer_params(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)) * 255, jnp.float32)
    real = S._stylize_core
    calls = []

    def fake(params, images, clip=True, fold_batch=True):
        calls.append(fold_batch)
        if fold_batch:
            raise jax.errors.JaxRuntimeError(_CRASH_MSG)
        return real(params, images, clip, False)

    monkeypatch.setattr(S, "_stylize_core", fake)
    monkeypatch.setattr(S, "_fold_broken", False)
    out = S.stylize(params, x, fold_batch=True)
    assert out.shape == (2, 32, 32, 3) and out.dtype == jnp.uint8
    out2 = S.stylize(params, x, fold_batch=True)
    assert out2.shape == (2, 32, 32, 3)
    # first call tried folded then fell back; second went direct immediately
    assert calls == [True, False, False]
    assert S._fold_broken


def test_stylize_non_compile_runtime_error_propagates(monkeypatch):
    """A JaxRuntimeError that is NOT the known folded-compile crash (e.g. a
    transient device/relay failure) must propagate and must NOT latch the
    direct-path fallback (VERDICT r03 next-step #3)."""
    S = _stylize_module()

    params = init_transformer_params(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)) * 255, jnp.float32)

    def fake(params, images, clip=True, fold_batch=True):
        raise jax.errors.JaxRuntimeError("RESOURCE_EXHAUSTED: HBM OOM while allocating")

    monkeypatch.setattr(S, "_stylize_core", fake)
    monkeypatch.setattr(S, "_fold_broken", False)
    with pytest.raises(jax.errors.JaxRuntimeError, match="RESOURCE_EXHAUSTED"):
        S.stylize(params, x, fold_batch=True)
    assert not S._fold_broken


def test_single_fold_token_error_propagates(monkeypatch):
    """An unrelated compiler error mentioning only ONE of the
    fusion_emitter tokens must propagate without latching (round-4
    advisor: the secondary signature match is conjunctive); the
    helper-death line alone or BOTH tokens together still latch."""
    S = _stylize_module()
    err = jax.errors.JaxRuntimeError
    assert not S._is_fold_compile_crash(
        err("INTERNAL: unrelated pass failed in fusion_emitter.cc:123: tile size")
    )
    assert not S._is_fold_compile_crash(
        err("INVALID_ARGUMENT: bad window.window_bounds configuration")
    )
    assert S._is_fold_compile_crash(err(_CRASH_MSG))
    assert S._is_fold_compile_crash(
        err(
            "INTERNAL: fusion_emitter.cc:4273 Check failed: "
            "window.window_bounds[i] == window.strides[i] (2 vs. 12)"
        )
    )

    params = init_transformer_params(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)) * 255, jnp.float32)

    def fake(params, images, clip=True, fold_batch=True):
        raise err("INTERNAL: some future error that mentions fusion_emitter only")

    monkeypatch.setattr(S, "_stylize_core", fake)
    monkeypatch.setattr(S, "_fold_broken", False)
    with pytest.raises(jax.errors.JaxRuntimeError, match="future error"):
        S.stylize(params, x, fold_batch=True)
    assert not S._fold_broken


def test_evaluate_folded_compile_crash_falls_back(monkeypatch):
    import artist_style_transfer_tpu.infer.evaluate as E
    from artist_style_transfer_tpu.infer.evaluate import evaluate_with_classifier

    S = _stylize_module()
    params = init_transformer_params(jax.random.key(0))
    clf = init_classifier_params(jax.random.key(1))
    content = (np.random.default_rng(2).random((2, 288, 288, 3)) * 255).astype(np.float32)
    real = E._eval_batch
    calls = []

    def fake(params, clf_params, images, fold_batch=False, crop_size=256):
        calls.append(fold_batch)
        if fold_batch:
            raise jax.errors.JaxRuntimeError(_CRASH_MSG)
        return real(params, clf_params, images, fold_batch=False)

    monkeypatch.setattr(E, "_eval_batch", fake)
    monkeypatch.setattr(S, "_fold_broken", False)
    acc = evaluate_with_classifier(
        params, clf, content, artist_index=0, batch_size=2, wordy=False, fold_batch=True
    )
    assert 0.0 <= acc <= 100.0
    assert calls == [True, False]
    # the crash latches the module-scope flag, so the NEXT call (even a new
    # evaluate_with_classifier) dispatches direct immediately (ADVICE r03)
    assert S._fold_broken
    calls.clear()
    evaluate_with_classifier(
        params, clf, content, artist_index=0, batch_size=2, wordy=False, fold_batch=True
    )
    assert calls == [False]


def test_evaluate_default_never_folds(monkeypatch):
    import artist_style_transfer_tpu.infer.evaluate as E
    from artist_style_transfer_tpu.infer.evaluate import evaluate_with_classifier

    S = _stylize_module()
    params = init_transformer_params(jax.random.key(0))
    clf = init_classifier_params(jax.random.key(1))
    content = (np.random.default_rng(2).random((2, 288, 288, 3)) * 255).astype(np.float32)
    real = E._eval_batch
    calls = []

    def fake(params, clf_params, images, fold_batch=False, crop_size=256):
        calls.append(fold_batch)
        return real(params, clf_params, images, fold_batch=False)

    monkeypatch.setattr(E, "_eval_batch", fake)
    monkeypatch.setattr(S, "_fold_broken", False)
    evaluate_with_classifier(params, clf, content, artist_index=0, batch_size=2, wordy=False)
    assert calls == [False]
    assert not S._fold_broken


def test_evaluate_non_compile_runtime_error_propagates(monkeypatch):
    """A non-compile runtime error from the (opt-in) folded eval must NOT be
    swallowed by the fallback retry — it propagates, and nothing latches."""
    import artist_style_transfer_tpu.infer.evaluate as E
    from artist_style_transfer_tpu.infer.evaluate import evaluate_with_classifier

    S = _stylize_module()
    params = init_transformer_params(jax.random.key(0))
    clf = init_classifier_params(jax.random.key(1))
    content = (np.random.default_rng(2).random((2, 288, 288, 3)) * 255).astype(np.float32)

    def fake(params, clf_params, images, fold_batch=False, crop_size=256):
        raise jax.errors.JaxRuntimeError("DATA_LOSS: relay stream reset mid-transfer")

    monkeypatch.setattr(E, "_eval_batch", fake)
    monkeypatch.setattr(S, "_fold_broken", False)
    with pytest.raises(jax.errors.JaxRuntimeError, match="DATA_LOSS"):
        evaluate_with_classifier(
            params, clf, content, artist_index=0, batch_size=2, wordy=False,
            fold_batch=True,
        )
    assert not S._fold_broken


def test_evaluate_with_classifier_counts():
    from artist_style_transfer_tpu.infer.evaluate import evaluate_with_classifier

    params = init_transformer_params(jax.random.key(0))
    clf = init_classifier_params(jax.random.key(1))
    rng = np.random.default_rng(2)
    # > 256 inputs so the center crop actually crops
    content = (rng.random((3, 288, 288, 3)) * 255).astype(np.float32)
    acc = evaluate_with_classifier(params, clf, content, artist_index=0, batch_size=2, wordy=False)
    assert 0.0 <= acc <= 100.0


@pytest.mark.slow
def test_evaluate_with_classifier_mesh_matches_single_device():
    """Mesh eval predicts the same classes as the single-device path, both
    on the default direct path (batch sharded via GSPMD input sharding)
    and the opt-in per-shard fold under shard_map
    (infer.evaluate._eval_batch_sharded)."""
    from artist_style_transfer_tpu.infer.evaluate import evaluate_with_classifier
    from artist_style_transfer_tpu.ops.precision import precision
    from artist_style_transfer_tpu.parallel import make_mesh

    params = init_transformer_params(jax.random.key(0))
    clf = init_classifier_params(jax.random.key(1))
    rng = np.random.default_rng(4)
    # batch 8 over 4 devices: 2 images per shard so the local fold engages
    content = (rng.random((8, 288, 288, 3)) * 255).astype(np.float32)
    mesh = make_mesh(shape=(4,))
    with precision("default"):
        acc_single = evaluate_with_classifier(
            params, clf, content, artist_index=0, batch_size=8, wordy=False
        )
        acc_mesh = evaluate_with_classifier(
            params, clf, content, artist_index=0, batch_size=8, wordy=False,
            mesh=mesh,
        )
        acc_mesh_fold = evaluate_with_classifier(
            params, clf, content, artist_index=0, batch_size=8, wordy=False,
            mesh=mesh, fold_batch=True,
        )
    assert acc_mesh == acc_single
    assert acc_mesh_fold == acc_single


@pytest.mark.slow
def test_evaluate_with_classifier_mixed_sizes():
    """The --no-resize_imgs eval path hands over a list of different-size
    images (reference inference.py:93-98 evaluates raw sizes); batching
    groups by exact shape and predictions land at the right indices."""
    from artist_style_transfer_tpu.infer.evaluate import evaluate_with_classifier

    params = init_transformer_params(jax.random.key(0))
    clf = init_classifier_params(jax.random.key(1))
    rng = np.random.default_rng(3)
    sizes = [(288, 288), (272, 288), (288, 288), (272, 288), (272, 288)]
    content = [(rng.random((h, w, 3)) * 255).astype(np.float32) for h, w in sizes]
    acc = evaluate_with_classifier(params, clf, content, artist_index=0, batch_size=2, wordy=False)
    assert 0.0 <= acc <= 100.0
    # shape-grouped batching must agree with one-by-one evaluation
    per_image = [
        evaluate_with_classifier(params, clf, [im], artist_index=0, batch_size=1, wordy=False)
        for im in content
    ]
    assert abs(acc - float(np.mean(per_image))) < 1e-6


def test_gatys_reduces_loss():
    from artist_style_transfer_tpu.train.gatys import gatys_stylize

    vgg_params = init_vgg16_params(jax.random.key(0))
    rng = np.random.default_rng(3)
    content = jnp.asarray((rng.random((32, 32, 3)) * 255).astype(np.float32))
    style = jnp.asarray((rng.random((32, 32, 3)) * 255).astype(np.float32))

    out, losses = gatys_stylize(
        vgg_params, content, style, num_steps=30, lr=2.0, use_pallas=False
    )
    assert out.shape == (32, 32, 3)
    losses = np.asarray(losses)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9  # optimization makes real progress


def test_post_filters_match_cv2():
    import cv2

    from artist_style_transfer_tpu.infer.stylize import gaussian_blur_3x3, sharpen

    rng = np.random.default_rng(4)
    img = (rng.random((24, 24, 3)) * 255).astype(np.uint8)

    ours = gaussian_blur_3x3(img, sigma=1.0)
    theirs = cv2.GaussianBlur(img, ksize=(3, 3), sigmaX=1.0, sigmaY=1.0)
    # interior must match exactly-ish; borders differ (cv2 default border)
    assert np.abs(ours[2:-2, 2:-2].astype(int) - theirs[2:-2, 2:-2].astype(int)).max() <= 1

    ours_s = sharpen(img.astype(np.float64), 50.0)
    kern = np.array([[-1, -1, -1], [-1, 50.0, -1], [-1, -1, -1]]) / (50.0 - 8)
    theirs_s = cv2.filter2D(img, -1, kern)
    assert np.abs(ours_s[2:-2, 2:-2].astype(int) - theirs_s[2:-2, 2:-2].astype(int)).max() <= 1
