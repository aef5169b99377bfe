"""Two-process multi-host DP training over DCN-style jax.distributed.

SURVEY §4's "fake multi-node backend", taken one step further than the
8-virtual-device single-process mesh: two real OS processes, each with 4
virtual CPU devices, joined by ``jax.distributed`` into one 8-device global
mesh (cross-process collectives over gloo). The full ``train()`` path runs
under it — validating that every array entering the global-mesh jit is
lifted to a global jax.Array (``parallel.distributed.make_global``) and
that the trajectory matches a single-process run of identical data.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_two_process(mode: str) -> np.ndarray:
    """Launch the two workers; return process 0's loss trajectory."""
    port = _free_port()
    repo_root = os.path.dirname(os.path.dirname(WORKER))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), mode],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=repo_root,
        )
        for i in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_{i}_DONE" in out
    loss_line = [l for l in outs[0].splitlines() if l.startswith("LOSSES ")]
    assert loss_line, outs[0]
    return np.array([float(v) for v in loss_line[0][len("LOSSES "):].split(",")])


@pytest.mark.slow
def test_two_process_trajectory_matches_single_process():
    multi = _run_two_process("resident")

    # Single-process reference on identical data (mesh=None, same seeds).
    from artist_style_transfer_tpu.models.vgg import init_vgg16_params
    from artist_style_transfer_tpu.train.api import train

    rng = np.random.default_rng(0)
    content = (rng.random((16, 32, 32, 3)) * 255).astype(np.float32)
    paintings = (rng.random((2, 32, 32, 3)) * 255).astype(np.float32)
    vgg_params = init_vgg16_params(jax.random.key(1))
    _, losses = train(
        style_method="cycle",
        artist="X",
        num_epochs=2,
        batch_size=8,
        content_data_size=16,
        seed=0,
        num_steps=2,
        lr=1e-3,
        model_dir="",
        wordy=False,
        content_images=content,
        paintings=paintings,
        vgg_params=vgg_params,
        mesh=None,
        export_pth=False,
    )
    single = np.asarray(losses).ravel()
    # Cross-process all-reduce changes the gradient reduction order; the
    # trajectory should agree to float32 accumulation noise, not bitwise.
    np.testing.assert_allclose(multi, single, rtol=2e-4)


@pytest.mark.slow
def test_two_process_bf16_fold_matches_single_process():
    """bf16 fast mode under the two-process mesh: the gradient runs through
    train.loop's shard-mapped per-shard batch->H fold, with the pmean
    collectives crossing processes over gloo. Trajectory must agree with a
    single-process bf16 folded run to bf16 forward noise."""
    multi = _run_two_process("bf16")

    from artist_style_transfer_tpu.models.vgg import init_vgg16_params
    from artist_style_transfer_tpu.ops.precision import precision
    from artist_style_transfer_tpu.train.api import train

    rng = np.random.default_rng(0)
    content = (rng.random((16, 32, 32, 3)) * 255).astype(np.float32)
    paintings = (rng.random((2, 32, 32, 3)) * 255).astype(np.float32)
    vgg_params = init_vgg16_params(jax.random.key(1))
    # batch 16 matches the worker's bf16 leg: 2 images per device there.
    with precision("default"):
        _, losses = train(
            style_method="cycle",
            artist="X",
            num_epochs=2,
            batch_size=16,
            content_data_size=16,
            seed=0,
            num_steps=2,
            lr=1e-3,
            model_dir="",
            wordy=False,
            content_images=content,
            paintings=paintings,
            vgg_params=vgg_params,
            mesh=None,
            export_pth=False,
            compute_dtype="bfloat16",
            fold_batch=True,
        )
    single = np.asarray(losses).ravel()
    # One N=8 fold single-device vs eight N=1 local folds + cross-process
    # pmean: same math, different reassociation — bf16 forward noise bound.
    np.testing.assert_allclose(multi, single, rtol=2e-2)


@pytest.mark.slow
def test_two_process_streaming_matches_single_process_stream():
    """Streaming corpora under a multi-process mesh: each process yields its
    host-local slice of every global batch; device_prefetch lifts the slices
    to global arrays (make_array_from_process_local_data — plain device_put
    rejects non-fully-addressable shardings). Trajectory must match a
    single-process streaming run over the same global batches."""
    multi = _run_two_process("stream")

    from artist_style_transfer_tpu.models.vgg import init_vgg16_params
    from artist_style_transfer_tpu.train.api import train

    rng = np.random.default_rng(0)
    content = (rng.random((16, 32, 32, 3)) * 255).astype(np.float32)
    paintings = (rng.random((2, 32, 32, 3)) * 255).astype(np.float32)
    vgg_params = init_vgg16_params(jax.random.key(1))

    def stream(epoch):
        for s in range(0, 16, 8):
            yield content[s : s + 8]

    _, losses = train(
        style_method="cycle",
        artist="X",
        num_epochs=2,
        batch_size=8,
        content_data_size=16,
        seed=0,
        num_steps=2,
        lr=1e-3,
        model_dir="",
        wordy=False,
        content_stream=stream,
        paintings=paintings,
        vgg_params=vgg_params,
        mesh=None,
        export_pth=False,
    )
    single = np.asarray(losses).ravel()
    np.testing.assert_allclose(multi, single, rtol=2e-4)
