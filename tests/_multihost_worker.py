"""Worker process for the two-process multi-host training tests.

Run as: ``python tests/_multihost_worker.py <port> <process_id> [mode]``.

Each of the two processes exposes 4 virtual CPU devices; jax.distributed
joins them into one 8-device global mesh (collectives over gloo). The
worker then runs the full ``train()`` path — exercising
``parallel.distributed.make_global``'s host-local -> global array lifting,
which a multi-process jit requires. Process 0 prints the loss trajectory
for the parent test to compare against a single-process run.

``mode='stream'`` trains from a content_stream instead of a resident
corpus: each process yields its HOST-LOCAL slice of every global batch
(per-host sharded reads, SURVEY §5) and ``device_prefetch`` assembles the
slices into global arrays via ``make_array_from_process_local_data``.
"""

import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
mode = sys.argv[3] if len(sys.argv) > 3 else "resident"

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The container's sitecustomize may have pre-initialized a backend; drop it
# so the distributed client attaches before backend creation.
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._clear_backends()

from artist_style_transfer_tpu.parallel.distributed import initialize_multihost  # noqa: E402

assert initialize_multihost(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4, jax.local_devices()
assert jax.device_count() == 8, jax.devices()

import numpy as np  # noqa: E402

from artist_style_transfer_tpu.models.vgg import init_vgg16_params  # noqa: E402
from artist_style_transfer_tpu.parallel import make_mesh  # noqa: E402
from artist_style_transfer_tpu.train.api import train  # noqa: E402

# Deterministic inputs — identical on both processes (replicated lift).
rng = np.random.default_rng(0)
content = (rng.random((16, 32, 32, 3)) * 255).astype(np.float32)
paintings = (rng.random((2, 32, 32, 3)) * 255).astype(np.float32)
vgg_params = init_vgg16_params(jax.random.key(1))

mesh = make_mesh(shape=(8,))
kwargs = dict(
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
    paintings=paintings,
    vgg_params=vgg_params,
    mesh=mesh,
    export_pth=False,
)
if mode == "bf16":
    # Mixed-precision fast mode: routes through the shard-mapped per-shard
    # batch->H fold (train.loop grad_fn_sharded) with pmean collectives
    # crossing the two processes. Batch 16 over the 8 global devices gives
    # 2 images per shard, so the transformer fold (which needs local N>=2)
    # actually engages — not just the trivial N=1 VGG fold.
    from artist_style_transfer_tpu.ops.precision import precision

    kwargs["batch_size"] = 16
    with precision("default"):
        _, losses = train(
            content_images=content, compute_dtype="bfloat16",
            fold_batch=True, **kwargs
        )
elif mode == "stream":
    from artist_style_transfer_tpu.parallel import per_host_batch_slice

    host_batch, offset = per_host_batch_slice(8)
    assert (host_batch, offset) == (4, 4 * pid), (host_batch, offset)

    def stream(epoch):
        # Fixed order (streams define their own order); this process
        # contributes rows [offset, offset+host_batch) of each global batch.
        for s in range(0, 16, 8):
            yield content[s : s + 8][offset : offset + host_batch]

    _, losses = train(content_stream=stream, **kwargs)
else:
    _, losses = train(content_images=content, **kwargs)
if pid == 0:
    print("LOSSES " + ",".join(f"{v:.8e}" for v in np.asarray(losses).ravel()))
print(f"WORKER_{pid}_DONE")
