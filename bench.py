"""Benchmark: stylized 512x512 images/sec/chip (BASELINE.json headline metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

``vs_baseline`` compares against the PyTorch-CPU reference throughput
(float64 eager TransformerNet at 512x512, batch 1 — the reference's
configuration per train_cnn.py:25-44/inference.py:108-116). The baseline is
measured once on this machine with the torch oracle from tests/torch_ref.py
and cached in .baseline_torch_cpu.json, since the reference publishes no
numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".baseline_torch_cpu.json")
SIZE = 512


def measure_torch_cpu_baseline(repeats: int = 3) -> float:
    """f64 eager PyTorch CPU stylization throughput at 512x512 (reference config)."""
    import numpy as np
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from torch_ref import TorchTransformerNet

    torch.manual_seed(0)
    net = TorchTransformerNet().double().eval()
    x = torch.from_numpy(
        (np.random.default_rng(0).random((1, 3, SIZE, SIZE)) * 255)
    ).double()
    with torch.no_grad():
        net(x)  # warm
        t0 = time.perf_counter()
        for _ in range(repeats):
            net(x)
        dt = (time.perf_counter() - t0) / repeats
    return 1.0 / dt


def get_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["images_per_sec"]
    ips = measure_torch_cpu_baseline()
    try:
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"images_per_sec": ips, "config": "torch-cpu f64 512x512 b1"}, f)
    except OSError:
        pass
    return ips


def measure_tpu_throughput(batch_size: int = 16, iters: int = 20) -> float:
    """Jitted TransformerNet stylization throughput at 512x512 on one chip.

    Iterations are CHAINED (each step consumes the previous output) so the
    measurement reflects real device execution — independent async dispatches
    can otherwise overlap/queue in ways that make the wall-clock meaningless.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from artist_style_transfer_tpu.models.transformer import (
        init_transformer_params,
        transformer_apply,
    )
    from artist_style_transfer_tpu.ops.precision import set_precision

    # Throughput path: hardware-native MXU precision (parity mode is
    # validated separately in tests at 'highest').
    set_precision("default")

    params = init_transformer_params(jax.random.key(0))
    x = jnp.asarray(
        (np.random.default_rng(0).random((batch_size, SIZE, SIZE, 3)) * 255),
        jnp.float32,
    )

    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def chain(params, x, n):
        def body(y, _):
            # keep values bounded across the chain, like repeated stylization
            y = jnp.clip(transformer_apply(params, y), 0.0, 255.0)
            return y, None

        y, _ = jax.lax.scan(body, x, None, length=n)
        return y

    chain(params, x, 2).block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    chain(params, x, iters).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return batch_size / dt


def main() -> None:
    baseline = get_baseline()
    value = measure_tpu_throughput()
    print(
        json.dumps(
            {
                "metric": "stylize_512x512_images_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "images/sec",
                "vs_baseline": round(value / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
