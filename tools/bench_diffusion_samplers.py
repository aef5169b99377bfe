"""TPU timing: DDPM vs DDIM vs DPM-Solver++(2M) sampling.

Usage: python tools/bench_diffusion_samplers.py [batch] [size] [T]
Random-weight UNet (no trained artifacts in this container) — the
numbers measure the samplers' step cost, which is model-eval-bound and
independent of the weights.

WARNING (round-4, measured): the DDPM leg at batch > 32 becomes a single
~100 s device execution (T sequential UNet evals in one jit) and crashed
/restarted the relayed TPU worker — a relay execution-length fault, not
OOM (AOT temp 0.90 GiB at b128). The DDPM leg is skipped above b32; the
fast samplers sweep safely (b128 numbers in BENCH_NOTES round-4).
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from artist_style_transfer_tpu.diffusion import (
    GaussianDiffusion,
    diff_sample,
    diff_sample_ddim,
    diff_sample_dpmpp,
)
from artist_style_transfer_tpu.diffusion.unet import init_diff_model
from artist_style_transfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
S = int(sys.argv[2]) if len(sys.argv) > 2 else 64
T = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

params = init_diff_model(jax.random.key(0), num_classes=19, base_channels=64)
diffusion = GaussianDiffusion.make(num_timesteps=T)
y = jnp.zeros((B,), jnp.int32)

legs = []
if B <= 32:  # see WARNING above: longer single executions fault the relay
    legs.append(
        (f"DDPM T={T}", lambda k: diff_sample(params, diffusion, k, y, shape=(S, S)))
    )
else:
    print(f"DDPM T={T}   : skipped at b{B} (relay execution-length fault; see docstring)")
legs += [
    ("DDIM 50", lambda k: diff_sample_ddim(params, diffusion, k, y, shape=(S, S), steps=50)),
    ("DPM++(2M) 20", lambda k: diff_sample_dpmpp(params, diffusion, k, y, shape=(S, S), steps=20)),
    ("DPM++(2M) 12", lambda k: diff_sample_dpmpp(params, diffusion, k, y, shape=(S, S), steps=12)),
]
for name, fn in legs:
    out = fn(jax.random.key(0))
    float(jnp.sum(out))  # compile + completion barrier
    t0 = time.perf_counter()
    out = fn(jax.random.key(1))
    float(jnp.sum(out))
    dt = time.perf_counter() - t0
    print(f"{name:14s}: {dt*1e3:9.1f} ms/batch  {B/dt:8.1f} samples/s", flush=True)
