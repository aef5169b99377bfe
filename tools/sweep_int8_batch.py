"""Int8 stylize batch sweep: AOT memory probe + (if safe) chained timing.

Usage: python tools/sweep_int8_batch.py [probe|run] [batches...]
`probe` only compiles (safe on the relayed backend); `run` times batches
whose temp memory fits under 12 GiB, chained like bench.measure_tpu_throughput.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from artist_style_transfer_tpu.models.transformer import init_transformer_params
from artist_style_transfer_tpu.models.transformer_q import (
    quantize_transformer,
    transformer_apply_int8,
)
from artist_style_transfer_tpu.ops.precision import set_precision
from artist_style_transfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
set_precision("default")
mode = sys.argv[1] if len(sys.argv) > 1 else "probe"
batches = [int(b) for b in sys.argv[2:]] or [128, 160, 192, 256]
S = 512
ITERS = 8

rng = np.random.default_rng(0)
params = init_transformer_params(jax.random.key(0))
calib = jnp.asarray(rng.random((2, 256, 256, 3)) * 255, jnp.float32)
qp = quantize_transformer(params, calib)


@functools.partial(jax.jit, static_argnums=(2,))
def chain(p, x, n):
    def body(y, _):
        y = jnp.clip(
            transformer_apply_int8(p, y, accum=jnp.bfloat16), 0.0, 255.0
        ).astype(x.dtype)
        return y, None

    y, _ = jax.lax.scan(body, x, None, length=n)
    return jnp.sum(y[:1, :1, :1, :].astype(jnp.float32))


for B in batches:
    spec = jax.ShapeDtypeStruct((B, S, S, 3), jnp.bfloat16)
    try:
        c = chain.lower(qp, spec, ITERS).compile()
        gib = c.memory_analysis().temp_size_in_bytes / 1024**3
    except Exception as e:
        print(f"b{B}: compile failed: {str(e)[:120]}", flush=True)
        continue
    print(f"b{B}: temp {gib:.2f} GiB", flush=True)
    if mode != "run" or gib > 12.0:
        continue
    x = jnp.asarray(rng.random((B, S, S, 3)) * 255, jnp.bfloat16)
    float(chain(qp, x, 1))
    float(chain(qp, x, ITERS))
    t0 = time.perf_counter()
    float(chain(qp, x, 1))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(qp, x, ITERS))
    dn = time.perf_counter() - t0
    dt = (dn - d1) / (ITERS - 1)
    print(f"b{B}: {dt*1e3:8.2f} ms/batch  {B/dt:8.1f} img/s", flush=True)
    del x
