"""Component-split timing of the int8 stylize path at the headline config.

Times chained jitted programs for: the full int8 net, the bf16 stem
(widen-factored 9x9 3->32 + IN/ReLU), the bf16 output conv (dx-factored
9x9 32->3), and the int8 interior (encoder 2-4 + trunk + decoder) — so the
remaining stylize headroom can be attributed without an xplane capture.

Methodology: each leg runs under lax.scan with a SCALAR carry — iteration
i computes ``apply(x * (1 + s))`` (s ~ 1e-20·sum, so the input is not
loop-invariant and the body cannot be hoisted) and carries
``sum(out) * 1e-20`` (full reduction: nothing dead-code-eliminates).
The closure therefore costs one scale pass over the input plus one
reduce pass over the output per iteration; identity legs at both tensor
shapes measure exactly that, and are subtracted. (A first version closed
the chain by mean-over-C + broadcast back to the input shape — those
multi-GB passes swamped the legs: sum-of-parts 204 ms vs 87 ms full.)

Usage: python tools/stylize_split.py [batch] [size] [iters]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from artist_style_transfer_tpu.models.transformer import (
    DECODER_SPEC,
    ENCODER_SPEC,
    init_transformer_params,
)
from artist_style_transfer_tpu.models.transformer_q import (
    _conv_i8,
    _in_act,
    _quant_act,
    quantize_transformer,
    transformer_apply_int8,
)
from artist_style_transfer_tpu.ops.conv import (
    conv2d_reflect_cinfactored,
    conv2d_reflect_dxfactored,
)
from artist_style_transfer_tpu.ops.norm import instance_norm
from artist_style_transfer_tpu.ops.pad import reflect_pad_hw
from artist_style_transfer_tpu.ops.precision import set_precision
from artist_style_transfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
set_precision("default")
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
S = int(sys.argv[2]) if len(sys.argv) > 2 else 512
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

rng = np.random.default_rng(0)
params = init_transformer_params(jax.random.key(0))
calib = jnp.asarray(rng.random((2, 256, 256, 3)) * 255, jnp.float32)
qp = quantize_transformer(params, calib)
x3 = jnp.asarray(rng.random((B, S, S, 3)) * 255, jnp.bfloat16)
x32 = jnp.asarray(rng.random((B, S, S, 32)), jnp.bfloat16)


def chain(apply, x, n):
    @functools.partial(jax.jit, static_argnums=(1,))
    def run(x, n):
        def body(s, _):
            out = apply(x * (1.0 + s).astype(x.dtype))
            return jnp.sum(out.astype(jnp.float32)) * 1e-20, None

        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return s

    return run(x, n)


def time_leg(name, apply, x, overhead_ms=0.0):
    float(chain(apply, x, 1))
    float(chain(apply, x, ITERS))
    t0 = time.perf_counter()
    float(chain(apply, x, 1))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(apply, x, ITERS))
    dn = time.perf_counter() - t0
    ms = (dn - d1) / (ITERS - 1) * 1e3 - overhead_ms
    print(f"{name:30s} {ms:8.2f} ms/iter   {B / (ms / 1e3):8.1f} img/s")
    return ms


def stem(x):
    st = qp["stem"]
    h = conv2d_reflect_cinfactored(x, st["w"], st["b"])
    return jax.nn.relu(
        instance_norm(h, st["gamma"].astype(jnp.bfloat16), st["beta"].astype(jnp.bfloat16))
    )


def output(x):
    out = qp["output"]
    return conv2d_reflect_dxfactored(x, out["w"], out["b"])


def interior(x):
    xr = x
    for p, (k, s, _, _) in zip(qp["encoder"], ENCODER_SPEC[1:]):
        xq = _quant_act(xr, p["sin"])
        y = _conv_i8(reflect_pad_hw(xq, k // 2), p["wq"], stride=s, accum=jnp.bfloat16)
        xr = _in_act(y, p["gamma"], p["beta"], relu=True)
    for r in qp["residual"]:
        p1, p2 = r["conv1"], r["conv2"]
        hq = _quant_act(xr, p1["sin"])
        h = _conv_i8(reflect_pad_hw(hq, 1), p1["wq"], accum=jnp.bfloat16)
        hq = _quant_act(_in_act(h, p1["gamma"], p1["beta"], relu=True), p2["sin"])
        h = _conv_i8(reflect_pad_hw(hq, 1), p2["wq"], accum=jnp.bfloat16)
        xr = _in_act(h, p2["gamma"], p2["beta"], relu=False) + xr
    for p, (k, s, op, _, _) in zip(qp["decoder"], DECODER_SPEC):
        xq = _quant_act(xr, p["sin"])
        lo = k - 1 - k // 2
        y = _conv_i8(
            xq, p["wq"], padding=((lo, lo + op), (lo, lo + op)),
            lhs_dilation=(s, s) if s != 1 else None, accum=jnp.bfloat16,
        )
        xr = _in_act(y, p["gamma"], p["beta"], relu=True)
    return xr


# Calibration: identity legs measure the chain closure (input scale pass +
# output reduce pass) at each operand shape.
id3 = time_leg("closure overhead @x3", lambda y: y, x3)
id32 = time_leg("closure overhead @x32", lambda y: y, x32)

full = time_leg(
    "full int8",
    lambda y: transformer_apply_int8(qp, y, accum=jnp.bfloat16),
    x3,
    overhead_ms=id3,
)
st = time_leg("stem (bf16 cinfactored+IN)", stem, x3, overhead_ms=(id3 + id32) / 2)
outc = time_leg("output (bf16 dxfactored)", output, x32, overhead_ms=(id3 + id32) / 2)
inter = time_leg("interior int8 (enc+trunk+dec)", interior, x32, overhead_ms=id32)
print(f"{'sum of parts':30s} {st + outc + inter:8.2f} ms/iter  (vs full {full:.2f})")
