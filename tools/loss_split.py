"""Loss-path split/attribution on chip — the round-5 gram-seed/dgrad lever.

VERDICT r4 #1: BENCH_NOTES round-2 measured the 'cycle' loss path at
78.6 ms/step vs 55.5 ms for VGG fwd + input-gradient with UNIT seeds, and
attributed the ~23 ms gap to the gram dfeat seed matmuls (thin C=64/128
contractions at relu1_2/relu2_2) breaking the conv-dgrad fusions — with
"fold the (C,C) gram-residual matmul into the first dgrad conv's weights"
left as an unmeasured "future angle". This tool re-profiles that gap on
the current toolchain and measures each candidate lever:

  fwd        VGG forward only (4 taps)
  dgrad      fwd + input gradient with UNIT seeds on all taps (no grams)
  loss       full content+style loss, fwd + input gradient (production)
  sg11       loss with stop_gradient into the relu1_2 gram (its seed
             matmul and fusion interactions removed — the RECOVERABLE
             CEILING of any relu1_2-side fold, since the algebraic
             weight-fold is blocked by the interleaved ReLU mask:
             mask (.) (S.F) != S.(mask (.) F) = S.F)
  sg22       same for relu2_2
  sgshallow  both shallow taps' gram branches stopped
  swap       gram VJP contracts sym's other index (sym is symmetric, so
             numerics are identical; XLA may pick different layouts)
  outswap    seed dot produces (N,C,H,W), transposed back — yet another
             canonical form for layout assignment
  f32seed    seed matmul computed on f32-cast features
  int8gram   ALL taps on the int8-MXU gram (production gates C>=256;
             this measures the shallow case directly)
  conv1x1    seed matmul df = F.sym expressed as grouped 1x1 convs is NOT
             implemented: feature_group_count lowering measured 4.3x
             slower than direct conv in round 2 (BENCH_NOTES) — closed.

Round-5 measured results (one v5e chip): fwd 22.0 / dgrad 58.1 / loss
79.0-79.2 / sg11 65.4 / sg22 75.6 / sgshallow 61.7 / swap 78.9 /
outswap 79.0 / f32seed 79.0 / int8gram 88.9 ms — see BENCH_NOTES
"Round 5: the gram-seed/dgrad lever".

All legs grad w.r.t. the generated image (the cotangent the transformer
backward consumes), b128/224 bf16, chained-scan timing with min-of-5 and
chain-length differencing (the bench.py methodology).

Usage: python tools/loss_split.py [legs...]   (default: all)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from artist_style_transfer_tpu.models.vgg import VGG_LAYER_NAMES, init_vgg16_params, vgg16_features
from artist_style_transfer_tpu.ops.gram import gram_matrix_xla
from artist_style_transfer_tpu.ops.image import vgg_caffe_preprocess
from artist_style_transfer_tpu.ops.losses import mse
from artist_style_transfer_tpu.ops.precision import set_precision
from artist_style_transfer_tpu.utils.cache import enable_compilation_cache
from bench import _min_time

B, SZ = 128, 224
CONTENT_W, STYLE_W = 17.0, 25.0


# --- gram variants (custom VJPs mirroring ops.gram._gram_xla_diff) ---------

def _bwd_variant(kind):
    def bwd(f, g):
        n, h, w, c = f.shape
        scale = 1.0 / float(c * h * w)
        sym = (g.astype(jnp.float32) + jnp.swapaxes(g, 1, 2).astype(jnp.float32)) * scale
        if kind == "f32seed":
            df = jax.lax.dot_general(
                f.astype(jnp.float32), sym,
                dimension_numbers=(((3,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        elif kind == "outswap":
            # Produce the seed dot's output in (N, C, H, W) logical order
            # and transpose back — a different canonical form for layout
            # assignment than the (N, H, W, C)-producing baseline.
            df = jax.lax.dot_general(
                sym.astype(f.dtype), f,
                dimension_numbers=(((2,), (3,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            df = jnp.transpose(df, (0, 2, 3, 1))
        elif kind == "swap":
            # sym is symmetric: contracting its index 2 instead of 1 is
            # numerically identical but gives XLA's layout assignment a
            # different canonical form to work with.
            df = jax.lax.dot_general(
                f, sym.astype(f.dtype),
                dimension_numbers=(((3,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        else:  # baseline
            df = jax.lax.dot_general(
                f, sym.astype(f.dtype),
                dimension_numbers=(((3,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        return (df.astype(f.dtype),)

    return bwd


def make_gram(kind):
    @jax.custom_vjp
    def gram(f):
        return gram_matrix_xla(f)

    gram.defvjp(lambda f: (gram_matrix_xla(f), f), _bwd_variant(kind))
    return gram


def make_loss(gram_kind="base", sg=()):
    """Full content+style loss: loss(gen, vgg_p, r22_t, grams_t).

    Targets and weights are ARGUMENTS, not closure constants — closed-over
    arrays get baked into the HLO as literals (the relay rejects the
    oversized compile request with HTTP 413). ``r22_t`` is (1, ...) and
    broadcasts inside the MSE.
    """
    if gram_kind == "int8":
        # ALL taps on the int8-MXU gram (production gates it to C>=256;
        # this leg measures the shallow-tap case directly instead of by
        # analogy with the quantize_loss conv split-point sweep).
        from artist_style_transfer_tpu.ops.gram import gram_matrix_int8 as gram
    else:
        gram = make_gram(gram_kind)

    def loss(gen, vgg_p, r22_t, grams_t):
        feats = vgg16_features(vgg_p, vgg_caffe_preprocess(gen))
        c_loss = CONTENT_W * mse(feats["relu2_2"], r22_t)
        s_loss = jnp.float32(0.0)
        for name in VGG_LAYER_NAMES:
            f = feats[name]
            if name in sg:
                f = jax.lax.stop_gradient(f)
            s_loss = s_loss + mse(gram(f), grams_t[name])
        return c_loss + STYLE_W * s_loss

    return loss


def make_feature_sum():
    """Sum of all taps: the 'fwd' leg runs it forward-only; the 'dgrad' leg
    takes its input gradient, whose tap cotangents are UNIT seeds."""

    def pseudo(gen, vgg_p, r22_t, grams_t):
        feats = vgg16_features(vgg_p, vgg_caffe_preprocess(gen))
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats.values())

    return pseudo


def chain_timer(fn, x0, grad: bool, *extra):
    """ms/iter of fn (or its input-grad) via chained scan + length differencing."""
    work = jax.grad(fn) if grad else fn

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(x, n, *extra):
        def body(y, _):
            out = work(y, *extra)
            if grad:
                y = (y + 1e-6 * out.astype(y.dtype)).astype(y.dtype)
            else:
                y = (y + 1e-12 * out.astype(jnp.float32)).astype(y.dtype)
            return y, None

        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y[:1, :1, :1, :].astype(jnp.float32))

    iters = 8
    float(chain(x0, 1, *extra))
    float(chain(x0, iters, *extra))
    d1 = _min_time(lambda: float(chain(x0, 1, *extra)))
    dn = _min_time(lambda: float(chain(x0, iters, *extra)))
    return (dn - d1) / (iters - 1) * 1e3


def main():
    enable_compilation_cache()
    set_precision("default")
    rng = np.random.default_rng(0)
    vgg_params = init_vgg16_params(jax.random.key(1))
    vgg_bf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), vgg_params)

    gen = jnp.asarray(rng.random((B, SZ, SZ, 3)) * 255, jnp.bfloat16)
    # targets: features/grams of one random painting batch, f32 like training
    paint = jnp.asarray(rng.random((1, SZ, SZ, 3)) * 255, jnp.float32)
    pf = jax.jit(lambda p, x: vgg16_features(p, vgg_caffe_preprocess(x)))(vgg_params, paint)
    grams_target = {k: gram_matrix_xla(v)[0].astype(jnp.float32) for k, v in pf.items()}
    r22_target = pf["relu2_2"][:1].astype(jnp.bfloat16)  # broadcasts in the MSE

    legs = {
        "fwd": (make_feature_sum(), False),
        "dgrad": (make_feature_sum(), True),
        "loss": (make_loss(), True),
        "sg11": (make_loss(sg=("relu1_2",)), True),
        "sg22": (make_loss(sg=("relu2_2",)), True),
        "sgshallow": (make_loss(sg=("relu1_2", "relu2_2")), True),
        "swap": (make_loss(gram_kind="swap"), True),
        "outswap": (make_loss(gram_kind="outswap"), True),
        "f32seed": (make_loss(gram_kind="f32seed"), True),
        "int8gram": (make_loss(gram_kind="int8"), True),
    }
    names = sys.argv[1:] or list(legs)
    results = {}
    for name in names:
        fn, g = legs[name]
        t0 = time.time()
        ms = chain_timer(fn, gen, g, vgg_bf, r22_target, grams_target)
        results[name] = ms
        print(f"{name:10s} {ms:8.2f} ms/iter   (wall {time.time() - t0:.0f}s)", flush=True)
    if "loss" in results and "dgrad" in results:
        print(f"loss - dgrad gap: {results['loss'] - results['dgrad']:.2f} ms")
    for k in ("sg11", "sg22", "sgshallow"):
        if k in results and "loss" in results:
            print(f"loss - {k}: {results['loss'] - results[k]:.2f} ms (recoverable ceiling)")


if __name__ == "__main__":
    main()
