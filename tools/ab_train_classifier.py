"""A/B: 'classifier'-mode train throughput — real vs int8 frozen classifier.

Usage: python tools/ab_train_classifier.py [batch] [train_size]
Compile-only memory analysis gates each leg (<12 GiB temp) before running
— a runtime OOM can hang the relayed TPU backend (BENCH_NOTES).
Chained-epoch methodology matches bench.measure_train_cycle_throughput.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from artist_style_transfer_tpu.models.resnet import init_classifier_params
from artist_style_transfer_tpu.models.resnet_q import quantize_classifier
from artist_style_transfer_tpu.models.transformer import init_transformer_params
from artist_style_transfer_tpu.models.vgg import init_vgg16_params, quantize_vgg16_loss
from artist_style_transfer_tpu.ops.precision import set_precision
from artist_style_transfer_tpu.train.loop import (
    epoch_permutation,
    make_optimizer,
    make_step_fns,
    precompute_content_relu2_2,
)
from artist_style_transfer_tpu.train.styles import build_style_targets
from artist_style_transfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
set_precision("default")
B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
S = int(sys.argv[2]) if len(sys.argv) > 2 else 224
STEPS = 6

rng = np.random.default_rng(0)
params = init_transformer_params(jax.random.key(0))
vgg = init_vgg16_params(jax.random.key(1))
clf = init_classifier_params(jax.random.key(2))
paintings = (rng.random((2, S, S, 3)) * 255).astype(np.float32)


def build(clf_params, vgg_params, n_content):
    targets = build_style_targets(
        "classifier", vgg_params, "bench", paintings=paintings,
        batch_size=B, artist_index=3,
    )
    content = jnp.asarray(rng.random((n_content, S, S, 3), np.float32) * 255)
    tx = make_optimizer(0.0024, 1e-4, 2, 2, n_content // B)
    fns = make_step_fns(
        "classifier", vgg_params, clf_params, targets,
        content_weight=17.0, style_weight=25.0,
        batch_size=B, num_content=n_content, tx=tx,
        compute_dtype="bfloat16", remat=False,
    )
    r22 = precompute_content_relu2_2(vgg_params, content, dtype=jnp.bfloat16)
    return fns, targets, content, r22, tx


def mem_gib(fns, targets, content, r22, tx):
    opt_state = jax.eval_shape(tx.init, params)
    lowered = fns.epoch_lower(
        params, opt_state,
        jax.ShapeDtypeStruct(content.shape, content.dtype),
        jax.ShapeDtypeStruct(r22.shape, r22.dtype),
        targets.grams, targets.labels,
        jax.ShapeDtypeStruct((content.shape[0],), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    return lowered.compile().memory_analysis().temp_size_in_bytes / 1024**3


def run_epoch(fns, targets, content, r22, tx, p, opt_state):
    perm = epoch_permutation(0, 0, content.shape[0])
    p, opt_state, losses = fns.epoch_fn(
        p, opt_state, content, r22, targets.grams, targets.labels, perm, jnp.int32(0)
    )
    float(losses[-1, 2])
    return p, opt_state


for name, legs in (
    ("real", (clf, vgg)),
    ("int8 clf+vgg-deep", (quantize_classifier(clf),
                           quantize_vgg16_loss(vgg, "deep", dtype=jnp.bfloat16))),
):
    clf_p, vgg_p = legs
    small = build(clf_p, vgg_p, B)
    gib = mem_gib(*small)
    print(f"{name}: temp {gib:.2f} GiB @ b{B}", flush=True)
    if gib > 12.0:
        print(f"{name}: SKIPPED (memory)", flush=True)
        continue
    tx = small[4]
    p = jax.tree.map(jnp.copy, params)
    st = run_epoch(*small, p, tx.init(p))
    t0 = time.perf_counter()
    st = run_epoch(*small, *st)
    d1 = time.perf_counter() - t0
    big = build(clf_p, vgg_p, B * STEPS)
    p = jax.tree.map(jnp.copy, params)
    stb = run_epoch(*big, p, big[4].init(p))
    t0 = time.perf_counter()
    stb = run_epoch(*big, *stb)
    dn = time.perf_counter() - t0
    per_step = (dn - d1) / (STEPS - 1)
    print(f"classifier-train {name}: {B/per_step:8.1f} img/s "
          f"({per_step*1e3:.1f} ms/step @ b{B}/{S})", flush=True)
    del small, big, st, stb