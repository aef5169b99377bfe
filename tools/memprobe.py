"""Compile-only HBM probe: folded vs direct train step at a given batch.

Usage: python tools/memprobe.py <batch_size> <fold|nofold>
Never executes on device — safe on the relayed TPU backend.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from artist_style_transfer_tpu.models.transformer import init_transformer_params
from artist_style_transfer_tpu.models.vgg import init_vgg16_params
from artist_style_transfer_tpu.ops.precision import set_precision
from artist_style_transfer_tpu.train.loop import (
    epoch_permutation, make_optimizer, make_step_fns, precompute_content_relu2_2)
from artist_style_transfer_tpu.train.styles import build_style_targets

set_precision("default")
batch_size = int(sys.argv[1])
fold = sys.argv[2] == "fold"
train_size = 224
n_content = batch_size  # 1 step/epoch: temp dominated by per-step activations

rng = np.random.default_rng(0)
content = jax.ShapeDtypeStruct((n_content, train_size, train_size, 3), jnp.float32)
paintings = (rng.random((4, train_size, train_size, 3)) * 255).astype(np.float32)
params = init_transformer_params(jax.random.key(0))
vgg_params = init_vgg16_params(jax.random.key(1))
targets = build_style_targets(
    "cycle", vgg_params, "bench", paintings=paintings, batch_size=batch_size)
tx = make_optimizer(0.0024, 1e-4, 2, 2, max(1, n_content // batch_size))
fns = make_step_fns(
    "cycle", vgg_params, None, targets,
    content_weight=17.0, style_weight=25.0,
    batch_size=batch_size, num_content=n_content, tx=tx,
    compute_dtype="bfloat16", remat=False, fold_batch=fold)

r22 = jax.ShapeDtypeStruct((n_content, 112, 112, 128), jnp.bfloat16)
opt_state = jax.eval_shape(tx.init, params)
perm = jax.ShapeDtypeStruct((n_content,), jnp.int32)
lowered = fns.epoch_lower(
    params, opt_state, content, r22, targets.grams, None, perm,
    jax.ShapeDtypeStruct((), jnp.int32))
ma = lowered.compile().memory_analysis()
gib = 1024 ** 3
print(f"b{batch_size} fold={fold}: temp {ma.temp_size_in_bytes/gib:.2f} GiB, "
      f"args {ma.argument_size_in_bytes/gib:.2f}, out {ma.output_size_in_bytes/gib:.2f}, "
      f"alias {ma.alias_size_in_bytes/gib:.2f}")
