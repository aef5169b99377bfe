"""Benchmark: stylized 512x512 images/sec/chip (BASELINE.json headline metric).

The FINAL printed line is the headline JSON (the driver parses the last
line):
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

The default run additionally prints the train ('cycle' int8-loss b128, vs
the 1,000 img/s target) and eval (int8 pipeline, vs the torch-CPU eval
loop) headline metrics as their own JSON lines BEFORE it — driver-captured
evidence for all three numbers (``--headline-only`` suppresses them;
``--train`` / ``--eval [--quantize]`` run a single metric as before).

``vs_baseline`` on the stylize line compares against the PyTorch-CPU
reference throughput (float64 eager TransformerNet at 512x512, batch 1 —
the reference's configuration per train_cnn.py:25-44/inference.py:108-116),
measured once under a PINNED protocol (explicit thread count, min-of-N)
with the torch oracle from tests/torch_ref.py and committed in
.baseline_torch_cpu.json, since the reference publishes no numbers
(BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".baseline_torch_cpu.json")
SIZE = 512


def _min_time(thunk, repeats: int = 5) -> float:
    """Minimum wall-clock of ``repeats`` calls.

    The relayed TPU backend's RPC latency occasionally spikes by several
    hundred ms; a single-shot timing of a sub-second device call can be
    off several-fold (measured: the --train leg read 5114 then 559 img/s
    back-to-back). The min over a few repeats is the standard robust
    estimator for 'true cost without stalls'."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        thunk()
        best = min(best, time.perf_counter() - t0)
    return best


def measure_torch_cpu_baseline(repeats: int = 3, threads: int | None = None) -> dict:
    """f64 eager PyTorch CPU stylization throughput at 512x512 (reference config).

    PINNED measurement (round 5 — the round-1..4 baselines drifted 3.4x,
    0.0182..0.0622 img/s, because the single-shot timing of a ~1-minute f64
    eager forward ran with unpinned threads on a contended 1-core box):
    the torch thread count is set explicitly, the timing is the MIN over
    ``repeats`` calls (throughput of the least-stalled run), and the full
    measurement config is returned so the cache file documents itself.
    """
    import numpy as np
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from torch_ref import TorchTransformerNet

    threads = threads if threads is not None else (os.cpu_count() or 1)
    torch.set_num_threads(threads)
    torch.manual_seed(0)
    net = TorchTransformerNet().double().eval()
    x = torch.from_numpy(
        (np.random.default_rng(0).random((1, 3, SIZE, SIZE)) * 255)
    ).double()
    with torch.no_grad():
        net(x)  # warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            net(x)
            best = min(best, time.perf_counter() - t0)
    return {
        "images_per_sec": 1.0 / best,
        "config": f"torch-cpu f64 {SIZE}x{SIZE} b1",
        "threads": threads,
        "repeats": repeats,
        "timing": "min over repeats of a single forward",
        "torch": torch.__version__,
        "measured": time.strftime("%Y-%m-%d"),
    }


def get_baseline() -> float:
    """Pinned torch-CPU baseline (cached in .baseline_torch_cpu.json).

    The cache file is committed so every driver round divides by the SAME
    measured denominator; it self-documents the measurement config. A
    legacy cache without the config fields (the source of the round-1..4
    3.4x drift) is re-measured once under the pinned protocol.
    """
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        if "threads" in cached:  # pinned-protocol cache
            return cached["images_per_sec"]
    rec = measure_torch_cpu_baseline()
    try:
        with open(BASELINE_CACHE, "w") as f:
            json.dump(rec, f, indent=1)
    except OSError:
        pass
    return rec["images_per_sec"]


def measure_tpu_throughput(batch_size: int = 128, iters: int = 10) -> float:
    """Jitted TransformerNet stylization throughput at 512x512 on one chip.

    Iterations are CHAINED (each step consumes the previous output) so the
    measurement reflects real device execution — independent async dispatches
    can otherwise overlap/queue in ways that make the wall-clock meaningless.

    Dispatch order mirrors the serving fast paths, falling back if a leg
    ever fails to compile on a new toolchain (the bench must always
    produce a number):
      1. int8-MXU quantized net (infer.stylize_int8; ~64 dB PSNR vs the
         f32 parity path on the golden net, tests/test_quant.py);
      2. direct bf16 (~90 dB PSNR; the dispatched bf16 winner — 1014.9
         vs 1012.5 img/s folded, and the fold SIGABRTs fresh compiles on
         the round-3/4 toolchain);
      3. bf16 batch->H folded (last resort, kept for older toolchains
         where it compiled).
    All are far above the 35 dB parity bar; the f32 'highest' parity mode
    is covered by tests.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from artist_style_transfer_tpu.models.transformer import (
        init_transformer_params,
        transformer_apply,
    )
    from artist_style_transfer_tpu.models.transformer_q import (
        quantize_transformer,
        transformer_apply_int8,
    )
    from artist_style_transfer_tpu.ops.precision import set_precision

    set_precision("default")

    params = init_transformer_params(jax.random.key(0))
    params_bf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jnp.asarray(
        (np.random.default_rng(0).random((batch_size, SIZE, SIZE, 3)) * 255),
        jnp.bfloat16,
    )

    import functools

    def make_chain(apply):
        @functools.partial(jax.jit, static_argnums=(2,))
        def chain(p, x, n):
            def body(y, _):
                # keep values bounded across the chain, like repeated
                # stylization
                y = jnp.clip(apply(p, y), 0.0, 255.0).astype(x.dtype)
                return y, None

            y, _ = jax.lax.scan(body, x, None, length=n)
            # Return a scalar: fetching the full output would measure the
            # host<->device link, not the chip. A device_get of the scalar
            # is the only reliable completion barrier on relayed backends
            # (where block_until_ready returns early).
            return jnp.sum(y[:1, :1, :1, :].astype(jnp.float32))

        return chain

    legs = []
    try:
        calib = jnp.asarray(
            np.random.default_rng(1).random((2, 256, 256, 3)) * 255, jnp.float32
        )
        legs.append(
            (
                quantize_transformer(params, calib),
                make_chain(
                    functools.partial(transformer_apply_int8, accum=jnp.bfloat16)
                ),
            )
        )
    except Exception:
        pass
    legs.append(
        (params_bf, make_chain(functools.partial(transformer_apply, fold_batch=False)))
    )
    legs.append(
        (params_bf, make_chain(functools.partial(transformer_apply, fold_batch=True)))
    )

    for p, chain in legs:
        try:
            float(chain(p, x, 1))
            chain = functools.partial(chain, p)
            break
        except Exception:
            continue
    else:
        raise RuntimeError("no stylize leg compiled")

    float(chain(x, 1))  # compile + warm both lengths
    float(chain(x, iters))
    # Difference removes the constant dispatch/RPC overhead; min-of-repeats
    # removes the relay's occasional several-hundred-ms RPC spikes (one
    # spike on a single-shot timing can swing the result several-fold —
    # measured round 4 on the --train leg: 5114 vs 559 img/s back-to-back).
    d1 = _min_time(lambda: float(chain(x, 1)))
    dn = _min_time(lambda: float(chain(x, iters)))
    dt = (dn - d1) / (iters - 1)
    return batch_size / dt


def measure_train_cycle_throughput(
    batch_size: int = 128, train_size: int = 224, fold_batch="auto",
    quantize_loss=False, qat=False, quantize_gram="auto",
) -> float:
    """'cycle'-mode training images/sec at reference hyperparams (224x224).

    BASELINE.json's second target (>1k images/sec). One full jitted epoch
    over an HBM-resident corpus; per-image cost from the difference between
    a 1-step and a full epoch run (removes dispatch/RPC constants).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from artist_style_transfer_tpu.models.transformer import init_transformer_params
    from artist_style_transfer_tpu.models.vgg import init_vgg16_params
    from artist_style_transfer_tpu.ops.precision import set_precision
    from artist_style_transfer_tpu.train.loop import (
        epoch_permutation,
        make_optimizer,
        make_step_fns,
        precompute_content_relu2_2,
    )
    from artist_style_transfer_tpu.train.styles import build_style_targets

    set_precision("default")
    rng = np.random.default_rng(0)

    def build(n_content):
        content = jnp.asarray(
            rng.random((n_content, train_size, train_size, 3), np.float32) * 255
        )
        paintings = (rng.random((4, train_size, train_size, 3)) * 255).astype(np.float32)
        params = init_transformer_params(jax.random.key(0))
        vgg_params = init_vgg16_params(jax.random.key(1))
        if quantize_loss:
            from artist_style_transfer_tpu.models.vgg import quantize_vgg16_loss

            vgg_params = quantize_vgg16_loss(
                vgg_params,
                layers="deep" if quantize_loss is True else quantize_loss,
                dtype=jnp.bfloat16,
            )
        targets = build_style_targets(
            "cycle", vgg_params, "bench", paintings=paintings, batch_size=batch_size
        )
        tx = make_optimizer(0.0024, 1e-4, 2, 2, n_content // batch_size)
        fns = make_step_fns(
            "cycle", vgg_params, None, targets,
            content_weight=17.0, style_weight=25.0,
            batch_size=batch_size, num_content=n_content, tx=tx,
            # remat measured 27% slower here: the bf16 relu2_2 cache freed
            # enough HBM that b96 fits without it, and the recomputed
            # forward costs ~40 ms/step (round-2 profiling).
            compute_dtype="bfloat16", remat=False, fold_batch=fold_batch,
            qat=qat, quantize_gram=quantize_gram,
        )
        r22 = precompute_content_relu2_2(vgg_params, content, dtype=jnp.bfloat16)
        opt_state = tx.init(params)
        return fns, params, opt_state, content, r22, targets

    def run(fns, params, opt_state, content, r22, targets):
        perm = epoch_permutation(0, 0, content.shape[0])
        params, opt_state, losses = fns.epoch_fn(
            params, opt_state, content, r22, targets.grams, None, perm, jnp.int32(0)
        )
        float(losses[-1, 2])  # completion barrier via scalar fetch
        return params, opt_state

    # Measure sequentially and free each corpus before the next — holding
    # both resident (plus activations) exceeds HBM at larger batches.
    small = build(batch_size)  # 1 step/epoch
    # epoch_fn donates params/opt_state, so each timed repeat must consume
    # the previous repeat's returned state. min-of-repeats guards against
    # the relay's RPC latency spikes (see _min_time).
    s_state = [run(*small)]  # compile + warm

    def timed_small():
        s_state[0] = run(small[0], *s_state[0], *small[3:])

    d1 = _min_time(timed_small)
    del small, s_state

    n_steps = 6
    big = build(batch_size * n_steps)
    b_state = [run(*big)]

    def timed_big():
        b_state[0] = run(big[0], *b_state[0], *big[3:])

    dn = _min_time(timed_big)
    per_step = (dn - d1) / (n_steps - 1)
    return batch_size / per_step


EVAL_BASELINE_CACHE = os.path.join(
    os.path.dirname(__file__), ".baseline_torch_cpu_eval.json"
)


def measure_torch_cpu_eval_baseline(
    size: int = 288, repeats: int = 3, threads: int | None = None
) -> dict:
    """f64 eager torch-CPU eval-loop throughput: stylize -> crop -> classify.

    Mirrors the reference's image-by-image quantitative eval
    (inference.py:104-166: batch 1, float64, full host round trip per
    image) at the same image size bench's jitted eval uses, with the
    tests/torch_ref oracles standing in for the missing pretrained nets.
    Pinned protocol (threads set explicitly, min-of-repeats, config
    recorded) — see measure_torch_cpu_baseline.
    """
    import numpy as np
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from torch_ref import TorchTransformerNet, make_torch_classifier

    threads = threads if threads is not None else (os.cpu_count() or 1)
    torch.set_num_threads(threads)
    torch.manual_seed(0)
    net = TorchTransformerNet().double().eval()
    clf = make_torch_classifier(19).double().eval()
    x = torch.from_numpy(
        (np.random.default_rng(0).random((1, 3, size, size)) * 255)
    ).double()
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1).double()
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1).double()

    def one():
        with torch.no_grad():
            out = net(x)
            out = torch.clip(out, 0, 255.0)[:, [2, 1, 0]] / 255.0  # BGR->RGB [0,1]
            lo = (size - 256) // 2
            out = out[:, :, lo : lo + 256, lo : lo + 256]  # CenterCrop(256)
            return torch.argmax(clf((out - mean) / std), dim=1)

    one()  # warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        one()
        best = min(best, time.perf_counter() - t0)
    return {
        "images_per_sec": 1.0 / best,
        "config": f"torch-cpu f64 {size}->crop256 b1",
        "threads": threads,
        "repeats": repeats,
        "timing": "min over repeats of a single stylize->crop->classify pass",
        "torch": torch.__version__,
        "measured": time.strftime("%Y-%m-%d"),
    }


def get_eval_baseline() -> float:
    """Pinned torch-CPU eval baseline (committed cache; see get_baseline)."""
    if os.path.exists(EVAL_BASELINE_CACHE):
        with open(EVAL_BASELINE_CACHE) as f:
            cached = json.load(f)
        if "threads" in cached:  # pinned-protocol cache
            return cached["images_per_sec"]
    rec = measure_torch_cpu_eval_baseline()
    try:
        with open(EVAL_BASELINE_CACHE, "w") as f:
            json.dump(rec, f, indent=1)
    except OSError:
        pass
    return rec["images_per_sec"]


def measure_eval_throughput(
    batch_size: int | None = None, size: int = 288, iters: int = 8,
    quantize: bool = False,
) -> float:
    """Quantitative-eval pipeline images/sec: stylize -> crop -> classify.

    The reference's eval loop (inference.py:104-166) runs image-by-image
    with host round trips; here the whole pipeline is one jitted graph.
    ``quantize=True`` runs the int8-MXU pipeline (quantized stylizer +
    quantized frozen classifier — infer.evaluate._eval_batch_int8).
    Default batch follows the measured optimum per path — b128 for BOTH
    (BENCH_NOTES round-3 int8 sweep: 2984 img/s; round-4 bf16 direct
    sweep: 1600.4 img/s, monotonic b16->b128). The bf16 leg runs the
    direct (unfolded) program — the dispatched winner (814 vs 644 img/s
    at b16) and the only one this toolchain's compile helper can freshly
    compile.
    """
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from artist_style_transfer_tpu.infer.evaluate import (
        _eval_batch,
        _eval_batch_int8,
        quantize_eval_pipeline,
    )
    from artist_style_transfer_tpu.models.resnet import init_classifier_params
    from artist_style_transfer_tpu.models.transformer import init_transformer_params
    from artist_style_transfer_tpu.ops.precision import set_precision

    set_precision("default")
    if batch_size is None:
        batch_size = 128
    params = init_transformer_params(jax.random.key(0))
    clf = init_classifier_params(jax.random.key(1))
    x = jnp.asarray(
        np.random.default_rng(0).random((batch_size, size, size, 3)) * 255, jnp.float32
    )
    if quantize:
        params, clf = quantize_eval_pipeline(params, clf, x[:2])

    def make_chain(eval_fn):
        @functools.partial(jax.jit, static_argnums=1)
        def chain(x, n):
            def body(carry, _):
                preds = eval_fn(params, clf, carry)
                # real data dependence on the preds (a *0 gets
                # constant-folded and the whole loop elided — measured!)
                return carry + jnp.sum(preds).astype(carry.dtype) * 1e-12, None

            y, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(y)

        return chain

    if quantize:
        chain = make_chain(_eval_batch_int8)
    else:
        chain = make_chain(functools.partial(_eval_batch, fold_batch=False))

    float(chain(x, 1))
    float(chain(x, iters))
    d1 = _min_time(lambda: float(chain(x, 1)))  # see _min_time: relay spikes
    dn = _min_time(lambda: float(chain(x, iters)))
    return batch_size / ((dn - d1) / (iters - 1))


def _eval_record(quantize: bool, config: str | None = None) -> dict:
    eval_baseline = get_eval_baseline()
    value = measure_eval_throughput(quantize=quantize)
    rec = {
        "metric": "classifier_eval_288_images_per_sec",
        "value": round(value, 2),
        "unit": "images/sec",
        # vs the measured torch-CPU f64 image-by-image eval loop
        # (the reference's configuration, inference.py:104-166)
        "vs_baseline": round(value / eval_baseline, 2),
    }
    if config is not None:
        rec["config"] = config
    return rec


def _train_record(quantize_loss=False, qat=False, config: str | None = None) -> dict:
    value = measure_train_cycle_throughput(quantize_loss=quantize_loss, qat=qat)
    rec = {
        "metric": "train_cycle_224_images_per_sec",
        "value": round(value, 2),
        "unit": "images/sec",
        "vs_baseline": round(value / 1000.0, 2),  # vs the 1k img/s target
    }
    if config is not None:
        rec["config"] = config
    return rec


def main() -> None:
    import sys

    from artist_style_transfer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if "--eval" in sys.argv:
        q = "--quantize" in sys.argv
        print(json.dumps(_eval_record(quantize=q, config=("int8" if q else "bf16") + " b128/288")))
        return
    if "--train" in sys.argv:
        # "auto" resolves to the direct (unfolded) path — the batch->H fold
        # measured 3x slower for training on chip (see train/loop.py).
        # --quantize-loss [deep|all]: int8-MXU frozen-VGG loss path.
        ql = False
        if "--quantize-loss" in sys.argv:
            i = sys.argv.index("--quantize-loss")
            nxt = sys.argv[i + 1] if i + 1 < len(sys.argv) else ""
            ql = nxt if nxt in ("deep", "all") else True
        # --qat [trunk|all]: int8-MXU QAT transformer fwd/STE bwd
        # (models/transformer_qat.py; 'trunk' is the measured win).
        qat = False
        if "--qat" in sys.argv:
            i = sys.argv.index("--qat")
            nxt = sys.argv[i + 1] if i + 1 < len(sys.argv) else ""
            qat = nxt if nxt in ("trunk", "all") else True
        cfg = "b128/224"
        if ql:
            cfg = f"int8-loss {'deep' if ql is True else ql} " + cfg
        if qat:
            cfg = f"qat {'trunk' if qat is True else qat} " + cfg
        print(json.dumps(_train_record(quantize_loss=ql, qat=qat, config=cfg)))
        return

    # Default (the driver's end-of-round run): ALL THREE headline metrics.
    # The train and eval lines print FIRST — the driver parses the FINAL
    # line as the headline and records the earlier ones as captured tail
    # evidence (VERDICT r4 #2: the unmet 1k train target and the eval
    # numbers were previously builder-recorded only). Each extra leg runs
    # in its OWN SUBPROCESS (sequential — still one TPU process at a
    # time): measured in-process, the train leg's residual device state
    # depressed the following eval reading 15% (2527 vs 2968 img/s solo);
    # isolation also makes the legs fail-soft, so the stylize headline
    # always prints even if a toolchain change breaks a train/eval
    # compile.
    if "--headline-only" not in sys.argv:
        import subprocess

        extras = (
            # the dispatched train fast path (int8 frozen-VGG loss, b128) —
            # the number measured against the 1,000 img/s single-chip target
            ["--train", "--quantize-loss", "deep"],
            # the dispatched eval fast path (int8 stylizer + int8 ResNet-50)
            ["--eval", "--quantize"],
        )
        # Elapsed budget for the extras: the stylize headline MUST print
        # last before any outer driver timeout — a run killed mid-extras
        # would leave a train/eval line as the final (parsed) line. The
        # budget gates leg STARTS only; a started leg runs to completion
        # (killing a TPU-attached child mid-compile/execute is the abrupt
        # death CLAUDE.md warns can wedge the relay the headline needs
        # next). The per-leg timeout is a fixed hang backstop — if it
        # fires, the relay is already wedged and the kill changes nothing.
        budget_s = float(os.environ.get("GRAFT_BENCH_EXTRA_BUDGET_S", "1500"))
        t0 = time.monotonic()
        for leg_args in extras:
            if time.monotonic() - t0 > budget_s:
                print(
                    json.dumps(
                        {"metric": "bench_extra_leg_skipped",
                         "leg": " ".join(leg_args),
                         "reason": f"extras over budget ({budget_s:.0f}s)"}
                    ),
                    flush=True,
                )
                continue
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), *leg_args],
                    capture_output=True, text=True, timeout=3600,
                )
                lines = [
                    ln for ln in out.stdout.splitlines() if ln.startswith("{")
                ]
                if out.returncode != 0 or not lines:
                    raise RuntimeError(
                        f"leg {leg_args} rc={out.returncode}: "
                        f"{(out.stderr or out.stdout)[-300:]}"
                    )
                print(lines[-1], flush=True)
            except Exception as e:  # fail-soft: never block the headline
                print(
                    json.dumps(
                        {
                            "metric": "bench_extra_leg_failed",
                            "leg": " ".join(leg_args),
                            "error": f"{type(e).__name__}: {str(e)[-300:]}",
                        }
                    ),
                    flush=True,
                )
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
