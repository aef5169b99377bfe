"""Training CLI — ``python -m artist_style_transfer_tpu.train_style_transfer``.

The reference's train entry point is the ``train()`` call in train_cnn.py
(README.md:10 names it train_style_transfer.py; SURVEY §0 maps the two).
Flags mirror the ``train()`` kwargs exactly (train_cnn.py:144-146); the
reference has no argparse at all (SURVEY §5 'Config / flag system').
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--style_method", default="random",
                   choices=["random", "average", "smartaverage", "cycle", "classifier"])
    p.add_argument("--artist", default="Albrecht_Dürer")
    p.add_argument("--num_epochs", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--content_data_size", type=int, default=256)
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--num_steps", type=int, default=2)
    p.add_argument("--content_weight", type=float, default=17.0)
    p.add_argument("--style_weight", type=float, default=25.0)
    p.add_argument("--lr", type=float, default=0.0024)
    p.add_argument("--save_every", type=int, default=10)
    # TPU-native extensions
    p.add_argument("--train_size", type=int, default=224)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--model_dir", default="models")
    p.add_argument("--vgg_path", default="models/vgg16-00b39a1b.pth")
    p.add_argument("--classifier_path", default="models/best-2.pth")
    p.add_argument("--content_dir", default="images/content/")
    p.add_argument("--archive_dir", default="images/archive/")
    p.add_argument("--cache_dir", default="dicts/")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batches over all local devices")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 = mixed-precision throughput mode")
    p.add_argument("--precision", default=None,
                   choices=["highest", "default"],
                   help="matmul/conv precision policy (ops/precision.py); "
                        "unset = highest with float32, default (fast MXU "
                        "paths) with bfloat16")
    p.add_argument("--quantize_loss", nargs="?", const="deep", default=None,
                   choices=["deep", "all"],
                   help="run the frozen-VGG loss extractor on the int8 MXU "
                        "(ops/qconv.py); 'deep' = conv3_1..conv4_3 only. "
                        "Inert for classifier mode (just_content VGG + the "
                        "int8 classifier measured slower in training — "
                        "BENCH_NOTES)")
    p.add_argument("--qat", nargs="?", const="trunk", default=None,
                   choices=["trunk", "all"],
                   help="int8-MXU QAT transformer forward/STE backward "
                        "(models/transformer_qat.py); 'trunk' = the 12 "
                        "quarter-res 128-channel convs (the measured win), "
                        "'all' = every interior conv")
    p.add_argument("--quantize_gram", default="auto",
                   choices=["auto", "on", "off"],
                   help="int8-MXU grams for the deep (C>=256) style taps "
                        "(ops/gram.gram_matrix_int8); 'auto' = iff "
                        "--quantize_loss is set")
    p.add_argument("--log_every_batches", type=int, default=12,
                   help="per-batch loss records in metrics.jsonl (0 = off); "
                        "reference BATCH_INFO_EVERY")
    p.add_argument("--preview_every", type=int, default=0,
                   help="write a content/style/transformed preview figure "
                        "every N epochs to models/<artist>/<method>/"
                        "preview_<epoch>.png (0 = off); file-based stand-in "
                        "for the reference's live matplotlib preview "
                        "(train_cnn.py:337-354)")
    p.add_argument("--fold_batch", default="auto",
                   choices=["auto", "on", "vgg", "off"],
                   help="batch->H folding of the C<128 layers in the train "
                        "step: 'auto'/'off' = direct (every fold granularity "
                        "measured slower for training — BENCH_NOTES), 'on' = "
                        "transformer+VGG fold, 'vgg' = loss-branch only")
    p.add_argument("--max_epochs_this_run", type=int, default=None,
                   help="stop after N epochs this invocation and persist the "
                        "resume point (time-sliced runs; continue with "
                        "--resume)")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of the second epoch here")
    p.add_argument("--quiet", action="store_true")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from artist_style_transfer_tpu.utils.cache import enable_compilation_cache
    from artist_style_transfer_tpu.parallel.distributed import initialize_multihost

    enable_compilation_cache()
    initialize_multihost()  # no-op when single-process
    from artist_style_transfer_tpu.ops.precision import set_precision

    prec = args.precision
    if prec is None:
        # bf16 runs want the fast MXU paths; f32 keeps exact torch parity.
        prec = "default" if args.compute_dtype == "bfloat16" else "highest"
    set_precision(prec)
    mesh = None
    if args.data_parallel:
        from artist_style_transfer_tpu.parallel import make_mesh

        mesh = make_mesh()
    from artist_style_transfer_tpu.train import train

    train(
        style_method=args.style_method,
        artist=args.artist,
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,
        content_data_size=args.content_data_size,
        seed=args.seed,
        num_steps=args.num_steps,
        content_weight=args.content_weight,
        style_weight=args.style_weight,
        lr=args.lr,
        save_every=args.save_every,
        train_size=args.train_size,
        weight_decay=args.weight_decay,
        model_dir=args.model_dir,
        vgg_path=args.vgg_path,
        classifier_path=args.classifier_path,
        content_dir=args.content_dir,
        archive_dir=args.archive_dir,
        cache_dir=args.cache_dir,
        mesh=mesh,
        resume=args.resume,
        compute_dtype=args.compute_dtype,
        log_every_batches=args.log_every_batches,
        preview_every=args.preview_every,
        quantize_loss=args.quantize_loss or False,
        qat=args.qat or False,
        quantize_gram={"auto": "auto", "on": True, "off": False}[args.quantize_gram],
        fold_batch={"auto": "auto", "on": True, "vgg": "vgg", "off": False}[args.fold_batch],
        max_epochs_this_run=args.max_epochs_this_run,
        profile_dir=args.profile_dir,
        wordy=not args.quiet,
    )


if __name__ == "__main__":
    main()
