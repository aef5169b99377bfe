"""A/B: 'cycle' train throughput — direct vs fold_batch='vgg' loss branch.

Usage: python tools/ab_train_fold.py [quantize_loss: none|deep] [legs...]
Reuses bench.measure_train_cycle_throughput (same chained-epoch method).
"""
import sys

sys.path.insert(0, "/root/repo")
from bench import measure_train_cycle_throughput  # noqa: E402
from artist_style_transfer_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
ql = sys.argv[1] if len(sys.argv) > 1 else "deep"
ql = False if ql in ("none", "false") else ql
legs = sys.argv[2:] or ["auto", "vgg"]
for fold in legs:
    v = measure_train_cycle_throughput(
        fold_batch=fold, quantize_loss=ql, quantize_gram="auto"
    )
    print(f"train cycle fold={fold} quantize_loss={ql}: {v:.1f} img/s", flush=True)
