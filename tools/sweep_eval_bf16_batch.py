#!/usr/bin/env python
"""Batch sweep of the DIRECT bf16 eval pipeline on the chip.

Fills the asymmetry VERDICT r03 flagged: the int8 eval pipeline was swept
to its b128 optimum (BENCH_NOTES round-3 table) while bf16 was only ever
measured at b16 — the folded path's fresh-compile crash blocked a folded
sweep, but the direct path (the round-4 default) compiles fine. One
process, one chip, sequential batches.

Usage: python tools/sweep_eval_bf16_batch.py [b1 b2 ...]   (default sweep)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import measure_eval_throughput  # noqa: E402


def main() -> None:
    batches = [int(b) for b in sys.argv[1:]] or [16, 32, 64, 96, 128]
    results = {}
    for b in batches:
        v = measure_eval_throughput(batch_size=b, quantize=False)
        results[b] = round(v, 1)
        print(json.dumps({"metric": "eval_bf16_direct_288", "batch": b,
                          "images_per_sec": results[b]}), flush=True)
    best = max(results, key=results.get)
    print(f"best: b{best} = {results[best]} img/s", flush=True)


if __name__ == "__main__":
    main()
