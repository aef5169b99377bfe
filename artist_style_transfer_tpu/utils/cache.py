"""Persistent XLA compilation cache.

First-compile latency dominates short runs (tens of seconds on-chip;
minutes over a relayed link), and the reference-scale models compile to a
handful of distinct programs. Enabling the on-disk cache makes every rerun
start hot. Called by the CLIs, bench, and the graft entry.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/ast_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    d = path or os.environ.get("AST_TPU_COMPILATION_CACHE", _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags: harmless
