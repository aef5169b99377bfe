"""Global matmul/conv precision policy.

XLA's DEFAULT precision routes f32 contractions through bf16 multiplier
passes (on TPU MXU *and* the CPU backend), costing ~3 decimal digits.
That is fine for training throughput but not for the PSNR>35 checkpoint
parity the reference comparison demands, so precision is an explicit,
globally-switchable policy:

- ``"highest"`` (default): full f32 — parity mode.
- ``"default"``: hardware-native fast path (bf16 passes on the MXU) —
  use for throughput benchmarking and bulk training.
"""

from __future__ import annotations

import contextlib

_PRECISION: str = "highest"


def get_precision() -> str:
    return _PRECISION


def set_precision(p: str) -> None:
    global _PRECISION
    assert p in ("highest", "default", "high")
    if p != _PRECISION:
        _PRECISION = p
        # The policy is read at TRACE time (conv/matmul precision args, the
        # fast-mode fold/factored-op gates), so jitted graphs bake it in;
        # without this, a jit traced under the old policy is silently
        # reused after a flip (e.g. a parity-mode eval reusing a bf16
        # throughput trace). Dropping the in-memory caches forces a
        # retrace; TPU recompiles still hit the persistent on-disk cache.
        import jax

        jax.clear_caches()


@contextlib.contextmanager
def precision(p: str):
    """Temporarily override the global precision policy."""
    prev = get_precision()
    set_precision(p)
    try:
        yield
    finally:
        set_precision(prev)
