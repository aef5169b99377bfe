"""Pallas TPU kernels for the hot ops (Gram, instance norm, fused style loss).

Each kernel has a numerically-equivalent XLA fallback in its parent module;
kernels raise ``NotImplementedError`` for shapes they don't support and the
dispatcher falls back transparently.
"""
