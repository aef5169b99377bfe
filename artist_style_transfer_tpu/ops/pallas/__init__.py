"""Pallas TPU kernels for the hot ops.

Policy: a kernel lives here only while it is DISPATCHED and measured faster
end-to-end than the XLA formulation (several round-1/2 kernels — the fused
trunk, the gram+residual fusion, a streaming MSE — were removed after
losing that comparison; see BENCH_NOTES.md). Each kernel has a
numerically-equivalent XLA fallback in its parent module; kernels raise
``NotImplementedError`` for shapes they don't support and the dispatcher
falls back transparently.
"""
