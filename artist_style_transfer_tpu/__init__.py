"""artist_style_transfer_tpu — a TPU-native JAX framework for artist style transfer.

A from-scratch rebuild of the capabilities of `edogariu/artist-style-transfer`
(reference mounted at /root/reference) designed TPU-first:

- All compute paths are jit-compiled XLA graphs; hot ops (Gram matrices,
  instance norm, fused style losses) have Pallas TPU kernels with XLA
  fallbacks.
- Data lives on device: the content corpus and per-painting Gram targets are
  HBM-resident arrays indexed inside jit (``lax.dynamic_index_in_dim``),
  eliminating the per-step host->device copies of the reference
  (reference train_cnn.py:298, :323).
- Data parallelism is first-class via ``jax.sharding.Mesh`` +
  ``NamedSharding``; gradients are averaged by XLA-inserted all-reduce over
  ICI (see :mod:`artist_style_transfer_tpu.parallel`).

Canonical tensor conventions (replacing the reference's implicit ones,
reference SURVEY §1):

- Images are **NHWC**, **BGR** channel order, pixel range **[0, 255]**,
  dtype **float32** (the reference is NCHW/BGR/[0,255]/float64;
  NHWC is the native TPU conv layout and f32 is ample for PSNR>35 parity).
- VGG (Caffe-style) preprocessing subtracts the BGR ImageNet mean
  [103.939, 116.779, 123.68] (reference train_cnn.py:164-165).
- The classifier (torchvision-style) expects RGB/[0,1] normalized by
  mean [0.485, 0.456, 0.406], std [0.229, 0.224, 0.225]
  (reference inference.py:56-59).
"""

__version__ = "0.1.0"

from artist_style_transfer_tpu.utils.config import TrainConfig, InferenceConfig  # noqa: F401
