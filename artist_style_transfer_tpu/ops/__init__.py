"""TPU-native ops: image transforms, padding, normalization, Gram matrices, losses.

Every op here has a pure-XLA implementation; the hot ones (Gram, instance
norm, fused style loss) additionally have Pallas TPU kernels under
:mod:`artist_style_transfer_tpu.ops.pallas` selected automatically on TPU
backends (``use_pallas='auto'``).
"""

from artist_style_transfer_tpu.ops.image import (  # noqa: F401
    bgr_to_rgb,
    rgb_to_bgr,
    vgg_caffe_preprocess,
    torchvision_normalize,
    resize_bilinear,
    affine_rescale,
    center_crop,
    CAFFE_BGR_MEAN,
    TORCHVISION_MEAN_RGB,
    TORCHVISION_STD_RGB,
)
from artist_style_transfer_tpu.ops.pad import reflect_pad_hw  # noqa: F401
from artist_style_transfer_tpu.ops.norm import instance_norm, batch_norm_inference  # noqa: F401
from artist_style_transfer_tpu.ops.gram import gram_matrix  # noqa: F401
