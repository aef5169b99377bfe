"""Model zoo: TransformerNet (stylizer), VGG16 feature extractor, ResNet-50 artist classifier.

All models are pure functions over explicit parameter pytrees (nested dicts
of jnp arrays) — no module framework, no mutable state. This keeps weight
import from the reference's ``.pth`` checkpoints a mechanical tree mapping
and makes every forward pass trivially jit/vmap/pjit-able.
"""

from artist_style_transfer_tpu.models.transformer import (  # noqa: F401
    init_transformer_params,
    transformer_apply,
    TRANSFORMER_PARAM_COUNT,
)
from artist_style_transfer_tpu.models.transformer_q import (  # noqa: F401
    calibrate_transformer,
    quantize_transformer,
    transformer_apply_int8,
)
from artist_style_transfer_tpu.models.vgg import (  # noqa: F401
    init_vgg16_params,
    vgg16_features,
    VGG_LAYER_NAMES,
)
from artist_style_transfer_tpu.models.resnet import (  # noqa: F401
    init_classifier_params,
    classifier_apply,
    ARTISTS_19,
)
