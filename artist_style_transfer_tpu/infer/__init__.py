"""Inference: feed-forward stylization, display figures, classifier evaluation.

Replaces the reference's edit-the-constants script (inference.py, which runs
on import) with a function API + CLI. Display mode reproduces
inference.py:70-152; quantitative eval reproduces inference.py:153-166.
"""

from artist_style_transfer_tpu.infer.stylize import (  # noqa: F401
    load_transfer_params,
    stylize,
    stylize_batched,
    stylize_int8,
    stylize_spatial,
    stylize_spatial_int8,
)
from artist_style_transfer_tpu.infer.evaluate import evaluate_with_classifier  # noqa: F401
from artist_style_transfer_tpu.infer.serve import (  # noqa: F401
    ModelRegistry,
    StylizeServer,
)
