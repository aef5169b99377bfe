"""Data pipeline: host-side decode, rescale, corpus caches, device prefetch.

Decode is inherently host work (SURVEY §7 step 1); everything after the
single host->device transfer of a corpus stays TPU-resident. The reference's
6-pickle scheme (dataset.py:166-193) is replaced by one ``.npz`` per corpus
with a static shape fixed at cache-build time, and the reference pickle
caches are still readable for drop-in compatibility.
"""

from artist_style_transfer_tpu.data.datasets import (  # noqa: F401
    get_avg_dataset,
    get_content_dataset,
    get_painting_dataset,
    load_artist_names,
    rescale_image,
)
from artist_style_transfer_tpu.data.prefetch import device_prefetch  # noqa: F401
from artist_style_transfer_tpu.data.stream import content_file_stream  # noqa: F401
