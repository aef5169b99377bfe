"""Multi-chip parallelism: mesh construction + named shardings.

The reference is single-device (SURVEY §2 parallelism table: no DP/TP/PP,
no comm backend). Here data parallelism is first-class: a 1-D ``Mesh`` over
all local devices, batches sharded on the 'data' axis, parameters
replicated, and gradient averaging performed by the XLA-inserted all-reduce
over ICI. Multi-host scaling uses ``jax.distributed.initialize`` + the same
GSPMD program over DCN.
"""

from artist_style_transfer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from artist_style_transfer_tpu.parallel.distributed import (  # noqa: F401
    initialize_multihost,
    make_global,
    per_host_batch_slice,
)
