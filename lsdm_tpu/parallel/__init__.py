"""Multi-chip scaling: mesh construction + sharding policies.

The reference has no working distributed path (SURVEY.md §2.10: DDP stubbed
out, NCCL init commented).  Here scaling is native: a 2-D
``Mesh(("data", "model"))`` over ICI, batch sharded on ``data``, the
flattened object axis of the point-cloud backbone additionally sharded on
``model`` (the backbone processes B*9 clouds — the dominant FLOPs), params
replicated, gradient reduction inserted by XLA SPMD.
"""

from lsdm_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    initialize_distributed,
)
