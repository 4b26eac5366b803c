"""Device-mesh parallelism layer.

The reference's only parallelism is single-process `nn.DataParallel`
(src/models.py:65) — replicate module, scatter batch over local GPUs. Here
the equivalent is SPMD over a `jax.sharding.Mesh`: the batch is sharded over
the 'data' axis, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI (SURVEY.md §2g).
"""

from mapping_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_batch_stacked,
    shard_pytree_replicated,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_batch_stacked",
    "shard_pytree_replicated",
]
