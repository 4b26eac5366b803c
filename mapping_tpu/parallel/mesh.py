"""Mesh construction and sharding helpers (data-parallel axis 'data').

TPU-native replacement for nn.DataParallel (reference src/models.py:65,
src/steps/pytorch/models.py:53): one jitted SPMD program; the global batch is
sharded over the mesh's 'data' axis, parameters/optimizer state are
replicated, and gradient reduction rides ICI via XLA collectives. A second
'model' axis is laid out (size 1 by default) so tensor-sharding can be turned
on without re-plumbing callers.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None, model_parallel: int = 1) -> Mesh:
    """Mesh of shape (n_devices // model_parallel, model_parallel) with axes
    ('data', 'model')."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = devices.reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in `batch` with its leading axis sharded over 'data'.

    The global batch size must divide the data-axis size.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def shard_batch_stacked(batches, mesh: Mesh):
    """Place a (K, B, ...) stack of K batches with axis 1 (the per-step batch
    axis) sharded over 'data' — the layout the multi-step train scan
    (train/step.py make_train_step_multi) consumes on a mesh."""
    sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding),
                                  batches)


def shard_pytree_replicated(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
