"""Device-mesh construction and sharding helpers.

The reference's parallelism is data-parallel only (DDP over NCCL,
reference: basicsr/models/base_model.py:55-72, basicsr/utils/dist_util.py).
Here data parallelism is a 1-D `jax.sharding.Mesh` over all chips; the
train step is jitted with the batch sharded over the 'data' axis and the
params replicated, so gradient all-reduce is compiled into the step and
rides ICI. The mesh helpers keep room for model axes ('tensor') for the
large EDVR-L variants.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_data_mesh(devices=None, axis_name: str = 'data') -> Mesh:
    """Create a 1-D data-parallel mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def get_2d_mesh(num_data: int, num_tensor: int, devices=None) -> Mesh:
    """Create a ('data', 'tensor') mesh for DP x TP sharding."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[:num_data * num_tensor]).reshape(
        num_data, num_tensor)
    return Mesh(devices, ('data', 'tensor'))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Sharding that splits the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = 'data'):
    """Device-put a host batch (pytree of arrays) sharded on dim 0."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate_tree(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
