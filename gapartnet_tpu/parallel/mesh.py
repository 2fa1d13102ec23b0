"""SPMD mesh + sharding helpers.

Replaces the reference's Lightning-DDP/NCCL data parallelism
(gapartnet.yaml:69-71, dataset/data_utils.py:15-37) with jax.sharding: a 1-D
"dp" mesh shards every batch-leading array; parameters and optimizer state are
replicated.  XLA inserts the gradient all-reduce over ICI automatically —
there is no explicit collective code, matching the scaling-book recipe
(pick a mesh, annotate shardings, let XLA insert collectives).

The model is small (< 2M params, channels <= 112), so pure DP is the right
parallelism; the helpers are written so extra axes (e.g. "mp") can be added
to the mesh without touching call sites.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = "dp",
    devices: Optional[Sequence] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} devices are available"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dimension; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis_name: str = "dp"):
    """Place every array leaf with its leading dim sharded over the mesh.

    Host metadata (non-array leaves such as pc_ids) passes through untouched.
    """
    sh = batch_sharding(mesh, axis_name)

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sh)
        return x

    return jax.tree_util.tree_map(put, tree)


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
