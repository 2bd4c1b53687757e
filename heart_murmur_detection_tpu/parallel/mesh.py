"""Device-mesh / sharding utilities.

The reference is strictly single-GPU (`devices=1` in every Trainer; SURVEY
§2.10) with dead NCCL helpers. The TPU-native equivalent is one
jax.sharding.Mesh over ICI with batch-dim NamedSharding for training and
extraction; gradient/metric reductions become compiler-inserted psums via jit
with sharding annotations (no hand-written collectives needed at this model
scale). The mesh keeps a 'data' axis; tensor/pipeline axes are not warranted
for <=ViT-L encoders but the helpers accept arbitrary axis layouts so a
('replica','data') or ('dcn','ici') 2-level mesh can be dropped in.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Put a host batch onto the mesh, sharded along the leading axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_replicated(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
