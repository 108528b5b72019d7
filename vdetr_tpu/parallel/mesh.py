"""Device mesh + sharding helpers.

The reference scales with one process per GPU + DDP/NCCL
(main.py:588-593, utils/dist.py). The TPU-native equivalent is a single
process driving a `jax.sharding.Mesh`; data parallelism = batch-sharded
inputs, gradient psum, and sync-BN pmean inside `shard_map`. All
collectives ride ICI; nothing here depends on host count.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Tuple[str, ...] = ("data",),
              shape: Tuple[int, ...] = (-1,),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    arr = np.array(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch dict onto the mesh, sharded along dim 0."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
