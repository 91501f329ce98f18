"""Mesh construction and sharding for data-parallel training.

The reference's scaling story is single-process nn.DataParallel over local
GPUs (train.py:61; SURVEY.md §2.i). The TPU-native equivalent: a
`jax.sharding.Mesh` with a `data` axis; batches are sharded over it, parameters
replicated, and XLA inserts the gradient psum over ICI — no explicit
collectives in user code. Models here are small (MBs), so pure DP is the
right layout; the ray axis within each example is already device-local.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """A 1D mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Place a host batch pytree on the mesh, leading axis sharded."""
    sharding = batch_sharding(mesh, axis_name)

    def place(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (parameters, train state) on every device."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
