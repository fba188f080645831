"""Device mesh utilities.

The reference's entire parallel story is an intra-process rayon thread pool
(SURVEY C22).  The TPU-native equivalent is a ``jax.sharding.Mesh`` with a
``data`` axis: batch work shards across chips/hosts over ICI/DCN, lookup
tables stay replicated.  ``jax.distributed.initialize`` is the multi-host
entry point; single-host meshes need no initialization.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "data_mesh",
    "batch_sharding",
    "replicated_sharding",
    "initialize_distributed",
]

DATA_AXIS = "data"


def initialize_distributed(**kwargs) -> None:
    """Multi-host runtime init (no-op if already initialized)."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the ``data`` axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
