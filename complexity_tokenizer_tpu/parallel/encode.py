"""Sharded batch encode: the encode pipeline over a device mesh.

Batch rows shard over the ``data`` axis; every lookup table is replicated.
The per-row computation has no cross-row dependencies, so XLA partitions
the jitted pipeline without inserting collectives — the multi-chip scaling
story is purely data-parallel, riding ICI (SURVEY §5.8).
"""

from __future__ import annotations

from .mesh import batch_sharding, data_mesh

__all__ = ["shard_encode_pipeline"]


def shard_encode_pipeline(pipeline, mesh=None):
    """Enable mesh sharding on an ``EncodePipeline`` (in place)."""
    if mesh is None:
        mesh = data_mesh()
    pipeline.sharding = batch_sharding(mesh)
    pipeline.n_devices = mesh.devices.size
    return pipeline
