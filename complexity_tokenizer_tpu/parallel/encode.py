"""Sharded batch encode: the encode pipeline over a device mesh.

Batch rows shard over the ``data`` axis; every lookup table is replicated.
The per-row computation has no cross-row dependencies, so XLA partitions
the jitted pipeline without inserting collectives — the multi-chip scaling
story is purely data-parallel, riding ICI (SURVEY §5.8).
"""

from __future__ import annotations

from .mesh import batch_sharding, data_mesh

__all__ = ["shard_encode_pipeline", "shard_word_encoder"]


def shard_encode_pipeline(pipeline, mesh=None):
    """Enable mesh sharding on an ``EncodePipeline`` (in place)."""
    if mesh is None:
        mesh = data_mesh()
    pipeline.sharding = batch_sharding(mesh)
    pipeline.n_devices = mesh.devices.size
    return pipeline


def shard_word_encoder(word_encoder, mesh=None):
    """Enable mesh sharding on a ``DeviceWordEncoder`` (in place): the
    distinct-word matrix rows shard over the ``data`` axis, tables
    replicated — each chip merges its slice of the new words."""
    if mesh is None:
        mesh = data_mesh()
    word_encoder.sharding = batch_sharding(mesh)
    return word_encoder
