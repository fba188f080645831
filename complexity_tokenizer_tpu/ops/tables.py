"""Host-side construction of device-resident tables for the encode pipeline.

Built once at tokenizer load (the analogue of the reference's merge-rank
map construction, bpe.rs:52-79), then HBM-resident and replicated across
devices.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.bpe import BpeTokenizer, merges_well_formed
from ..utils.bytelevel import bytes_to_unicode
from .hashtable import PairHashTable, build_pair_table

__all__ = ["DeviceTables", "build_device_tables"]


@dataclass
class DeviceTables:
    byte_token_table: np.ndarray  # [256] int32; -1 = OOV byte (dropped)
    merge_new: np.ndarray  # [R] int32 rank -> minted id
    hash_table: PairHashTable
    well_formed: bool


def build_device_tables(bpe: BpeTokenizer) -> DeviceTables:
    enc = bytes_to_unicode()
    vocab = bpe.vocab
    byte_token = np.full(256, -1, dtype=np.int32)
    for b in range(256):
        tid = vocab.get(enc[b])
        if tid is not None:
            byte_token[b] = tid

    merge_ops = bpe.merge_ops
    max_rank = max(merge_ops) if merge_ops else 0
    merge_new = np.full(max_rank + 1, -1, dtype=np.int32)
    for rank, (_pair, new_id) in merge_ops.items():
        merge_new[rank] = new_id

    table = build_pair_table(bpe.merge_ranks)
    wf = merges_well_formed(bpe.merge_ranks, merge_ops)
    return DeviceTables(byte_token, merge_new, table, wf)
