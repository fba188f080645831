"""Host-side construction of device-resident tables for the encode pipeline.

Built once at tokenizer load (the analogue of the reference's merge-rank
map construction, bpe.rs:52-79), then HBM-resident and replicated across
devices.  The pair table is a CHD perfect hash (see ops/hashtable.py) so
the merge kernel needs exactly two gathers per rank lookup.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.bpe import BpeTokenizer, merges_well_formed
from ..utils.bytelevel import bytes_to_unicode
from .hashtable import ChdTable, QcTable, build_chd_table, build_qc_table

__all__ = ["DeviceTables", "build_device_tables"]


@dataclass
class DeviceTables:
    byte_token_table: np.ndarray  # [256] int32; -1 = OOV byte (dropped)
    chd: ChdTable | None
    well_formed: bool
    # quotient-cuckoo form (round 4): the preferred merge-kernel table —
    # one u32 per slot, two independent gathers per probe (~3x cheaper
    # per fixpoint iteration than the CHD chain).  None when ineligible
    # (u16 overflow / non-affine minted ids); the CHD stays the fallback
    # and serves the wordpiece/unigram token-lookup kernels.
    qc: QcTable | None = None


def build_device_tables(bpe: BpeTokenizer) -> DeviceTables:
    enc = bytes_to_unicode()
    vocab = bpe.vocab
    byte_token = np.full(256, -1, dtype=np.int32)
    for b in range(256):
        tid = vocab.get(enc[b])
        if tid is not None:
            byte_token[b] = tid

    chd = build_chd_table(bpe.merge_ranks, bpe.merge_ops)
    wf = merges_well_formed(bpe.merge_ranks, bpe.merge_ops)
    qc = build_qc_table(bpe.merge_ranks, bpe.merge_ops)
    return DeviceTables(byte_token, chd, wf, qc)
