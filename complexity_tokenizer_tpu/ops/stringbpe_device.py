"""Device string-symbol BPE: CharBPE / ByteLevelBpeModel share the C1 kernel.

These two models run the reference's merge loop over STRING symbols
(models.rs:487-515, 520-589) rather than vocab ids — a merged symbol that
is not in the final vocab still participates in later merges and only
collapses to UNK at output time.  The device mapping (SURVEY C17 "CharBPE
shares C1 kernel with suffix handling"):

- Every string appearing in the merge table (left, right, product) gets a
  dense *symbol id*; per-batch characters outside that universe get
  temporary ids past the end — they can never match a merge pair, so they
  flow through the kernel untouched, exactly like the host loop.
- The merge table becomes the same CHD perfect-hash pair table as the main
  pipeline, and the fixpoint loop is ops/merge.merge_word_rows verbatim.
- Batch-apply is order-equivalent to the host's one-merge-per-iteration
  loop only for well-formed tables (core.bpe.merges_well_formed); the
  builder declines otherwise and callers keep the host path.
- Output symbol ids map back to strings on host, then to final vocab ids
  with UNK for out-of-vocab products (models.rs:533, 648).
"""

from __future__ import annotations

import functools

import numpy as np

from ..core.bpe import merges_well_formed
from .hashtable import build_chd_table

__all__ = ["StringBpeDevice", "build_string_bpe_device"]

_W = 128  # symbol lanes per word row


def build_string_bpe_device(
    merge_ranks: dict[tuple[str, str], int]
) -> "StringBpeDevice | None":
    """Device runner for a string-pair merge table; None when the table is
    empty, over-wide, or not well-formed for batch application."""
    if not merge_ranks:
        return None
    sym_id: dict[str, int] = {}

    def sid(s: str) -> int:
        i = sym_id.get(s)
        if i is None:
            i = len(sym_id)
            sym_id[s] = i
        return i

    id_ranks: dict[tuple[int, int], int] = {}
    id_ops: dict[int, tuple[tuple[int, int], int]] = {}
    for (a, b), r in sorted(merge_ranks.items(), key=lambda kv: kv[1]):
        ia, ib, io = sid(a), sid(b), sid(a + b)
        id_ranks[(ia, ib)] = r
        id_ops[r] = ((ia, ib), io)
    if not merges_well_formed(id_ranks, id_ops):
        return None
    chd = build_chd_table(id_ranks, id_ops)
    if chd is None:
        return None
    symbols = [None] * len(sym_id)
    for s, i in sym_id.items():
        symbols[i] = s
    return StringBpeDevice(chd, sym_id, symbols)


class StringBpeDevice:
    def __init__(self, chd, sym_id: dict[str, int], symbols: list[str]):
        import jax.numpy as jnp

        self.chd = chd
        self.sym_id = sym_id
        self.symbols = symbols
        self.disp = jnp.asarray(chd.disp)
        self.rows = jnp.asarray(chd.rows)

    @functools.cached_property
    def _fn(self):
        import jax

        from ..utils.jax_setup import setup_compilation_cache
        from .merge import merge_word_rows

        setup_compilation_cache()
        chd = self.chd
        disp, rows = self.disp, self.rows

        def fn(tokens):
            return merge_word_rows(tokens, disp, rows, chd.size, chd.n_buckets)

        return jax.jit(fn)

    def merge_symbol_rows(
        self, rows_syms: list[list[str]]
    ) -> list[list[str]] | None:
        """Run the merge loop on device for a batch of symbol rows;
        rows longer than the lane width return None entries (host path)."""
        n = len(rows_syms)
        if n == 0:
            return []
        base = len(self.symbols)
        extra: dict[str, int] = {}
        extra_syms: list[str] = []

        def to_id(s: str) -> int:
            i = self.sym_id.get(s)
            if i is not None:
                return i
            i = extra.get(s)
            if i is None:
                i = base + len(extra_syms)
                extra[s] = i
                extra_syms.append(s)
            return i

        B = 8
        while B < n:
            B <<= 1
        tokens = np.full((B, _W), -1, np.int32)
        skipped: list[int] = []
        for r, syms in enumerate(rows_syms):
            if len(syms) > _W:
                skipped.append(r)
                continue
            for j, s in enumerate(syms):
                tokens[r, j] = to_id(s)
        out, _count = self._fn(tokens)
        out = np.asarray(out)
        result: list[list[str] | None] = []
        all_syms = self.symbols + extra_syms
        skipped_set = set(skipped)
        for r in range(n):
            if r in skipped_set:
                result.append(None)
                continue
            ids = out[r, out[r] >= 0]
            result.append([all_syms[i] for i in ids])
        return result
