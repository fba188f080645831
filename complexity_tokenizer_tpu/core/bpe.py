"""BPE core: rank-table construction + the oracle merge loop.

Host-tier equivalent of `/root/reference/src/bpe.rs:39-213` with identical
observable semantics:

- rank table keeps a merge only when ``a``, ``b`` and ``a+b`` are all in the
  vocab (bpe.rs:60-70);
- encode seeds from per-char vocab lookups, silently dropping OOV chars
  (bpe.rs:94-97);
- the merge loop applies ONE merge per iteration: the leftmost occurrence of
  the lowest-rank pair (bpe.rs:104-153);
- BPE-dropout uses the same xorshift64 PRNG, seeded 12345 (bpe.rs:7-28).

The device kernel (``ops/merge.py``) instead batch-applies every
non-overlapping occurrence of the best-rank pair per step, which is
equivalent iff the merge table is *well-formed*: any merge whose pair
contains the product of merge r has rank > r (always true for
trainer-produced tables).  :func:`merges_well_formed` verifies this at load
time; ill-formed tables fall back to the safe one-at-a-time host path.
"""

from __future__ import annotations

__all__ = ["Xorshift64", "BpeTokenizer", "build_merge_tables", "merges_well_formed"]


class Xorshift64:
    """The reference's SimpleRng (bpe.rs:12-28)."""

    MASK = (1 << 64) - 1

    def __init__(self, seed: int = 12345):
        self.state = seed & self.MASK

    def next_f32(self) -> float:
        s = self.state
        s = (s ^ (s << 13)) & self.MASK
        s = s ^ (s >> 7)
        s = (s ^ (s << 17)) & self.MASK
        self.state = s
        # rust `state as f32 / u64::MAX as f32`
        return s / float(self.MASK)


def build_merge_tables(vocab: dict[str, int], merges: list[tuple[str, str]]):
    """-> (merge_ranks {(id_a,id_b): rank}, merge_ops [(pair, new_id)]).

    Rank indices follow the *original* merge list enumeration, skipping
    entries whose parts or product are missing from the vocab — exactly the
    reference's construction (bpe.rs:57-71), so kept ranks are sparse.
    """
    merge_ranks: dict[tuple[int, int], int] = {}
    merge_ops: dict[int, tuple[tuple[int, int], int]] = {}
    for rank, (a, b) in enumerate(merges):
        id_a = vocab.get(a)
        id_b = vocab.get(b)
        if id_a is None or id_b is None:
            continue
        new_id = vocab.get(a + b)
        if new_id is None:
            continue
        merge_ranks[(id_a, id_b)] = rank
        merge_ops[rank] = ((id_a, id_b), new_id)
    return merge_ranks, merge_ops


def merges_well_formed(
    merge_ranks: dict[tuple[int, int], int],
    merge_ops: dict[int, tuple[tuple[int, int], int]],
) -> bool:
    """True iff every pair containing merge r's product has rank > r.

    This is the precondition for the device kernel's batch-apply step being
    bit-identical to the reference's one-merge-per-iteration loop.
    """
    first_use: dict[int, int] = {}  # token id -> earliest rank using it as a side
    for (a, b), rank in merge_ranks.items():
        for tok in (a, b):
            if tok not in first_use or rank < first_use[tok]:
                first_use[tok] = rank
    for rank, (_, new_id) in merge_ops.items():
        if first_use.get(new_id, 1 << 60) <= rank:
            return False
    return True


class BpeTokenizer:
    """Host BPE tokenizer (oracle tier)."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]]):
        self.vocab = dict(vocab)
        self.vocab_r = {v: k for k, v in vocab.items()}
        self.merge_ranks, self.merge_ops = build_merge_tables(vocab, merges)
        self._char_ids = {k: v for k, v in self.vocab.items() if len(k) == 1}
        self._rng = Xorshift64(12345)

    def encode(self, text: str) -> list[int]:
        return self.encode_with_dropout(text, 0.0)

    def encode_with_dropout(self, text: str, dropout: float) -> list[int]:
        if not text:
            return []
        char_ids = self._char_ids
        tokens = [char_ids[c] for c in text if c in char_ids]
        if not tokens:
            return []
        ranks = self.merge_ranks
        ops = self.merge_ops
        if dropout <= 0.0:
            while True:
                best_idx = -1
                best_rank = -1
                for i in range(len(tokens) - 1):
                    rank = ranks.get((tokens[i], tokens[i + 1]))
                    if rank is not None and (best_idx < 0 or rank < best_rank):
                        best_idx = i
                        best_rank = rank
                if best_idx < 0:
                    break
                tokens[best_idx] = ops[best_rank][1]
                del tokens[best_idx + 1]
        else:
            rng = self._rng
            while True:
                best_idx = -1
                best_rank = -1
                for i in range(len(tokens) - 1):
                    rank = ranks.get((tokens[i], tokens[i + 1]))
                    if rank is None:
                        continue
                    if rng.next_f32() < dropout:
                        continue
                    if best_idx < 0 or rank < best_rank:
                        best_idx = i
                        best_rank = rank
                if best_idx < 0:
                    break
                tokens[best_idx] = ops[best_rank][1]
                del tokens[best_idx + 1]
        return tokens

    def encode_batch(self, texts: list[str]) -> list[list[int]]:
        return [self.encode(t) for t in texts]

    def encode_batch_with_dropout(self, texts, dropout: float):
        return [self.encode_with_dropout(t, dropout) for t in texts]

    def decode(self, ids: list[int]) -> str:
        vocab_r = self.vocab_r
        return "".join(vocab_r[i] for i in ids if i in vocab_r)

    def decode_batch(self, batch: list[list[int]]) -> list[str]:
        return [self.decode(ids) for ids in batch]

    def vocab_size(self) -> int:
        return len(self.vocab)

    def token_to_id(self, token: str) -> int | None:
        return self.vocab.get(token)

    def id_to_token(self, idx: int) -> str | None:
        return self.vocab_r.get(idx)

    @property
    def merges(self):
        """Kept merges in rank order as ((id_a, id_b), new_id) tuples."""
        return [self.merge_ops[r] for r in sorted(self.merge_ops)]

    def packed_merge_arrays(self):
        """(pa, pb, pr, rank_new) int32 arrays for the native runtime.

        Cached: the merge tables are immutable after construction, so a
        pipeline invalidation (which rebuilds the native ctx) reuses the
        arrays instead of re-walking two 50K-entry dicts in Python — at
        GPT-2 scale that walk was a third of the whole cold-batch wall.
        """
        arrs = getattr(self, "_packed_merge_arrays", None)
        if arrs is None:
            import numpy as np

            n = len(self.merge_ranks)
            flat = np.fromiter(
                (
                    v
                    for (a, b), r in self.merge_ranks.items()
                    for v in (a, b, r)
                ),
                np.int32,
                count=3 * n,
            )
            pa = np.ascontiguousarray(flat[0::3])
            pb = np.ascontiguousarray(flat[1::3])
            pr = np.ascontiguousarray(flat[2::3])
            max_rank = max(self.merge_ops) if self.merge_ops else 0
            rank_new = np.full(max_rank + 1, -1, np.int32)
            if self.merge_ops:
                rk = np.fromiter(
                    self.merge_ops.keys(), np.int64, len(self.merge_ops)
                )
                nv = np.fromiter(
                    (v[1] for v in self.merge_ops.values()),
                    np.int64,
                    len(self.merge_ops),
                )
                rank_new[rk] = nv
            arrs = (pa, pb, pr, rank_new)
            self._packed_merge_arrays = arrs
        return arrs
