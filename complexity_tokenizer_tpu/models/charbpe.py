"""CharBPE model: character BPE with an end-of-word suffix marker
(`/root/reference/src/models.rs:597-741`)."""

from __future__ import annotations

__all__ = ["CharBpeModel", "string_bpe_merge"]


def string_bpe_merge(tokens: list[str], merge_ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge loop over string symbols.

    One merge per iteration, leftmost among the lowest rank — the same
    discipline as the id-level loop in core/bpe.py (models.rs:487-515).
    """
    tokens = list(tokens)
    while True:
        best_idx = -1
        best_rank = -1
        for i in range(len(tokens) - 1):
            rank = merge_ranks.get((tokens[i], tokens[i + 1]))
            if rank is not None and (best_idx < 0 or rank < best_rank):
                best_idx = i
                best_rank = rank
        if best_idx < 0:
            break
        tokens[best_idx] = tokens[best_idx] + tokens[best_idx + 1]
        del tokens[best_idx + 1]
    return tokens


class CharBpeModel:
    def __init__(
        self,
        vocab: dict[str, int],
        merges: list[tuple[str, str]],
        end_of_word_suffix: str = "</w>",
        unk_token: str = "<unk>",
    ):
        self.vocab = dict(vocab)
        self.vocab_r = {v: k for k, v in vocab.items()}
        self.merge_ranks = {(a, b): r for r, (a, b) in enumerate(merges)}
        self.end_of_word_suffix = end_of_word_suffix
        self.unk_token = unk_token

    def tokenize_word(self, word: str) -> list[str]:
        if not word:
            return []
        chars = list(word)
        tokens = chars[:-1] + [chars[-1] + self.end_of_word_suffix]
        return string_bpe_merge(tokens, self.merge_ranks)

    def encode(self, text: str) -> list[int]:
        unk_id = self.vocab.get(self.unk_token, 0)
        out = []
        for word in text.split():
            for t in self.tokenize_word(word):
                out.append(self.vocab.get(t, unk_id))
        return out

    def _get_device(self):
        if getattr(self, "_device_built", False):
            return self._device
        self._device_built = True
        self._device = None
        try:
            from ..ops.stringbpe_device import build_string_bpe_device

            self._device = build_string_bpe_device(self.merge_ranks)
        except Exception:
            self._device = None
        return self._device

    def encode_batch(self, texts: list[str]) -> list[list[int]]:
        """Batch encode: distinct words merged on device via the shared
        C1 kernel with `</w>` suffix seeding (SURVEY C17); host fallback
        for ineligible tables or over-wide words."""
        dev = self._get_device()
        if dev is None:
            return [self.encode(t) for t in texts]
        rows = [t.split() for t in texts]
        uniq = sorted({w for r in rows for w in r})
        suffix = self.end_of_word_suffix
        sym_rows = [
            (list(w)[:-1] + [w[-1] + suffix]) if w else [] for w in uniq
        ]
        merged = dev.merge_symbol_rows(sym_rows)
        unk_id = self.vocab.get(self.unk_token, 0)
        table: dict[str, list[int]] = {}
        for w, m in zip(uniq, merged):
            toks = self.tokenize_word(w) if m is None else m
            table[w] = [self.vocab.get(t, unk_id) for t in toks]
        return [[i for w in r for i in table[w]] for r in rows]

    def decode(self, ids) -> str:
        result = ""
        suffix = self.end_of_word_suffix
        for i in ids:
            token = self.vocab_r.get(int(i))
            if token is None:
                continue
            if token.endswith(suffix):
                result += token[: len(token) - len(suffix)] + " "
            else:
                result += token
        return result.rstrip()

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def token_to_id(self, token: str):
        return self.vocab.get(token)

    def id_to_token(self, idx: int):
        return self.vocab_r.get(idx)
