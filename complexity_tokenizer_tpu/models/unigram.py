"""Unigram model (SentencePiece Viterbi decode).

Semantics match `/root/reference/src/models.rs:199-299`: max-score path
over all substring splits with a single-char UNK fallback scored
min_score - 10.
"""

from __future__ import annotations

__all__ = ["UnigramModel"]


class UnigramModel:
    def __init__(self, vocab: list[tuple[str, float]], unk_token: str = "<unk>"):
        self.vocab: dict[str, tuple[int, float]] = {}
        self.vocab_r: dict[int, str] = {}
        min_score = 0.0
        for idx, (token, score) in enumerate(vocab):
            self.vocab[token] = (idx, score)
            self.vocab_r[idx] = token
            min_score = min(min_score, score)
        self.unk_token = unk_token
        self.unk_id = self.vocab.get(unk_token, (0, 0.0))[0]
        self.min_score = min_score - 10.0

    def tokenize(self, text: str) -> list[int]:
        if not text:
            return []
        chars = list(text)
        n = len(chars)
        NEG = float("-inf")
        # best[end] = (score, prev_pos, token_id)
        best: list[tuple[float, int, int]] = [(NEG, -1, 0)] * (n + 1)
        best[0] = (0.0, -1, 0)
        for end in range(1, n + 1):
            for start in range(end):
                sub = "".join(chars[start:end])
                entry = self.vocab.get(sub)
                if entry is not None:
                    tid, score = entry
                elif end - start == 1:
                    tid, score = self.unk_id, self.min_score
                else:
                    continue
                ns = best[start][0] + score
                if ns > best[end][0]:
                    best[end] = (ns, start, tid)
        tokens = []
        pos = n
        while pos > 0:
            _, prev, tid = best[pos]
            tokens.append(tid)
            pos = prev
        tokens.reverse()
        return tokens

    def encode(self, text: str) -> list[int]:
        return self.tokenize(text)

    def _get_device(self):
        """Lazily-built device Viterbi kernel; None when ineligible."""
        if getattr(self, "_device_built", False):
            return self._device
        self._device_built = True
        self._device = None
        try:
            from ..ops.unigram_device import UnigramDevice, build_unigram_tables

            tables = build_unigram_tables(self)
            if tables is not None:
                self._device = UnigramDevice(tables)
        except Exception:
            self._device = None
        return self._device

    def encode_batch(self, texts: list[str]) -> list[list[int]]:
        """Batch Viterbi on device (scan DP over rolling-hash CHD piece
        lookups, SURVEY C17); rows whose decisions fall inside the f32
        error bound of the reference's f64 DP — or that fail the exact
        piece verify — are re-segmented on host, so output is bit-exact."""
        dev = self._get_device()
        if dev is None:
            return [self.tokenize(t) for t in texts]
        rows = dev.tokenize_texts(list(texts))
        for i in getattr(dev, "last_poisoned", []):
            rows[i] = self.tokenize(texts[i])
        return rows

    def decode(self, ids) -> str:
        return "".join(
            self.vocab_r[int(i)] for i in ids if int(i) in self.vocab_r
        )

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def token_to_id(self, token: str):
        entry = self.vocab.get(token)
        return entry[0] if entry is not None else None

    def id_to_token(self, idx: int):
        return self.vocab_r.get(idx)
