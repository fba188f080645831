"""WordPiece model (BERT greedy longest-match).

Semantics match `/root/reference/src/models.rs:30-142`: per-word greedy
longest-match with ``##`` continuation prefix; words longer than
max_input_chars_per_word collapse to UNK; unmatched chars emit UNK and
advance one char.
"""

from __future__ import annotations

__all__ = ["WordPieceModel"]


class WordPieceModel:
    def __init__(
        self,
        vocab: dict[str, int],
        continuing_subword_prefix: str = "##",
        unk_token: str = "[UNK]",
        max_input_chars_per_word: int = 100,
    ):
        self.vocab = dict(vocab)
        self.vocab_r = {v: k for k, v in vocab.items()}
        self.continuing_subword_prefix = continuing_subword_prefix
        self.unk_token = unk_token
        self.max_input_chars_per_word = max_input_chars_per_word

    def tokenize_word(self, word: str) -> list[int]:
        chars = list(word)
        if len(chars) > self.max_input_chars_per_word:
            unk = self.vocab.get(self.unk_token)
            return [unk] if unk is not None else []
        tokens: list[int] = []
        start = 0
        n = len(chars)
        prefix = self.continuing_subword_prefix
        while start < n:
            end = n
            found = False
            while start < end:
                sub = "".join(chars[start:end])
                token = prefix + sub if start > 0 else sub
                tid = self.vocab.get(token)
                if tid is not None:
                    tokens.append(tid)
                    found = True
                    break
                end -= 1
            if not found:
                unk = self.vocab.get(self.unk_token)
                if unk is not None:
                    tokens.append(unk)
                start += 1
            else:
                start = end
        return tokens

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for word in text.split():
            out.extend(self.tokenize_word(word))
        return out

    def _get_device(self):
        """Lazily-built device longest-match kernel (ops/wordpiece_device);
        None when the vocab is ineligible."""
        if getattr(self, "_device_built", False):
            return self._device
        self._device_built = True
        self._device = None
        try:
            from ..ops.wordpiece_device import (
                WordPieceDevice,
                build_wordpiece_tables,
            )

            tables = build_wordpiece_tables(self)
            if tables is not None:
                self._device = WordPieceDevice(tables)
        except Exception:
            self._device = None
        return self._device

    def encode_batch(self, texts: list[str]) -> list[list[int]]:
        """Batch encode: distinct words matched on device (greedy
        longest-match kernel), assembled per text; host fallback when the
        device tables are ineligible."""
        dev = self._get_device()
        if dev is None:
            return [self.encode(t) for t in texts]
        rows = [t.split() for t in texts]
        uniq = sorted({w for r in rows for w in r})
        if not uniq:
            return [[] for _ in texts]
        encoded = dev.tokenize_words(uniq)
        table = dict(zip(uniq, encoded))
        for i in getattr(dev, "last_poisoned", []):
            table[uniq[i]] = self.tokenize_word(uniq[i])
        out = []
        for r in rows:
            ids: list[int] = []
            for w in r:
                ids.extend(table[w])
            out.append(ids)
        return out

    def decode(self, ids) -> str:
        result = ""
        prefix = self.continuing_subword_prefix
        for i in ids:
            token = self.vocab_r.get(int(i))
            if token is None:
                continue
            if token.startswith(prefix):
                result += token[len(prefix) :]
            else:
                if result:
                    result += " "
                result += token
        return result

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def token_to_id(self, token: str):
        return self.vocab.get(token)

    def id_to_token(self, idx: int):
        return self.vocab_r.get(idx)
