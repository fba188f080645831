"""WordLevel model: whitespace split + dict lookup with UNK
(`/root/reference/src/models.rs:316-362`)."""

from __future__ import annotations

__all__ = ["WordLevelModel"]


class WordLevelModel:
    def __init__(self, vocab: dict[str, int], unk_token: str = "<unk>"):
        self.vocab = dict(vocab)
        self.vocab_r = {v: k for k, v in vocab.items()}
        self.unk_token = unk_token

    def encode(self, text: str) -> list[int]:
        unk_id = self.vocab.get(self.unk_token, 0)
        return [self.vocab.get(w, unk_id) for w in text.split()]

    def _get_device(self):
        """Lazily-built device lookup kernel; None when ineligible."""
        if getattr(self, "_device_built", False):
            return self._device
        self._device_built = True
        self._device = None
        try:
            from ..ops.wordpiece_device import (
                WordLevelDevice,
                build_wordlevel_tables,
            )

            tables = build_wordlevel_tables(self)
            if tables is not None:
                self._device = WordLevelDevice(tables)
        except Exception:
            self._device = None
        return self._device

    def encode_batch(self, texts: list[str]) -> list[list[int]]:
        """Batch encode: distinct words resolved by one device CHD probe +
        exact verify each (SURVEY C17); host fallback when ineligible."""
        dev = self._get_device()
        if dev is None:
            return [self.encode(t) for t in texts]
        rows = [t.split() for t in texts]
        uniq = sorted({w for r in rows for w in r})
        ids = dev.lookup_words(uniq)
        table = dict(zip(uniq, ids))
        return [[table[w] for w in r] for r in rows]

    def decode(self, ids) -> str:
        return " ".join(
            self.vocab_r[int(i)] for i in ids if int(i) in self.vocab_r
        )

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def token_to_id(self, token: str):
        return self.vocab.get(token)

    def id_to_token(self, idx: int):
        return self.vocab_r.get(idx)
