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
