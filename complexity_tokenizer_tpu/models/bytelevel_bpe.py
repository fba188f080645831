"""Self-contained byte-level BPE model with space-attachment word splitting
(`/root/reference/src/models.rs:400-589`).

Unlike the main Tokenizer pipeline this model does its own simple
word-splitting: spaces attach to the *following* word (models.rs:530-556),
no regex involved.
"""

from __future__ import annotations

from ..utils.bytelevel import bytes_to_unicode, unicode_to_bytes
from .charbpe import string_bpe_merge

__all__ = ["ByteLevelBpeModel"]


class ByteLevelBpeModel:
    def __init__(
        self,
        vocab: dict[str, int],
        merges: list[tuple[str, str]],
        unk_token: str = "<unk>",
        add_prefix_space: bool = True,
    ):
        self.vocab = dict(vocab)
        self.vocab_r = {v: k for k, v in vocab.items()}
        self.merge_ranks = {(a, b): r for r, (a, b) in enumerate(merges)}
        self.unk_token = unk_token
        self.add_prefix_space = add_prefix_space
        self._byte_encoder = bytes_to_unicode()
        self._byte_decoder = unicode_to_bytes()

    def _text_to_byte_tokens(self, text: str) -> str:
        enc = self._byte_encoder
        return "".join(enc[b] for b in text.encode("utf-8"))

    def _byte_tokens_to_text(self, tokens: str) -> str:
        dec = self._byte_decoder
        data = bytes(dec[c] for c in tokens if c in dec)
        return data.decode("utf-8", errors="replace")

    def tokenize_word(self, word: str) -> list[str]:
        if not word:
            return []
        byte_word = self._text_to_byte_tokens(word)
        return string_bpe_merge(list(byte_word), self.merge_ranks)

    def encode(self, text: str) -> list[int]:
        unk_id = self.vocab.get(self.unk_token, 0)
        if self.add_prefix_space and not text.startswith(" "):
            text = " " + text
        result: list[int] = []
        current = ""
        for c in text:
            if c == " ":
                if current:
                    for t in self.tokenize_word(current):
                        result.append(self.vocab.get(t, unk_id))
                    current = ""
                current += c
            else:
                current += c
        if current:
            for t in self.tokenize_word(current):
                result.append(self.vocab.get(t, unk_id))
        return result

    def decode(self, ids) -> str:
        tokens = "".join(
            self.vocab_r[int(i)] for i in ids if int(i) in self.vocab_r
        )
        return self._byte_tokens_to_text(tokens)

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def token_to_id(self, token: str):
        return self.vocab.get(token)

    def id_to_token(self, idx: int):
        return self.vocab_r.get(idx)
