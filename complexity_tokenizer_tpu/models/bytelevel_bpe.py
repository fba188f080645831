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

    def _split_words(self, text: str) -> list[str]:
        """Space-attachment splitting (models.rs:530-556): spaces attach
        to the FOLLOWING word."""
        if self.add_prefix_space and not text.startswith(" "):
            text = " " + text
        words: list[str] = []
        current = ""
        for c in text:
            if c == " ":
                if current:
                    words.append(current)
                    current = ""
                current += c
            else:
                current += c
        if current:
            words.append(current)
        return words

    def encode_batch(self, texts: list[str]) -> list[list[int]]:
        """Batch encode: distinct byte-level words merged on device via
        the shared C1 kernel (SURVEY C17); host fallback when the merge
        table is ineligible."""
        dev = self._get_device()
        if dev is None:
            return [self.encode(t) for t in texts]
        rows = [self._split_words(t) for t in texts]
        uniq = sorted({w for r in rows for w in r})
        sym_rows = [list(self._text_to_byte_tokens(w)) for w in uniq]
        merged = dev.merge_symbol_rows(sym_rows)
        unk_id = self.vocab.get(self.unk_token, 0)
        table: dict[str, list[int]] = {}
        for w, m in zip(uniq, merged):
            toks = self.tokenize_word(w) if m is None else m
            table[w] = [self.vocab.get(t, unk_id) for t in toks]
        return [[i for w in r for i in table[w]] for r in rows]

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
