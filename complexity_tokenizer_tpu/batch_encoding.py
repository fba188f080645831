"""BatchEncoding: dict-like result of ``tokenizer(texts, ...)``.

Equivalent of PyBatchEncoding (`/root/reference/src/bindings/encoding.rs:
161-296`), with numpy/jax array export for direct model feeding.
"""

from __future__ import annotations

import numpy as np

from .core.encoding import Encoding

__all__ = ["BatchEncoding"]


class BatchEncoding:
    def __init__(
        self,
        encodings: list[Encoding],
        return_attention_mask: bool = True,
        return_token_type_ids: bool = True,
        return_offsets_mapping: bool = False,
        return_special_tokens_mask: bool = False,
    ):
        self._encodings = encodings
        self.return_attention_mask = return_attention_mask
        self.return_token_type_ids = return_token_type_ids
        self.return_offsets_mapping = return_offsets_mapping
        self.return_special_tokens_mask = return_special_tokens_mask

    @property
    def input_ids(self):
        return [e.ids for e in self._encodings]

    @property
    def attention_mask(self):
        if not self.return_attention_mask:
            return []
        return [e.attention_mask for e in self._encodings]

    @property
    def token_type_ids(self):
        if not self.return_token_type_ids:
            return []
        return [e.type_ids for e in self._encodings]

    @property
    def special_tokens_mask(self):
        if not self.return_special_tokens_mask:
            return []
        return [e.special_tokens_mask for e in self._encodings]

    @property
    def offset_mapping(self):
        if not self.return_offsets_mapping:
            return []
        return [e.offsets for e in self._encodings]

    def encodings(self) -> list[Encoding]:
        return list(self._encodings)

    def __len__(self) -> int:
        return len(self._encodings)

    def __getitem__(self, key):
        if isinstance(key, str):
            d = self.to_dict()
            return d[key]
        if not 0 <= key < len(self._encodings):
            raise IndexError("Index out of range")
        return self._encodings[key]

    def keys(self):
        out = ["input_ids"]
        if self.return_attention_mask:
            out.append("attention_mask")
        if self.return_token_type_ids:
            out.append("token_type_ids")
        if self.return_special_tokens_mask:
            out.append("special_tokens_mask")
        if self.return_offsets_mapping:
            out.append("offset_mapping")
        return out

    def input_ids_as_numpy(self):
        return [np.asarray(e.ids, dtype=np.uint32) for e in self._encodings]

    def attention_mask_as_numpy(self):
        return [np.asarray(e.attention_mask, dtype=np.uint32) for e in self._encodings]

    def to_dict(self) -> dict:
        d = {"input_ids": self.input_ids}
        if self.return_attention_mask:
            d["attention_mask"] = self.attention_mask
        if self.return_token_type_ids:
            d["token_type_ids"] = self.token_type_ids
        if self.return_special_tokens_mask:
            d["special_tokens_mask"] = self.special_tokens_mask
        if self.return_offsets_mapping:
            d["offset_mapping"] = self.offset_mapping
        return d
