"""Vocabulary + special-token registry.

Equivalent of `/root/reference/src/vocab.rs:8-149`, plus a dense device
export: ``token_bytes_matrix`` packs id -> token bytes as a padded uint8
matrix for on-device decode gathers.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["SpecialTokens", "Vocab"]


@dataclass
class SpecialTokens:
    unk_token: str | None = "<unk>"
    bos_token: str | None = "<s>"
    eos_token: str | None = "</s>"
    pad_token: str | None = "<pad>"
    sep_token: str | None = None
    cls_token: str | None = None
    mask_token: str | None = None


class Vocab:
    def __init__(self, token_to_id: dict[str, int], special_tokens: SpecialTokens):
        self._token_to_id = dict(token_to_id)
        self._id_to_token = {v: k for k, v in token_to_id.items()}
        self._special_tokens = special_tokens
        self._special_token_ids: dict[str, int] = {}
        for name in ("unk", "bos", "eos", "pad"):
            tok = getattr(special_tokens, f"{name}_token")
            if tok is not None and tok in self._token_to_id:
                self._special_token_ids[name] = self._token_to_id[tok]

    def get_id(self, token: str) -> int | None:
        return self._token_to_id.get(token)

    def get_token(self, idx: int) -> str | None:
        return self._id_to_token.get(idx)

    def unk_id(self) -> int | None:
        return self._special_token_ids.get("unk")

    def bos_id(self) -> int | None:
        return self._special_token_ids.get("bos")

    def eos_id(self) -> int | None:
        return self._special_token_ids.get("eos")

    def pad_id(self) -> int | None:
        return self._special_token_ids.get("pad")

    def __len__(self) -> int:
        return len(self._token_to_id)

    def is_empty(self) -> bool:
        return not self._token_to_id

    def special_token_ids(self) -> dict[str, int]:
        return self._special_token_ids

    def token_to_id_map(self) -> dict[str, int]:
        return self._token_to_id

    def special_tokens(self) -> SpecialTokens:
        return self._special_tokens

    def is_special_token(self, token: str) -> bool:
        st = self._special_tokens
        return token in (
            st.unk_token,
            st.bos_token,
            st.eos_token,
            st.pad_token,
            st.sep_token,
            st.cls_token,
            st.mask_token,
        ) and token is not None

    def token_bytes_matrix(self) -> tuple[np.ndarray, np.ndarray]:
        """(bytes_matrix [V, W] uint8, lengths [V] int32) for device decode.

        Row i holds token string i's UTF-8 bytes, zero-padded; missing ids
        have length 0.
        """
        if not self._id_to_token:
            return np.zeros((1, 1), np.uint8), np.zeros(1, np.int32)
        max_id = max(self._id_to_token)
        encoded = {i: t.encode("utf-8") for i, t in self._id_to_token.items()}
        width = max((len(b) for b in encoded.values()), default=1) or 1
        mat = np.zeros((max_id + 1, width), dtype=np.uint8)
        lens = np.zeros(max_id + 1, dtype=np.int32)
        for i, b in encoded.items():
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
            lens[i] = len(b)
        return mat, lens
