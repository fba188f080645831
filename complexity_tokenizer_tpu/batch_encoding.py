"""BatchEncoding: dict-like result of ``tokenizer(texts, ...)``.

Equivalent of PyBatchEncoding (`/root/reference/src/bindings/encoding.rs:
161-296`), with numpy/jax array export for direct model feeding.
"""

from __future__ import annotations

import numpy as np

from .core.encoding import Encoding

__all__ = ["BatchEncoding", "ColumnarBatchEncoding"]


def _to_tensor(rows, kind: str):
    """Stack equal-length rows into one array ("np" or "jax")."""
    try:
        arr = np.asarray(rows, dtype=np.int32)
    except ValueError as e:  # numpy's "inhomogeneous shape" for ragged rows
        raise ValueError(
            "return_tensors requires padding (rows have unequal lengths)"
        ) from e
    if arr.dtype == object:  # ragged (older numpy)
        raise ValueError(
            "return_tensors requires padding (rows have unequal lengths)"
        )
    if kind == "jax":
        import jax.numpy as jnp

        return jnp.asarray(arr)
    return arr


_FIELD_KEYS = {
    "input_ids",
    "attention_mask",
    "token_type_ids",
    "special_tokens_mask",
    "offset_mapping",
}


class BatchEncoding:
    # extension over the reference surface: tokenizer(..., return_tensors=
    # "np"|"jax") makes input_ids/attention_mask/... come back as stacked
    # arrays ready for device feeding instead of list-of-lists
    _tensor_kind: str | None = None

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

    def _maybe_tensor(self, rows):
        return _to_tensor(rows, self._tensor_kind)

    @property
    def input_ids(self):
        rows = [e.ids for e in self._encodings]
        return self._maybe_tensor(rows) if self._tensor_kind else rows

    @property
    def attention_mask(self):
        if not self.return_attention_mask:
            return []
        rows = [e.attention_mask for e in self._encodings]
        return self._maybe_tensor(rows) if self._tensor_kind else rows

    @property
    def token_type_ids(self):
        if not self.return_token_type_ids:
            return []
        rows = [e.type_ids for e in self._encodings]
        return self._maybe_tensor(rows) if self._tensor_kind else rows

    @property
    def special_tokens_mask(self):
        if not self.return_special_tokens_mask:
            return []
        rows = [e.special_tokens_mask for e in self._encodings]
        return self._maybe_tensor(rows) if self._tensor_kind else rows

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
            if key not in _FIELD_KEYS or key not in self.keys():
                raise KeyError(key)
            return getattr(self, key)
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


class ColumnarBatchEncoding(BatchEncoding):
    """Columnar ``tokenizer(texts, ...)`` result: the batch-level fields
    (input_ids / attention_mask / token_type_ids / special_tokens_mask)
    are computed vectorially from the native ragged encode + a static
    post-processor frame, without constructing per-row Encoding objects.
    Per-row Encodings materialize lazily on ``encodings()`` / indexing by
    replaying the per-row path bit-exactly (Tokenizer._build_call_encoding
    + truncate/pad), so the alignment API and overflow windows keep the
    reference semantics.

    The field math mirrors the per-row flow (mod.rs:372-385 quirks
    included): processed length m = p + n + s; truncation cuts to
    t = min(m, max_len); padding extends to final = max(t, pad_to);
    the special mask is [0]*n + [1]*(m-n) pre-truncation (suffix-aligned
    regardless of where the frame sits) OR'd with id-membership, then 1 at
    pad positions.
    """

    def __init__(
        self,
        tokenizer,
        texts,
        flat,
        offs,
        prefix,
        suffix,
        truncation: bool,
        max_len: int,
        stride: int,
        padding,
        pad_to: int,
        pad_id: int,
        pad_token: str,
        pad_left: bool,
        return_attention_mask: bool = True,
        return_token_type_ids: bool = True,
        return_special_tokens_mask: bool = False,
    ):
        self._tok = tokenizer
        self._texts = texts
        self._flat = flat
        self._offs = offs
        self._prefix = list(prefix)
        self._suffix = list(suffix)
        self._truncation = truncation
        self._max_len = max_len
        self._stride = stride
        self._padding = padding
        self._pad_to = pad_to
        self._pad_id = pad_id
        self._pad_token = pad_token
        self._pad_left = pad_left
        self.return_attention_mask = return_attention_mask
        self.return_token_type_ids = return_token_type_ids
        self.return_offsets_mapping = False
        self.return_special_tokens_mask = return_special_tokens_mask
        # lengths: base n, post-truncation t, final (padded) lengths
        n = np.diff(np.asarray(offs, np.int64))
        m = n + len(self._prefix) + len(self._suffix)
        t = np.minimum(m, max_len) if truncation else m
        self._t = t
        self._final = np.maximum(t, pad_to) if padding is not None else t
        self._rows_cache = None
        self._mat_cache = None
        self._encs = None

    def __len__(self) -> int:
        return len(self._t)

    # -- columnar fields ------------------------------------------------
    def _trunc_pad(self):
        """(trunc_len, pad_to) as passed to the C frame entry points: -1
        disables the respective step.  One place, so the list-mode and
        tensor-mode paths can never drift."""
        trunc = self._max_len if self._truncation else -1
        pad_to = self._pad_to if self._padding is not None else -1
        return int(trunc), int(pad_to)

    def _frame_rows(self):
        if self._rows_cache is None:
            from .native import load_ext

            ext = load_ext()
            trunc, pad_to = self._trunc_pad()
            self._rows_cache = ext.frame_rows(
                np.ascontiguousarray(self._flat, np.int32),
                np.ascontiguousarray(self._offs, np.int64),
                self._prefix,
                self._suffix,
                int(trunc),
                int(pad_to),
                int(self._pad_id),
                int(self._pad_left),
            )
        return self._rows_cache

    def _check_rect(self):
        lens = self._final
        if len(lens) and int(lens.min()) != int(lens.max()):
            raise ValueError(
                "return_tensors requires padding (rows have unequal lengths)"
            )

    @property
    def input_ids(self):
        if self._tensor_kind is not None:
            self._check_rect()
            mat, _ = self._ids_matrix()
            return self._maybe_tensor(mat)
        return self._frame_rows()

    @property
    def attention_mask(self):
        if not self.return_attention_mask:
            return []
        if self._tensor_kind is not None:
            self._check_rect()
            L = int(self._final.max(initial=0))
            from .native import load_ext

            ext = load_ext()
            if ext is not None and hasattr(ext, "mask_matrix"):
                mask = np.empty((len(self._final), L), np.int32)
                ext.mask_matrix(
                    np.ascontiguousarray(self._t, np.int64),
                    np.ascontiguousarray(self._final, np.int64),
                    int(self._pad_left),
                    L,
                    mask,
                )
                return self._maybe_tensor(mask)
            pos = np.arange(L, dtype=np.int64)[None, :]
            t = np.asarray(self._t, np.int64)[:, None]
            f = np.asarray(self._final, np.int64)[:, None]
            mask = pos >= f - t if self._pad_left else pos < t
            return self._maybe_tensor(mask.astype(np.int32))
        # fresh lists on every access — callers may mutate the returned
        # rows.  The C mask_rows builds them from interned 0/1 ints in one
        # pass; the Python comprehension is the no-extension fallback.
        from .native import load_ext

        ext = load_ext()
        if ext is not None and hasattr(ext, "mask_rows"):
            return ext.mask_rows(
                np.ascontiguousarray(self._t, np.int64),
                np.ascontiguousarray(self._final, np.int64),
                int(self._pad_left),
            )
        ts = np.asarray(self._t).tolist()
        fs = np.asarray(self._final).tolist()
        if self._pad_left:
            return [[0] * (f - t) + [1] * t for t, f in zip(ts, fs)]
        return [[1] * t + [0] * (f - t) for t, f in zip(ts, fs)]

    @property
    def token_type_ids(self):
        if not self.return_token_type_ids:
            return []
        if self._tensor_kind is not None:
            self._check_rect()
            L = int(self._final.max(initial=0))
            return self._maybe_tensor(
                np.zeros((len(self._final), L), np.int32)
            )
        return [[0] * int(f) for f in self._final]

    @property
    def special_tokens_mask(self):
        if not self.return_special_tokens_mask:
            return []
        if self._tensor_kind is not None:
            self._check_rect()
            rows = self._special_mask_rows()
            return self._maybe_tensor(np.asarray(rows, np.int32))
        return self._special_mask_rows()

    def _special_mask_rows(self):
        mat, lens = self._ids_matrix()
        spec_ids = list(self._tok.special_tokens.values())
        max_id = int(mat.max(initial=0))
        lut = np.zeros(max_id + 1, bool)
        for sid in spec_ids:
            if 0 <= sid <= max_id:
                lut[sid] = True
        is_spec = lut[np.clip(mat, 0, max_id)]
        B, L = mat.shape
        pos = np.arange(L, dtype=np.int64)[None, :]
        n = np.diff(np.asarray(self._offs, np.int64))[:, None]
        t = np.asarray(self._t, np.int64)[:, None]
        f = np.asarray(self._final, np.int64)[:, None]
        if self._pad_left:
            shift = f - t  # row content starts here
            rel = pos - shift
            mask = (rel >= np.minimum(n, t)) | (rel < 0) | is_spec
        else:
            mask = (pos >= np.minimum(n, t)) | is_spec
        out = mask.astype(np.int64)
        return [out[i, : int(lens[i])].tolist() for i in range(B)]

    def _ids_matrix(self):
        """(padded [B, Lmax] int32 matrix, per-row final lengths)."""
        if self._mat_cache is None:
            lens = self._final
            Lmax = int(lens.max(initial=0))
            from .native import load_ext

            ext = load_ext()
            if ext is not None and hasattr(ext, "frame_matrix"):
                # dense C fill straight from the ragged encode — never
                # round-trips through PyLong rows
                mat = np.empty((len(lens), Lmax), np.int32)
                trunc, pad_to = self._trunc_pad()
                ext.frame_matrix(
                    np.ascontiguousarray(self._flat, np.int32),
                    np.ascontiguousarray(self._offs, np.int64),
                    self._prefix,
                    self._suffix,
                    int(trunc),
                    int(pad_to),
                    int(self._pad_id),
                    int(self._pad_left),
                    mat,
                )
            else:
                # fresh rows, not self._rows_cache: input_ids hands the
                # cached rows to callers (HF-style aliasing), so a caller
                # mutation must not leak into the matrix-backed fields
                trunc, pad_to = self._trunc_pad()
                rows = ext.frame_rows(
                    np.ascontiguousarray(self._flat, np.int32),
                    np.ascontiguousarray(self._offs, np.int64),
                    self._prefix,
                    self._suffix,
                    trunc,
                    pad_to,
                    int(self._pad_id),
                    int(self._pad_left),
                )
                mat = np.full((len(lens), Lmax), self._pad_id, np.int32)
                for i, r in enumerate(rows):
                    mat[i, : len(r)] = r
            self._mat_cache = (mat, lens)
        return self._mat_cache

    def input_ids_as_numpy(self):
        mat, lens = self._ids_matrix()
        return [
            np.asarray(mat[i, : int(lens[i])], dtype=np.uint32)
            for i in range(mat.shape[0])
        ]

    def attention_mask_as_numpy(self):
        return [np.asarray(m, dtype=np.uint32) for m in self.attention_mask]

    # -- lazy per-row Encodings -----------------------------------------
    def _materialize_row(self, i: int) -> Encoding:
        ids = [int(x) for x in self._flat[self._offs[i] : self._offs[i + 1]]]
        enc = self._tok._build_call_encoding(self._texts[i], ids)
        if self._truncation and len(enc) > self._max_len:
            if self._stride > 0:
                enc.truncate_with_stride(self._max_len, self._stride)
            else:
                enc.truncate(self._max_len)
        if self._padding is not None:
            enc.pad(
                int(self._pad_to), self._pad_id, self._pad_token,
                self._pad_left,
            )
        return enc

    def _materialize(self) -> list:
        if self._encs is None:
            self._encs = [
                self._materialize_row(i) for i in range(len(self._t))
            ]
        return self._encs

    def encodings(self) -> list:
        return list(self._materialize())

    def __getitem__(self, key):
        if isinstance(key, str):
            if key not in _FIELD_KEYS or key not in self.keys():
                raise KeyError(key)
            return getattr(self, key)
        if not 0 <= key < len(self._t):
            raise IndexError("Index out of range")
        return self._materialize()[key]
