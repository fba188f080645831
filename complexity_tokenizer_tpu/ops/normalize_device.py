"""Device normalization: table-driven stability check over byte tensors
(SURVEY C3).

The reference normalizes per text on the host (normalizers.rs:43-105).
Full Unicode normalization is an inherently sequential, expanding rewrite
— a poor fit for one fused device pass — but almost all real text is
already normalized, and *proving that* is one table gather per codepoint.
So the TPU-native tier splits the work:

- every supported normalizer gets a **stability bitmap** over codepoints:
  a row containing no flagged codepoint is PROVEN to be a fixed point of
  the normalizer, so the host rewrite is skipped entirely;
- the device pass decodes UTF-8 lead bytes arithmetically (same trick as
  ops/presplit.py), gathers the bitmap, and reduces per row;
- flagged rows (rare) are rewritten on host with the exact reference
  semantics — the result is bit-identical to host normalization by
  construction.

Bitmap derivations (verified empirically in tests/test_device_encode.py):

- NFC/NFKC: flag cp when F(cp) != cp (quick-check NO), when ccc(cp) != 0
  (reordering / mark composition), when cp is the second element of an
  effective canonical composition pair, or when cp is a Hangul jamo V/T
  (algorithmic composition).  Unflagged rows satisfy the UAX#15
  quick-check YES condition, hence are already in form F.
- NFD/NFKD: flag when F(cp) != cp or ccc(cp) != 0.
- Lowercase: flag when lower(cp) != cp (the only context rule in default
  Unicode lowercasing, final sigma, only fires when an uppercase sigma is
  present — itself flagged).
- StripAccents (NFD + drop combining marks, normalizers.rs:113-117): the
  NFD bitmap plus the reference's combining-mark ranges.
- Strip: positional, checked on host in O(1) (leading/trailing char).
- Replace / Precompiled: flag every codepoint of the pattern(s) — a row
  containing none cannot contain the pattern.
- BertNormalizer: union of its per-codepoint passes (control/whitespace
  cleanup, CJK spacing ranges, NFC, accents, lowercase).
- Sequence: union — a text unchanged by every stage individually is
  unchanged by the composition (each stage sees the original text).
"""

from __future__ import annotations

import functools
import unicodedata

import numpy as np

from ..core import normalizers as N
from ..utils.unicode_tables import (
    is_cjk_bert,
    is_combining_mark,
    is_control_char,
    whitespace_set,
)

__all__ = ["NormPlan", "plan_for_normalizer", "DeviceNormChecker",
           "stability_bitmap"]

_MAX_CP = 0x110000


class NormPlan:
    """bitmap: uint8 [0x110000], 1 = row needs the host rewrite;
    host_pred: optional text -> bool positional check (e.g. Strip)."""

    __slots__ = ("bitmap", "host_pred")

    def __init__(self, bitmap: np.ndarray, host_pred=None):
        self.bitmap = bitmap
        self.host_pred = host_pred


@functools.lru_cache(maxsize=None)
def _composition_second_elements() -> frozenset:
    """Second elements of effective canonical composition pairs + jamo."""
    out = set()
    for cp in range(_MAX_CP):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        d = unicodedata.decomposition(chr(cp))
        if not d or d.startswith("<"):
            continue
        parts = d.split()
        if len(parts) != 2:
            continue
        a, b = int(parts[0], 16), int(parts[1], 16)
        if unicodedata.normalize("NFC", chr(a) + chr(b)) == chr(cp):
            out.add(b)  # effective pair (not composition-excluded)
    out.update(range(0x1161, 0x1176))  # Hangul jamo V
    out.update(range(0x11A8, 0x11C3))  # Hangul jamo T
    return frozenset(out)


@functools.lru_cache(maxsize=None)
def stability_bitmap(kind: str) -> np.ndarray:
    """uint8 [0x110000] bitmap: 1 = text containing this codepoint is not
    guaranteed to be a fixed point of the normalizer ``kind``."""
    bm = np.zeros(_MAX_CP, np.uint8)
    bm[0xD800:0xE000] = 1
    if kind in ("NFC", "NFD", "NFKC", "NFKD"):
        second = (
            _composition_second_elements() if kind in ("NFC", "NFKC") else ()
        )
        for cp in range(_MAX_CP):
            if bm[cp]:
                continue
            c = chr(cp)
            if (
                unicodedata.combining(c) != 0
                or unicodedata.normalize(kind, c) != c
                or cp in second
            ):
                bm[cp] = 1
    elif kind == "lowercase":
        for cp in range(_MAX_CP):
            if not bm[cp] and chr(cp).lower() != chr(cp):
                bm[cp] = 1
    elif kind == "strip_accents":
        bm |= stability_bitmap("NFD")
        for cp in range(_MAX_CP):
            if not bm[cp] and is_combining_mark(chr(cp)):
                bm[cp] = 1
    elif kind == "bert_clean_text":
        ws = whitespace_set()
        for cp in range(_MAX_CP):
            if bm[cp]:
                continue
            c = chr(cp)
            if is_control_char(c) or (c in ws and c != " "):
                bm[cp] = 1
    elif kind == "bert_cjk":
        for cp in range(_MAX_CP):
            if not bm[cp] and is_cjk_bert(chr(cp)):
                bm[cp] = 1
    else:
        raise ValueError(kind)
    bm.setflags(write=False)
    return bm


def _pattern_bitmap(patterns) -> np.ndarray | None:
    """Flag every codepoint appearing in any pattern; None when a pattern
    is empty (empty-pattern replace touches every position)."""
    bm = np.zeros(_MAX_CP, np.uint8)
    for p in patterns:
        if not p:
            return None
        for c in p:
            bm[ord(c)] = 1
    return bm


def plan_for_normalizer(norm) -> NormPlan | None:
    """Stability plan for a core normalizer; None when unsupported (the
    pipeline then normalizes every row on host, exact as before)."""
    if norm is None:
        return NormPlan(np.zeros(_MAX_CP, np.uint8))
    if isinstance(norm, N.NFC):
        return NormPlan(stability_bitmap("NFC").copy())
    if isinstance(norm, N.NFD):
        return NormPlan(stability_bitmap("NFD").copy())
    if isinstance(norm, N.NFKC):
        return NormPlan(stability_bitmap("NFKC").copy())
    if isinstance(norm, N.NFKD):
        return NormPlan(stability_bitmap("NFKD").copy())
    if isinstance(norm, N.Lowercase):
        return NormPlan(stability_bitmap("lowercase").copy())
    if isinstance(norm, N.StripAccents):
        return NormPlan(stability_bitmap("strip_accents").copy())
    if isinstance(norm, N.Strip):
        ws = whitespace_set()

        def strip_pred(t: str) -> bool:
            return bool(t) and (t[0] in ws or t[-1] in ws)

        return NormPlan(np.zeros(_MAX_CP, np.uint8), strip_pred)
    if isinstance(norm, N.Replace):
        bm = _pattern_bitmap([norm.pattern])
        return None if bm is None else NormPlan(bm)
    if isinstance(norm, N.Precompiled):
        bm = _pattern_bitmap([frm for frm, _ in norm.charsmap])
        return None if bm is None else NormPlan(bm)
    if isinstance(norm, N.BertNormalizer):
        bm = np.zeros(_MAX_CP, np.uint8)
        if norm.clean_text:
            bm |= stability_bitmap("bert_clean_text")
        if norm.handle_chinese_chars:
            bm |= stability_bitmap("bert_cjk")
        bm |= stability_bitmap("NFC")
        should_strip = (
            norm.strip_accents if norm.strip_accents is not None else norm.lowercase
        )
        if should_strip:
            bm |= stability_bitmap("strip_accents")
        if norm.lowercase:
            bm |= stability_bitmap("lowercase")
        return NormPlan(bm)
    if isinstance(norm, N.Sequence):
        bm = np.zeros(_MAX_CP, np.uint8)
        preds = []
        for child in norm.normalizers:
            sub = plan_for_normalizer(child)
            if sub is None:
                return None
            bm |= sub.bitmap
            if sub.host_pred is not None:
                preds.append(sub.host_pred)
        pred = None
        if preds:
            def pred(t, _preds=tuple(preds)):
                return any(p(t) for p in _preds)
        return NormPlan(bm, pred)
    return None


class DeviceNormChecker:
    """Jitted per-row stability check over packed byte rows."""

    def __init__(self, plan: NormPlan):
        import jax.numpy as jnp

        self.plan = plan
        self.bitmap_dev = jnp.asarray(plan.bitmap)

    @functools.cached_property
    def _fn(self):
        import jax
        import jax.numpy as jnp

        from ..utils.jax_setup import setup_compilation_cache
        from .presplit import _shift_left

        setup_compilation_cache()
        bitmap = self.bitmap_dev

        def fn(byte_arr, lengths):
            b0 = byte_arr.astype(jnp.int32)
            B, L = byte_arr.shape
            pos = jnp.arange(L, dtype=jnp.int32)[None, :]
            valid = pos < lengths[:, None]
            b1 = _shift_left(b0, 1, 0)
            b2 = _shift_left(b0, 2, 0)
            b3 = _shift_left(b0, 3, 0)
            is_cont = (b0 & 0xC0) == 0x80
            cp2 = ((b0 & 0x1F) << 6) | (b1 & 0x3F)
            cp3 = ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
            cp4 = (
                ((b0 & 0x07) << 18) | ((b1 & 0x3F) << 12)
                | ((b2 & 0x3F) << 6) | (b3 & 0x3F)
            )
            cp = jnp.where(
                b0 < 0x80,
                b0,
                jnp.where(b0 < 0xE0, cp2, jnp.where(b0 < 0xF0, cp3, cp4)),
            )
            cp = jnp.clip(cp, 0, 0x10FFFF)
            unstable = valid & ~is_cont & (bitmap[cp] != 0)
            return ~jnp.any(unstable, axis=1)

        return jax.jit(fn)

    # coarse batch buckets: every (B, L) pair is a separate compile (the
    # axon backend compiles each shape over a slow tunnel), so the shape
    # set is kept as small as the encode pipeline's (pipeline.py:28-31)
    _BATCH_BUCKETS = (64, 2048)

    def check_bytes(self, raw: list[bytes], length_buckets, pack) -> np.ndarray:
        """Per-row stability flags; rows wider than the largest bucket are
        reported unstable (host normalizes them — exact either way)."""
        n = len(raw)
        clean = np.zeros(n, dtype=bool)
        groups: dict[int, list[int]] = {}
        for i, d in enumerate(raw):
            L = None
            for b in length_buckets:
                if max(len(d), 1) <= b:
                    L = b
                    break
            if L is not None:
                groups.setdefault(L, []).append(i)
        max_b = self._BATCH_BUCKETS[-1]
        for L, idxs in groups.items():
            for start in range(0, len(idxs), max_b):
                chunk = idxs[start : start + max_b]
                B = next(b for b in self._BATCH_BUCKETS if b >= len(chunk))
                arr, lens = pack([raw[i] for i in chunk], L, B)
                flags = np.asarray(self._fn(arr, lens))
                for row, i in enumerate(chunk):
                    clean[i] = bool(flags[row])
        if self.plan.host_pred is not None:
            for i, d in enumerate(raw):
                if clean[i] and self.plan.host_pred(d.decode("utf-8")):
                    clean[i] = False
        return clean
