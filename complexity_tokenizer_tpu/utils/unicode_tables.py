"""Codepoint classification tables.

These tables drive both the host oracle and the on-device pre-split /
normalizer kernels.  Everything is a dense ``np.uint8`` array indexed by
codepoint so the device side can use plain gathers.

Class semantics follow the reference implementation exactly:

- LETTER / NUMBER: Unicode general categories L* / N* (rust regex
  ``\\p{L}`` / ``\\p{N}``, `/root/reference/src/pretokenizers.rs:11-15`).
- WS: the Unicode ``White_Space`` property (rust ``\\s`` and
  ``char::is_whitespace``).
- Punctuation: reference's custom ranges plus ASCII punctuation
  (`/root/reference/src/pretokenizers.rs:227-240`).
- CJK ranges: two variants, matching `pretokenizers.rs:482-496` and
  `normalizers.rs:164-176` (they differ in the last two extension ranges).
- Combining marks: the reference's explicit ranges
  (`normalizers.rs:188-202`), *not* general category M.
- Control: `normalizers.rs:138-146`.
"""

from __future__ import annotations

import functools
import os
import sys
import unicodedata

import numpy as np

MAX_CP = 0x110000

# GPT-2 regex byte classes (values of the CLASS table)
CL_OTHER = 0
CL_WS = 1
CL_LETTER = 2
CL_NUMBER = 3

_WHITESPACE_CPS = (
    list(range(0x09, 0x0E))
    + [0x20, 0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B))
    + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)


def _cache_path(name: str) -> str:
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_table_cache")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{name}_py{sys.version_info[0]}{sys.version_info[1]}.npy")


@functools.lru_cache(maxsize=None)
def category_major_table() -> np.ndarray:
    """[MAX_CP] uint8: 0=other, 1=L*, 2=N*, 3=M* (general category majors)."""
    path = _cache_path("catmajor")
    if os.path.exists(path):
        return np.load(path)
    tab = np.zeros(MAX_CP, dtype=np.uint8)
    cat = unicodedata.category
    majors = {"L": 1, "N": 2, "M": 3}
    for cp in range(MAX_CP):
        m = cat(chr(cp))[0]
        v = majors.get(m)
        if v:
            tab[cp] = v
    np.save(path, tab)
    return tab


@functools.lru_cache(maxsize=None)
def gpt2_class_table() -> np.ndarray:
    """[MAX_CP] uint8 with CL_* values for the GPT-2 pre-split regex."""
    major = category_major_table()
    tab = np.full(MAX_CP, CL_OTHER, dtype=np.uint8)
    tab[major == 1] = CL_LETTER
    tab[major == 2] = CL_NUMBER
    tab[np.array(_WHITESPACE_CPS)] = CL_WS
    return tab


@functools.lru_cache(maxsize=None)
def whitespace_set() -> frozenset[str]:
    """Unicode White_Space chars (rust char::is_whitespace / regex \\s)."""
    return frozenset(chr(c) for c in _WHITESPACE_CPS)


def is_whitespace(ch: str) -> bool:
    return ch in whitespace_set()


def _in_ranges(cp: int, ranges: list[tuple[int, int]]) -> bool:
    return any(lo <= cp <= hi for lo, hi in ranges)


_PUNCT_RANGES = [
    (0x0021, 0x002F),
    (0x003A, 0x0040),
    (0x005B, 0x0060),
    (0x007B, 0x007E),
    (0x00A1, 0x00BF),
    (0x2000, 0x206F),
    (0x2E00, 0x2E7F),
    (0x3000, 0x303F),
]

# is_chinese_char in pretokenizers.rs:482-496 (BERT pre-tokenizer)
_CJK_RANGES_PRETOK = [
    (0x4E00, 0x9FFF),
    (0x3400, 0x4DBF),
    (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F),
    (0x2B740, 0x2B81F),
    (0x2B820, 0x2CEAF),
    (0x2CEB0, 0x2EBEF),
    (0x30000, 0x3134F),
    (0xF900, 0xFAFF),
    (0x2F800, 0x2FA1F),
]

# is_chinese_char_bert in normalizers.rs:164-176 (BertNormalizer)
_CJK_RANGES_BERT = [
    (0x4E00, 0x9FFF),
    (0x3400, 0x4DBF),
    (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F),
    (0x2B740, 0x2B81F),
    (0x2B820, 0x2CEAF),
    (0xF900, 0xFAFF),
    (0x2F800, 0x2FA1F),
]

_COMBINING_RANGES = [
    (0x0300, 0x036F),
    (0x1AB0, 0x1AFF),
    (0x1DC0, 0x1DFF),
    (0x20D0, 0x20FF),
    (0xFE20, 0xFE2F),
]


def is_unicode_punctuation(ch: str) -> bool:
    """Reference's is_unicode_punctuation (pretokenizers.rs:227-240)."""
    return _in_ranges(ord(ch), _PUNCT_RANGES)


def is_ascii_punctuation(ch: str) -> bool:
    cp = ord(ch)
    return (
        0x21 <= cp <= 0x2F
        or 0x3A <= cp <= 0x40
        or 0x5B <= cp <= 0x60
        or 0x7B <= cp <= 0x7E
    )


def is_punctuation(ch: str) -> bool:
    return is_ascii_punctuation(ch) or is_unicode_punctuation(ch)


def is_cjk_pretok(ch: str) -> bool:
    return _in_ranges(ord(ch), _CJK_RANGES_PRETOK)


def is_cjk_bert(ch: str) -> bool:
    return _in_ranges(ord(ch), _CJK_RANGES_BERT)


def is_combining_mark(ch: str) -> bool:
    """Reference's is_combining_mark ranges (normalizers.rs:188-202)."""
    return _in_ranges(ord(ch), _COMBINING_RANGES)


def is_control_char(ch: str) -> bool:
    """Control chars excluding tab/newline/CR (normalizers.rs:138-146)."""
    if ch in ("\t", "\n", "\r"):
        return False
    cp = ord(ch)
    return 0x0000 <= cp <= 0x001F or 0x007F <= cp <= 0x009F


# Simplified script buckets (pretokenizers.rs:549-594)
SCRIPT_LATIN = 1
SCRIPT_GREEK = 2
SCRIPT_CYRILLIC = 3
SCRIPT_ARABIC = 4
SCRIPT_HEBREW = 5
SCRIPT_HAN = 6
SCRIPT_HIRAGANA = 7
SCRIPT_KATAKANA = 8
SCRIPT_HANGUL = 9
SCRIPT_THAI = 10
SCRIPT_COMMON = 11
SCRIPT_UNKNOWN = 0

_SCRIPT_RANGES = [
    ((0x0041, 0x007A), SCRIPT_LATIN),
    ((0x00C0, 0x024F), SCRIPT_LATIN),
    ((0x1E00, 0x1EFF), SCRIPT_LATIN),
    ((0x0370, 0x03FF), SCRIPT_GREEK),
    ((0x1F00, 0x1FFF), SCRIPT_GREEK),
    ((0x0400, 0x04FF), SCRIPT_CYRILLIC),
    ((0x0500, 0x052F), SCRIPT_CYRILLIC),
    ((0x0600, 0x06FF), SCRIPT_ARABIC),
    ((0x0750, 0x077F), SCRIPT_ARABIC),
    ((0x08A0, 0x08FF), SCRIPT_ARABIC),
    ((0x0590, 0x05FF), SCRIPT_HEBREW),
    ((0x4E00, 0x9FFF), SCRIPT_HAN),
    ((0x3400, 0x4DBF), SCRIPT_HAN),
    ((0x20000, 0x2A6DF), SCRIPT_HAN),
    ((0x3040, 0x309F), SCRIPT_HIRAGANA),
    ((0x30A0, 0x30FF), SCRIPT_KATAKANA),
    ((0x31F0, 0x31FF), SCRIPT_KATAKANA),
    ((0xAC00, 0xD7AF), SCRIPT_HANGUL),
    ((0x1100, 0x11FF), SCRIPT_HANGUL),
    ((0x3130, 0x318F), SCRIPT_HANGUL),
    ((0x0E00, 0x0E7F), SCRIPT_THAI),
    ((0x0000, 0x0040), SCRIPT_COMMON),
    ((0x005B, 0x0060), SCRIPT_COMMON),
    ((0x007B, 0x00BF), SCRIPT_COMMON),
    ((0x2000, 0x206F), SCRIPT_COMMON),
    ((0x3000, 0x303F), SCRIPT_COMMON),
]


def get_unicode_script(ch: str) -> int:
    """First-match-wins over the reference's range list.

    The rust ``matches!`` arms are checked in order, which matters for
    overlaps (e.g. 0x3000-0x303F is claimed by HANGUL's 0x3130.. no overlap,
    but COMMON overlaps nothing earlier except via ordering kept here).
    """
    cp = ord(ch)
    for (lo, hi), script in _SCRIPT_RANGES:
        if lo <= cp <= hi:
            return script
    return SCRIPT_UNKNOWN
