"""Pre-tokenizers with reference-exact semantics.

Host-tier implementations of all 12 variants in
`/root/reference/src/pretokenizers.rs:39-127`.  The GPT-2 split is a
hand-written leftmost-first scanner implementing the reference's simplified
(no-lookahead) pattern literally::

    's|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+

(`/root/reference/src/pretokenizers.rs:11-15`).  The scanner is the golden
oracle against which the vectorized device pre-split kernel is diff-tested.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from ..utils.bytelevel import bytes_to_unicode
from ..utils.unicode_tables import (
    CL_LETTER,
    CL_NUMBER,
    CL_OTHER,
    CL_WS,
    gpt2_class_table,
    get_unicode_script,
    is_cjk_pretok,
    is_punctuation,
    whitespace_set,
    SCRIPT_COMMON,
)

__all__ = [
    "SplitBehavior",
    "PreTokenizer",
    "Whitespace",
    "WhitespaceSplit",
    "ByteLevel",
    "Metaspace",
    "Punctuation",
    "Digits",
    "Split",
    "GPT2",
    "BertPreTokenizer",
    "CharDelimiterSplit",
    "UnicodeScripts",
    "Sequence",
    "gpt2_split",
    "gpt2_split_spans",
    "default_pretokenizer",
]


class SplitBehavior(str, Enum):
    REMOVED = "Removed"
    ISOLATED = "Isolated"
    MERGED_WITH_PREVIOUS = "MergedWithPrevious"
    MERGED_WITH_NEXT = "MergedWithNext"
    CONTIGUOUS = "Contiguous"


_CONTR2_NEXT = frozenset("stmd")


def gpt2_split_spans(text: str) -> list[tuple[int, int]]:
    """Leftmost-first matches of the simplified GPT-2 pattern, as char spans.

    Implements the alternation order literally: contractions first, then
    `` ?\\p{L}+``, `` ?\\p{N}+``, `` ?[^\\s\\p{L}\\p{N}]+``, ``\\s+``.
    Because the four classes partition all of Unicode, matches tile the
    entire string.
    """
    cls = gpt2_class_table()
    n = len(text)
    cp = [ord(c) for c in text]
    c = [cls[x] for x in cp]
    spans = []
    i = 0
    while i < n:
        ch = text[i]
        # alternatives 1-7: contractions (lowercase ASCII literals)
        if ch == "'" and i + 1 < n:
            nxt = text[i + 1]
            if nxt in _CONTR2_NEXT:
                spans.append((i, i + 2))
                i += 2
                continue
            if i + 2 < n:
                two = text[i + 1 : i + 3]
                if two in ("re", "ve", "ll"):
                    spans.append((i, i + 3))
                    i += 3
                    continue
        # alternatives 8-10: optional leading space + greedy class run
        start = i
        j = i
        if ch == " " and j + 1 < n and c[j + 1] != CL_WS:
            j += 1
        k = c[j]
        if k != CL_WS:
            e = j
            while e < n and c[e] == k:
                e += 1
            spans.append((start, e))
            i = e
            continue
        # alternative 11: \s+ (greedy)
        e = i
        while e < n and c[e] == CL_WS:
            e += 1
        spans.append((i, e))
        i = e
    return spans


def gpt2_split(text: str) -> list[str]:
    return [text[a:b] for a, b in gpt2_split_spans(text)]


class PreTokenizer:
    def pre_tokenize(self, text: str) -> list[str]:
        raise NotImplementedError

    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __repr__(self):
        args = ", ".join(f"{k}={v!r}" for k, v in self.__dict__.items())
        return f"{type(self).__name__}({args})"


class Whitespace(PreTokenizer):
    """split_whitespace: split on White_Space runs, drop empties."""

    def pre_tokenize(self, text: str) -> list[str]:
        ws = whitespace_set()
        words, cur = [], []
        for ch in text:
            if ch in ws:
                if cur:
                    words.append("".join(cur))
                    cur = []
            else:
                cur.append(ch)
        if cur:
            words.append("".join(cur))
        return words


class WhitespaceSplit(PreTokenizer):
    """Same observable behavior as Whitespace (pretokenizers.rs:78-83)."""

    def pre_tokenize(self, text: str) -> list[str]:
        return Whitespace().pre_tokenize(text)


@dataclass(eq=False)
class ByteLevel(PreTokenizer):
    """GPT-2 regex split + byte->unicode alphabet encoding.

    Mirrors byte_level_pretokenize (pretokenizers.rs:158-185): optional
    prefix space, regex matches, each match's UTF-8 bytes mapped through
    the byte-level alphabet; empty results dropped.
    """

    add_prefix_space: bool = False

    def pre_tokenize(self, text: str) -> list[str]:
        from ..utils.bytelevel import encode_bytes

        if self.add_prefix_space and text and not text.startswith(" "):
            text = " " + text
        words = []
        for a, b in gpt2_split_spans(text):
            encoded = encode_bytes(text[a:b].encode("utf-8"))
            if encoded:
                words.append(encoded)
        return words


@dataclass(eq=False)
class Metaspace(PreTokenizer):
    replacement: str = "▁"
    add_prefix_space: bool = True

    def pre_tokenize(self, text: str) -> list[str]:
        if self.add_prefix_space:
            text = self.replacement + text
        text = text.replace(" ", self.replacement)
        ws = whitespace_set()
        words, cur = [], []
        for ch in text:
            if ch in ws and ch != self.replacement:
                if cur:
                    words.append("".join(cur))
                    cur = []
            else:
                cur.append(ch)
        if cur:
            words.append("".join(cur))
        return words


class Punctuation(PreTokenizer):
    def pre_tokenize(self, text: str) -> list[str]:
        words, cur = [], []
        for ch in text:
            if is_punctuation(ch):
                if cur:
                    words.append("".join(cur))
                    cur = []
                words.append(ch)
            else:
                cur.append(ch)
        if cur:
            words.append("".join(cur))
        return words


@dataclass(eq=False)
class Digits(PreTokenizer):
    individual_digits: bool = False

    def pre_tokenize(self, text: str) -> list[str]:
        words, cur = [], []
        in_digits = False
        for ch in text:
            is_digit = ch.isascii() and ch.isdigit()
            if is_digit != in_digits:
                if cur:
                    words.append("".join(cur))
                    cur = []
                in_digits = is_digit
            if is_digit and self.individual_digits:
                if cur:
                    words.append("".join(cur))
                    cur = []
                words.append(ch)
            else:
                cur.append(ch)
        if cur:
            words.append("".join(cur))
        return words


def _compile_pattern(pattern: str):
    """Compile a user pattern with rust-regex-compatible syntax via `regex`."""
    import regex as _re

    try:
        return _re.compile(pattern, _re.VERSION1)
    except Exception:
        try:
            return _re.compile(pattern)
        except Exception:
            return None


@dataclass(eq=False)
class Split(PreTokenizer):
    """Regex split with 5 behaviors (pretokenizers.rs:298-433).

    The legacy ``Split { pattern, invert }`` maps to behavior=Removed.
    """

    pattern: str = ""
    behavior: SplitBehavior = SplitBehavior.REMOVED
    invert: bool = False

    def pre_tokenize(self, text: str) -> list[str]:
        rx = _compile_pattern(self.pattern)
        if rx is None:
            return [text]
        matches = [(m.start(), m.end()) for m in rx.finditer(text)]
        if not matches:
            return [text]
        result: list[str] = []
        last_end = 0
        b = self.behavior
        if b == SplitBehavior.REMOVED:
            for s, e in matches:
                if self.invert:
                    if s > last_end:
                        result.append(text[last_end:s])
                else:
                    result.append(text[s:e])
                last_end = e
            if self.invert and last_end < len(text):
                result.append(text[last_end:])
        elif b == SplitBehavior.ISOLATED:
            for s, e in matches:
                if s > last_end and text[last_end:s]:
                    result.append(text[last_end:s])
                result.append(text[s:e])
                last_end = e
            if last_end < len(text):
                result.append(text[last_end:])
        elif b == SplitBehavior.MERGED_WITH_PREVIOUS:
            for s, e in matches:
                if s > last_end:
                    before = text[last_end:s]
                    if before:
                        result.append(before + text[s:e])
                    elif result:
                        result[-1] = result[-1] + text[s:e]
                    else:
                        result.append(text[s:e])
                elif result:
                    result[-1] = result[-1] + text[s:e]
                else:
                    result.append(text[s:e])
                last_end = e
            if last_end < len(text):
                result.append(text[last_end:])
        elif b == SplitBehavior.MERGED_WITH_NEXT:
            pending = None
            for s, e in matches:
                if s > last_end:
                    before = text[last_end:s]
                    if pending is not None:
                        result.append(pending + before)
                    elif before:
                        result.append(before)
                elif pending is not None:
                    result.append(pending)
                pending = text[s:e]
                last_end = e
            if last_end < len(text):
                remaining = text[last_end:]
                if pending is not None:
                    result.append(pending + remaining)
                else:
                    result.append(remaining)
            elif pending is not None:
                result.append(pending)
        elif b == SplitBehavior.CONTIGUOUS:
            current = ""
            for s, e in matches:
                if s > last_end:
                    before = text[last_end:s]
                    if current:
                        result.append(current)
                        current = ""
                    if before:
                        result.append(before)
                current += text[s:e]
                last_end = e
            if current:
                result.append(current)
            if last_end < len(text):
                result.append(text[last_end:])
        return [s for s in result if s]


class GPT2(PreTokenizer):
    """Raw GPT-2 regex matches (no byte-level encoding)."""

    def pre_tokenize(self, text: str) -> list[str]:
        return gpt2_split(text)


class BertPreTokenizer(PreTokenizer):
    """Whitespace split + isolate punctuation and CJK (pretokenizers.rs:445-479)."""

    def pre_tokenize(self, text: str) -> list[str]:
        ws = whitespace_set()
        words, cur = [], []
        for ch in text:
            if ch in ws:
                if cur:
                    words.append("".join(cur))
                    cur = []
            elif is_cjk_pretok(ch) or is_punctuation(ch):
                if cur:
                    words.append("".join(cur))
                    cur = []
                words.append(ch)
            else:
                cur.append(ch)
        if cur:
            words.append("".join(cur))
        return words


@dataclass(eq=False)
class CharDelimiterSplit(PreTokenizer):
    delimiter: str = " "

    def pre_tokenize(self, text: str) -> list[str]:
        return [s for s in text.split(self.delimiter) if s]


class UnicodeScripts(PreTokenizer):
    """Group runs of the same (simplified) script (pretokenizers.rs:508-546)."""

    def pre_tokenize(self, text: str) -> list[str]:
        ws = whitespace_set()
        words, cur = [], []
        current_script = None
        for ch in text:
            if ch in ws:
                if cur:
                    words.append("".join(cur))
                    cur = []
                    current_script = None
                continue
            script = get_unicode_script(ch)
            if (
                current_script is None
                or current_script == script
                or script == SCRIPT_COMMON
            ):
                cur.append(ch)
                if current_script is None and script != SCRIPT_COMMON:
                    current_script = script
            else:
                if cur:
                    words.append("".join(cur))
                    cur = []
                cur.append(ch)
                current_script = script
        if cur:
            words.append("".join(cur))
        return words


@dataclass(eq=False)
class Sequence(PreTokenizer):
    pretokenizers: list = field(default_factory=list)

    def pre_tokenize(self, text: str) -> list[str]:
        words = [text]
        for pt in self.pretokenizers:
            new_words = []
            for w in words:
                new_words.extend(pt.pre_tokenize(w))
            words = new_words
        return words


def default_pretokenizer() -> PreTokenizer:
    return ByteLevel(add_prefix_space=False)
