"""Text normalizers with reference-exact semantics.

Host-tier implementations of every normalizer in the reference
(`/root/reference/src/normalizers.rs:9-105`).  Unicode normalization is
delegated to CPython's ``unicodedata`` (same Unicode algorithm as the rust
``unicode-normalization`` crate).  These objects are pure functions of their
config; the device pipeline consults them for table building and falls back
to them verbatim for exotic configs.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field

from ..utils.unicode_tables import (
    is_cjk_bert,
    is_combining_mark,
    is_control_char,
    whitespace_set,
)

__all__ = [
    "Normalizer",
    "NFC",
    "NFD",
    "NFKC",
    "NFKD",
    "Lowercase",
    "Strip",
    "StripAccents",
    "Replace",
    "Prepend",
    "Append",
    "BertNormalizer",
    "Precompiled",
    "Sequence",
    "default_normalizer",
    "bert_normalizer",
]


class Normalizer:
    """Base class; subclasses implement :meth:`normalize`."""

    def normalize(self, text: str) -> str:
        raise NotImplementedError

    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __repr__(self):
        args = ", ".join(f"{k}={v!r}" for k, v in self.__dict__.items())
        return f"{type(self).__name__}({args})"


class NFC(Normalizer):
    def normalize(self, text: str) -> str:
        return unicodedata.normalize("NFC", text)


class NFD(Normalizer):
    def normalize(self, text: str) -> str:
        return unicodedata.normalize("NFD", text)


class NFKC(Normalizer):
    def normalize(self, text: str) -> str:
        return unicodedata.normalize("NFKC", text)


class NFKD(Normalizer):
    def normalize(self, text: str) -> str:
        return unicodedata.normalize("NFKD", text)


class Lowercase(Normalizer):
    def normalize(self, text: str) -> str:
        return text.lower()


class Strip(Normalizer):
    """Trim leading/trailing whitespace (rust str::trim = White_Space)."""

    def normalize(self, text: str) -> str:
        ws = whitespace_set()
        start, end = 0, len(text)
        while start < end and text[start] in ws:
            start += 1
        while end > start and text[end - 1] in ws:
            end -= 1
        return text[start:end]


def _strip_accents(text: str) -> str:
    """NFD + drop the reference's combining-mark ranges (normalizers.rs:113-117)."""
    return "".join(
        c for c in unicodedata.normalize("NFD", text) if not is_combining_mark(c)
    )


class StripAccents(Normalizer):
    def normalize(self, text: str) -> str:
        return _strip_accents(text)


@dataclass(eq=False)
class Replace(Normalizer):
    pattern: str
    replacement: str

    def normalize(self, text: str) -> str:
        # rust str::replace is literal substring replacement, not regex
        return text.replace(self.pattern, self.replacement)


@dataclass(eq=False)
class Prepend(Normalizer):
    prepend: str

    def normalize(self, text: str) -> str:
        return self.prepend + text


@dataclass(eq=False)
class Append(Normalizer):
    append: str

    def normalize(self, text: str) -> str:
        return text + self.append


@dataclass(eq=False)
class BertNormalizer(Normalizer):
    """clean_text + CJK spacing + NFC + optional accents + lowercase.

    Order of passes mirrors `/root/reference/src/normalizers.rs:59-92`.
    """

    clean_text: bool = True
    handle_chinese_chars: bool = True
    strip_accents: bool | None = None
    lowercase: bool = True

    def normalize(self, text: str) -> str:
        result = text
        if self.clean_text:
            ws = whitespace_set()
            out = []
            for c in result:
                if is_control_char(c):
                    continue
                out.append(" " if c in ws else c)
            result = "".join(out)
        if self.handle_chinese_chars:
            out = []
            for c in result:
                if is_cjk_bert(c):
                    out.append(f" {c} ")
                else:
                    out.append(c)
            result = "".join(out)
        result = unicodedata.normalize("NFC", result)
        should_strip = (
            self.strip_accents if self.strip_accents is not None else self.lowercase
        )
        if should_strip:
            result = _strip_accents(result)
        if self.lowercase:
            result = result.lower()
        return result


@dataclass(eq=False)
class Precompiled(Normalizer):
    """Sequential literal replacements from a charsmap (normalizers.rs:179-185)."""

    charsmap: list = field(default_factory=list)

    def normalize(self, text: str) -> str:
        result = text
        for frm, to in self.charsmap:
            result = result.replace(frm, to)
        return result


@dataclass(eq=False)
class Sequence(Normalizer):
    normalizers: list = field(default_factory=list)

    def normalize(self, text: str) -> str:
        result = text
        for n in self.normalizers:
            result = n.normalize(result)
        return result


def default_normalizer() -> Normalizer:
    return NFC()


def bert_normalizer() -> Normalizer:
    """NFC + lowercase + strip accents + strip (normalizers.rs:210-217)."""
    return Sequence([NFC(), Lowercase(), StripAccents(), Strip()])
