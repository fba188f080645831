"""Decoders: token strings -> text.

Reference-exact semantics from `/root/reference/src/decoders.rs:8-243`.
The hot ByteLevel path has a device-side twin in ``ops/decode.py`` (gather
id->bytes + segmented compaction); these host implementations are the
golden oracle and serve the exotic variants.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..utils.bytelevel import unicode_to_bytes

__all__ = [
    "Decoder",
    "ByteLevel",
    "Metaspace",
    "WordPiece",
    "BPEDecoder",
    "Replace",
    "CTC",
    "Fuse",
    "Strip",
    "Sequence",
    "default_decoder",
]


class Decoder:
    def decode(self, tokens: list[str]) -> str:
        raise NotImplementedError

    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__


class ByteLevel(Decoder):
    """GPT-2 unicode->byte reversal (decoders.rs:94-119)."""

    def decode(self, tokens: list[str]) -> str:
        dec = unicode_to_bytes()
        joined = "".join(tokens)
        out = bytearray()
        for c in joined:
            b = dec.get(c)
            if b is not None:
                out.append(b)
            elif c.isascii():
                out.append(ord(c))
            # non-ascii chars outside the alphabet are dropped
        return out.decode("utf-8", errors="replace")


@dataclass(eq=False)
class Metaspace(Decoder):
    replacement: str = "▁"
    add_prefix_space: bool = True

    def decode(self, tokens: list[str]) -> str:
        result = "".join(tokens).replace(self.replacement, " ")
        if self.add_prefix_space and result.startswith(" "):
            result = result[1:]
        return result


@dataclass(eq=False)
class WordPiece(Decoder):
    prefix: str = "##"
    cleanup: bool = True

    def decode(self, tokens: list[str]) -> str:
        result = ""
        for token in tokens:
            if token.startswith(self.prefix):
                result += token[len(self.prefix) :]
            else:
                if result:
                    result += " "
                result += token
        if self.cleanup:
            for a, b in (
                (" .", "."),
                (" ,", ","),
                (" !", "!"),
                (" ?", "?"),
                (" :", ":"),
                (" ;", ";"),
                (" '", "'"),
                ("' ", "'"),
            ):
                result = result.replace(a, b)
        return result


@dataclass(eq=False)
class BPEDecoder(Decoder):
    """End-of-word-suffix BPE decoder (decoders.rs:165-178)."""

    suffix: str = "</w>"

    def decode(self, tokens: list[str]) -> str:
        result = ""
        for token in tokens:
            if token.endswith(self.suffix):
                result += token[: len(token) - len(self.suffix)] + " "
            else:
                result += token
        # rust trim_end trims White_Space
        return result.rstrip()


@dataclass(eq=False)
class Replace(Decoder):
    pattern: str = ""
    replacement: str = ""

    def decode(self, tokens: list[str]) -> str:
        return "".join(tokens).replace(self.pattern, self.replacement)


@dataclass(eq=False)
class CTC(Decoder):
    pad_token: str = "<pad>"
    word_delimiter_token: str | None = None

    def decode(self, tokens: list[str]) -> str:
        result = []
        prev = None
        for token in tokens:
            if token == self.pad_token:
                prev = None
                continue
            if self.word_delimiter_token is not None and token == self.word_delimiter_token:
                result.append(" ")
                prev = None
                continue
            if prev != token:
                result.append(token)
            prev = token
        return "".join(result)


class Fuse(Decoder):
    def decode(self, tokens: list[str]) -> str:
        return "".join(tokens)


@dataclass(eq=False)
class Strip(Decoder):
    content: str = " "
    start: int = 0
    stop: int = 0

    def decode(self, tokens: list[str]) -> str:
        result = "".join(tokens)
        for _ in range(self.start):
            if result.startswith(self.content):
                result = result[len(self.content) :]
            else:
                break
        for _ in range(self.stop):
            if result.endswith(self.content):
                result = result[: len(result) - len(self.content)]
            else:
                break
        return result


@dataclass(eq=False)
class Sequence(Decoder):
    decoders: list = field(default_factory=list)

    def decode(self, tokens: list[str]) -> str:
        result = list(tokens)
        for d in self.decoders:
            result = [d.decode(result)]
        return "".join(result)


def default_decoder() -> Decoder:
    return ByteLevel()
