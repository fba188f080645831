"""GPT-2 byte-level alphabet: bijection between the 256 byte values and
printable unicode codepoints.

Semantics mirror the reference implementation's ``bytes_to_unicode``
(`/root/reference/src/pretokenizers.rs:130-153` and
`/root/reference/src/decoders.rs:70-91`): printable ASCII ``!..~`` plus the
Latin-1 ranges ``0xA1..0xAC`` and ``0xAE..0xFF`` map to themselves; every
other byte value b maps to ``chr(256 + n)`` in discovery order.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def bytes_to_unicode() -> dict[int, str]:
    """byte value -> unicode char (GPT-2 alphabet)."""
    bs = list(range(ord("!"), ord("~") + 1))
    bs += list(range(0xA1, 0xAC + 1))
    bs += list(range(0xAE, 0xFF + 1))
    cs = list(bs)
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


@functools.lru_cache(maxsize=None)
def unicode_to_bytes() -> dict[str, int]:
    """unicode char -> byte value (inverse of :func:`bytes_to_unicode`)."""
    return {c: b for b, c in bytes_to_unicode().items()}


@functools.lru_cache(maxsize=None)
def byte_encoder_array() -> np.ndarray:
    """[256] int32 array: byte value -> alphabet codepoint."""
    enc = bytes_to_unicode()
    return np.array([ord(enc[b]) for b in range(256)], dtype=np.int32)


@functools.lru_cache(maxsize=None)
def _byte_translate_table() -> dict[int, str]:
    """str.translate table: latin-1 codepoint -> alphabet char."""
    enc = bytes_to_unicode()
    return {b: enc[b] for b in range(256)}


def encode_bytes(data: bytes) -> str:
    """Map raw bytes to their byte-level alphabet string.

    ``decode("latin-1")`` is a bijection byte -> codepoint 0..255, so one
    C-level translate replaces the per-byte Python join.
    """
    return data.decode("latin-1").translate(_byte_translate_table())


def decode_chars(s: str) -> bytes:
    """Map a byte-level alphabet string back to raw bytes.

    Mirrors the reference ByteLevel decoder's lenient fallback
    (`/root/reference/src/decoders.rs:94-119`): unknown ASCII chars pass
    through as their own byte value; unknown non-ASCII chars are dropped.
    """
    dec = unicode_to_bytes()
    out = bytearray()
    for ch in s:
        b = dec.get(ch)
        if b is not None:
            out.append(b)
        elif ord(ch) < 128:
            out.append(ord(ch))
    return bytes(out)
