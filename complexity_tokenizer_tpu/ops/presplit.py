"""Vectorized GPT-2 pre-split over byte tensors.

The reference runs a regex ``find_iter`` per text on the host
(pretokenizers.rs:158-185).  Here the same segmentation is computed as a
fully data-parallel pass over ``[B, L]`` uint8 byte tensors: the simplified
no-lookahead pattern

    's|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+

admits *local* boundary rules (window of +/-3 bytes), derived from its
leftmost-first semantics:

- a match-start exists at byte p iff p is a codepoint lead byte and either
  (a) p is an "absorbed" single space followed by a letter/number/other run,
  (b) a contraction ended at p-1, or
  (c) the char class changes at p and p-1 was not an absorbed space,
  all outside contraction interiors;
- a single space is absorbed forward iff its left neighbor is not
  whitespace and its right neighbor is a non-whitespace char;
- an apostrophe starts a match iff its left char is a letter/number or a
  non-absorbed whitespace (or it is at position 0); contractions then
  consume 1-2 ASCII lowercase letters.

This pass is diff-tested byte-for-byte against the host scanner
(``core.pretokenizers.gpt2_split``) in tests/test_device_presplit.py.

UTF-8 handling: codepoints are decoded arithmetically at lead bytes, their
GPT-2 class gathered from a dense [0x110000] table, and the class
propagated onto continuation bytes so class-run rules work on raw bytes.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.unicode_tables import (
    CL_LETTER,
    CL_NUMBER,
    CL_OTHER,
    CL_WS,
    gpt2_class_table,
)

CL_NONE = 4  # out-of-text sentinel


@functools.lru_cache(maxsize=None)
def class_table_jnp():
    import jax.numpy as jnp

    return jnp.asarray(gpt2_class_table())


def _shift_right(x, k, fill):
    """out[:, i] = x[:, i-k] with `fill` in the first k lanes."""
    import jax.numpy as jnp

    if k == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (k,), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


def _shift_left(x, k, fill):
    import jax.numpy as jnp

    if k == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (k,), fill, dtype=x.dtype)
    return jnp.concatenate([x[..., k:], pad], axis=-1)


def presplit(byte_arr, lengths, class_table):
    """Compute word segmentation of packed byte rows.

    Args:
      byte_arr: [B, L] uint8 (zero-padded past ``lengths``).
      lengths: [B] int32 byte lengths.
      class_table: [0x110000] uint8 jnp array (GPT-2 classes).

    Returns:
      (start, word_id, valid): start [B, L] bool — match begins at this
      byte; word_id [B, L] int32 — 0-based match index per byte (-1 past
      end); valid [B, L] bool.
    """
    import jax.numpy as jnp

    b0 = byte_arr.astype(jnp.int32)
    B, L = byte_arr.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos < lengths[:, None]

    b1 = _shift_left(b0, 1, 0)
    b2 = _shift_left(b0, 2, 0)
    b3 = _shift_left(b0, 3, 0)

    is_cont = (b0 & 0xC0) == 0x80
    # codepoint at lead bytes (garbage at continuation bytes, masked later)
    cp1 = b0
    cp2 = ((b0 & 0x1F) << 6) | (b1 & 0x3F)
    cp3 = ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
    cp4 = ((b0 & 0x07) << 18) | ((b1 & 0x3F) << 12) | ((b2 & 0x3F) << 6) | (b3 & 0x3F)
    cp = jnp.where(
        b0 < 0x80,
        cp1,
        jnp.where(b0 < 0xE0, cp2, jnp.where(b0 < 0xF0, cp3, cp4)),
    )
    cp = jnp.clip(cp, 0, 0x10FFFF)
    cls = class_table[cp].astype(jnp.int32)
    # propagate lead-byte class onto continuation bytes (max 3 steps)
    for _ in range(3):
        cls = jnp.where(is_cont, _shift_right(cls, 1, CL_NONE), cls)
    cls = jnp.where(valid, cls, CL_NONE)

    cls_prev = _shift_right(cls, 1, CL_NONE)
    cls_next = _shift_left(cls, 1, CL_NONE)

    is_space = valid & (b0 == 0x20)
    run_next = (cls_next == CL_LETTER) | (cls_next == CL_NUMBER) | (cls_next == CL_OTHER)
    absorbed = is_space & (cls_prev != CL_WS) & run_next
    absorbed_prev = _shift_right(absorbed, 1, False)

    is_quote = valid & (b0 == 0x27)
    qsm = is_quote & (
        (cls_prev == CL_LETTER)
        | (cls_prev == CL_NUMBER)
        | ((cls_prev == CL_WS) & ~absorbed_prev)
        | (cls_prev == CL_NONE)
    )

    n1 = b1  # next byte (ASCII contraction letters are single bytes)
    n2 = b2
    valid1 = _shift_left(valid, 1, False)
    valid2 = _shift_left(valid, 2, False)
    contr2 = (
        qsm
        & valid1
        & ((n1 == ord("s")) | (n1 == ord("t")) | (n1 == ord("m")) | (n1 == ord("d")))
    )
    contr3 = (
        qsm
        & valid2
        & (
            ((n1 == ord("r")) & (n2 == ord("e")))
            | ((n1 == ord("v")) & (n2 == ord("e")))
            | ((n1 == ord("l")) & (n2 == ord("l")))
        )
    )

    interior = (
        _shift_right(contr2, 1, False)
        | _shift_right(contr3, 1, False)
        | _shift_right(contr3, 2, False)
    )
    cend_prev = _shift_right(contr2, 2, False) | _shift_right(contr3, 3, False)

    class_change = (cls != cls_prev) & ~absorbed_prev
    start = valid & ~is_cont & ~interior & (absorbed | cend_prev | class_change)

    word_id = jnp.cumsum(start.astype(jnp.int32), axis=-1) - 1
    word_id = jnp.where(valid, word_id, -1)
    return start, word_id, valid


def presplit_reference_np(text: str):
    """Host oracle of the same output format, via the scalar scanner."""
    from ..core.pretokenizers import gpt2_split_spans

    data = text.encode("utf-8")
    spans_chars = gpt2_split_spans(text)
    # char spans -> byte spans
    char_byte_offsets = np.zeros(len(text) + 1, dtype=np.int64)
    off = 0
    for i, ch in enumerate(text):
        char_byte_offsets[i] = off
        off += len(ch.encode("utf-8"))
    char_byte_offsets[len(text)] = off
    start = np.zeros(len(data), dtype=bool)
    word_id = np.full(len(data), -1, dtype=np.int32)
    for wi, (a, b) in enumerate(spans_chars):
        ba, bb = char_byte_offsets[a], char_byte_offsets[b]
        start[ba] = True
        word_id[ba:bb] = wi
    return start, word_id
