"""Device-side batch decode: id -> bytes gather + segmented compaction.

The reference decodes on the host per sequence (vocab gather + ByteLevel
unicode->byte reversal, decoders.rs:94-119, parallelized with rayon at
mod.rs:771-785).  Here the whole batch decodes in one device pass:

1. host-built table maps every vocab id directly to its RAW output bytes
   (the alphabet reversal + ascii fallback folded in at build time);
2. a [B, T] id batch gathers to [B, T, W] bytes, masked by per-id lengths
   (0 for skipped specials / padding);
3. a stable compaction packs live bytes to the row front;
4. the host slices each row and does the final UTF-8 decode (lossy).
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.bytelevel import unicode_to_bytes

__all__ = ["build_decode_tables", "DecodePipeline"]


def build_decode_tables(vocab_r: dict[int, str], special_ids=()):
    """(bytes_mat [V, W] uint8, lens [V] int32, special [V] bool)."""
    if not vocab_r:
        return (
            np.zeros((1, 1), np.uint8),
            np.zeros(1, np.int32),
            np.zeros(1, bool),
        )
    dec = unicode_to_bytes()
    max_id = max(vocab_r)
    raw: dict[int, bytes] = {}
    for i, tok in vocab_r.items():
        out = bytearray()
        for c in tok:
            b = dec.get(c)
            if b is not None:
                out.append(b)
            elif c.isascii():
                out.append(ord(c))
        raw[i] = bytes(out)
    W = max((len(b) for b in raw.values()), default=1) or 1
    mat = np.zeros((max_id + 1, W), dtype=np.uint8)
    lens = np.zeros(max_id + 1, dtype=np.int32)
    for i, b in raw.items():
        mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    special = np.zeros(max_id + 1, dtype=bool)
    for i in special_ids:
        if 0 <= i <= max_id:
            special[i] = True
    return mat, lens, special


class DecodePipeline:
    def __init__(self, vocab_r: dict[int, str], special_ids=()):
        import jax.numpy as jnp

        mat, lens, special = build_decode_tables(vocab_r, special_ids)
        self.vocab_size = mat.shape[0]
        self.W = mat.shape[1]
        self.mat = jnp.asarray(mat)
        self.lens = jnp.asarray(lens)
        self.special = jnp.asarray(special)

    @functools.cached_property
    def _decode_fn(self):
        import jax
        import jax.numpy as jnp

        W = self.W

        def fn(ids, skip_special):
            # ids: [B, T] int32, -1 = pad
            ok = (ids >= 0) & (ids < self.vocab_size)
            safe = jnp.where(ok, ids, 0)
            keep = ok & ~(skip_special & self.special[safe])
            tok_len = jnp.where(keep, self.lens[safe], 0)  # [B, T]
            tok_bytes = self.mat[safe]  # [B, T, W]
            B, T = ids.shape
            # position of each byte within its token
            byte_pos = jnp.arange(W, dtype=jnp.int32)[None, None, :]
            live = byte_pos < tok_len[:, :, None]  # [B, T, W]
            flat_bytes = tok_bytes.reshape(B, T * W)
            flat_live = live.reshape(B, T * W)
            order = jnp.argsort(~flat_live, axis=-1, stable=True)
            packed = jnp.take_along_axis(flat_bytes, order, axis=-1)
            total = jnp.sum(tok_len, axis=-1)
            return packed, total

        return jax.jit(fn, static_argnames=("skip_special",))

    def decode_batch(self, batch: list[list[int]], skip_special: bool = False):
        if not batch:
            return []
        T = max((len(x) for x in batch), default=1) or 1
        B = len(batch)
        ids = np.full((B, T), -1, dtype=np.int32)
        for i, row in enumerate(batch):
            if row:
                ids[i, : len(row)] = np.asarray(row, dtype=np.int32)
        packed, total = self._decode_fn(ids, skip_special)
        packed = np.asarray(packed)
        total = np.asarray(total)
        out = []
        for i in range(B):
            out.append(packed[i, : total[i]].tobytes().decode("utf-8", "replace"))
        return out
