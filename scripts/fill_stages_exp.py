#!/usr/bin/env python
"""Stage breakdown of the device fill body at [1024,128] on chip.

Times jitted variants that stop after successive stages of
DeviceWordEncoder._local_fill_body:

  seed      wid/valid/starts + byte->token gather only
  fixpoint  + merge_words (qc table)
  alive     + alive bits packbits (no compaction)
  sort      + full sort-compaction (production body, fused output)

Each returns a small reduced value (honest D2H sync, negligible
transfer).  Differences between successive rows = stage costs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from complexity_tokenizer_tpu.utils.jax_setup import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp


def main():
    from bench import TOKENIZER_JSON, _zipf_lexicon
    from complexity_tokenizer_tpu.tokenizer import Tokenizer

    tok = Tokenizer.from_file(TOKENIZER_JSON)
    wp = tok._get_word_path()
    p = wp.pipeline
    B, W = 1024, 128

    lex = _zipf_lexicon(n=12 * B, seed=555)
    words = [(" " + w).encode() for w in lex]
    lens = np.array([len(w) for w in words], np.int32)
    buf = np.frombuffer(b"".join(words), np.uint8)
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    arr, marks, starts, n_fit, rows_used = wp._pack_seg(
        buf, offs, 0, len(lens), B
    )
    bits = np.packbits(marks == 1, axis=1, bitorder="little")
    row_len = (marks > 0).sum(axis=1).astype(np.int32)
    print(f"packed {n_fit} words into {rows_used} rows", file=sys.stderr)

    byte_token_table = p.byte_token_table

    def common(bytes_bw, start_bits, row_len):
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        valid = pos < row_len[:, None]
        bit = jnp.repeat(start_bits, 8, axis=1)
        starts = ((bit >> (pos % 8).astype(jnp.uint8)) & 1).astype(jnp.int32)
        starts = jnp.where(valid, starts, 0)
        wid = jnp.cumsum(starts.reshape(-1)).reshape(B, W) - 1
        wid = jnp.where(valid, wid, -1)
        tokens = byte_token_table[bytes_bw.astype(jnp.int32)]
        tokens = jnp.where(valid, tokens, -1)
        return tokens, wid

    def f_seed(a, s, r):
        tokens, wid = common(a, s, r)
        return jnp.sum(tokens) + jnp.sum(wid)

    def f_fix(a, s, r):
        tokens, wid = common(a, s, r)
        merged, counts = p.merge_fixpoint(tokens, wid)
        return jnp.sum(merged) + jnp.sum(counts)

    def f_alive(a, s, r):
        tokens, wid = common(a, s, r)
        merged, _ = p.merge_fixpoint(tokens, wid)
        alive = merged >= 0
        ab = jnp.packbits(alive, axis=1, bitorder="little")
        return jnp.sum(ab.astype(jnp.int32))

    def f_sort(a, s, r):
        tokens, wid = common(a, s, r)
        merged, _ = p.merge_fixpoint(tokens, wid)
        alive = merged >= 0
        aflat = alive.reshape(-1)
        cum = jnp.cumsum(aflat.astype(jnp.int32))
        cap = B * W * 3 // 8
        keys = jnp.where(aflat, cum - 1, jnp.int32(B * W))
        vals = merged.reshape(-1).astype(jnp.uint16)
        _sk, sv = jax.lax.sort_key_val(keys, vals)
        return jnp.sum(sv[:cap].astype(jnp.int32))

    for name, f in (("seed", f_seed), ("fixpoint", f_fix),
                    ("alive", f_alive), ("sort", f_sort)):
        jf = jax.jit(f)
        out = jf(arr, bits, row_len)
        np.asarray(out)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jf(arr, bits, row_len))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:9s} {best * 1e3:7.2f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
