#!/usr/bin/env python
"""On-chip A/B of mid-fixpoint lane compaction (PROFILE r5).

Measures the production 49K-novel-word fill at CTOK_PHASE_N1 in
{0, 4, 6, 8, 10}: a fresh DeviceWordEncoder per setting (the phase
knob is captured at first use), steady state = best-of-4 on fresh
words at identical shapes, exactness sampled against the native host
merge loop.  Result (2026-08-21, v5e via tunnel): phasing is NEUTRAL
at n1 >= 6 and 2.6x WORSE at n1 = 4 (half-row overflow -> every pack
double-dispatched), so the per-iteration gather wall is per-op
overhead, insensitive to lane count — phasing ships disabled.

Usage: python scripts/phase_ab.py   (requires the chip; ~5-10 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import _time_best, _zipf_lexicon, build_tokenizer  # noqa: E402


def novel(n_words: int, seed: int):
    lex = _zipf_lexicon(n=n_words, seed=seed)
    words = [(" " + w).encode() for w in lex]
    lens = np.array([len(w) for w in words], np.int32)
    return np.frombuffer(b"".join(words), np.uint8), lens


def main() -> None:
    from complexity_tokenizer_tpu.ops.wordpath import build_word_encoder

    tok = build_tokenizer()
    import jax

    print("backend:", jax.default_backend(), flush=True)
    n_words = 49152
    seeds = iter(range(1000, 1100))
    for n1 in (0, 4, 6, 8, 10):
        os.environ["CTOK_PHASE_N1"] = str(n1)
        wp = build_word_encoder(tok)
        b1, l1 = novel(n_words, next(seeds))
        t0 = time.perf_counter()
        ids, counts = wp._encode_words_packed(b1, l1)
        first = time.perf_counter() - t0
        b2, l2 = novel(n_words, next(seeds))
        best = _time_best(lambda: wp._encode_words_packed(b2, l2), n=4)
        offs = np.zeros(n_words + 1, np.int64)
        np.cumsum(l1, out=offs[1:])
        bounds = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(np.where(counts < 0, 0, counts), out=bounds[1:])
        ok = all(
            wp.native.encode(b1[offs[w] : offs[w + 1]].tobytes())
            == ids[bounds[w] : bounds[w + 1]].tolist()
            for w in range(0, n_words, 977)
            if counts[w] >= 0
        )
        print(
            f"n1={n1}: first={first:.2f}s steady={best * 1e3:.1f}ms "
            f"words/s={n_words / best:,.0f} "
            f"covered={int((counts >= 0).sum())} exact={ok}",
            flush=True,
        )


if __name__ == "__main__":
    main()
