#!/usr/bin/env python
"""Front-cache hit/miss attribution for the steady-state encode path
(PROFILE r5 "Front-cache miss attribution").

Rebuilds the native runtime with -DCTOK_COUNTERS (hot-loop counters +
the ctok_debug_counters accessor), measures a steady-state pass over
the bench corpus, reports per-pass front_hit / front_miss / keyed and
the simulated attribution of misses (collision losers vs multi-token
words), then DELETES the instrumented .so so the next import rebuilds
the production library.

Usage: python scripts/front_attrib.py
"""

import ctypes
import os
import subprocess
import sys
import sysconfig
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

NATIVE = os.path.join(ROOT, "complexity_tokenizer_tpu", "native")
SO = os.path.join(
    NATIVE, f"_libctok_py{sys.version_info[0]}{sys.version_info[1]}.so"
)


def build_counters_so() -> None:
    subprocess.run(
        [
            "g++", "-O3", "-march=native", "-funroll-loops",
            "-DCTOK_WITH_PYTHON", "-DCTOK_COUNTERS",
            f"-I{sysconfig.get_paths()['include']}",
            "-shared", "-fPIC", "-std=c++17",
            os.path.join(NATIVE, "ctok_host.cpp"), "-o", SO,
        ],
        check=True,
    )


def main() -> None:
    build_counters_so()
    try:
        os.environ["CTOK_AUTO_DEVICE"] = "0"
        from bench import _time_best, bench_texts, build_tokenizer

        tok = build_tokenizer()
        texts = bench_texts()
        total = sum(len(t.encode()) for t in texts)
        tok.encode_batch_ragged(texts)
        tok.encode_batch_ragged(texts)
        lib = ctypes.CDLL(SO)
        buf = (ctypes.c_int64 * 3)()

        def read():
            lib.ctok_debug_counters(buf)
            return list(buf)

        n = 15
        c0 = read()
        s = _time_best(lambda: tok.encode_batch_ragged(texts), n=n)
        c1 = read()
        dh, dm, dk = [(a - b) // n for a, b in zip(c1, c0)]
        print(f"steady {s * 1e3:.2f} ms ({total / s / 1e6:.0f} MB/s, "
              f"counters build)")
        print(f"per pass: front_hit={dh:,} front_miss={dm:,} "
              f"keyed(9-16B)={dk:,}  "
              f"hit rate {dh / max(dh + dm, 1) * 100:.2f}%")

        # attribution: token counts + direct-map collision simulation
        freq: Counter = Counter()
        for t in texts:
            parts = t.split(" ")
            for i, w in enumerate(parts):
                if w:
                    freq[(" " if i > 0 else "") + w] += 1
        short = {w: f for w, f in freq.items() if len(w.encode()) <= 8}
        ntok = {w: len(tok._encode_host(w)) for w in short}
        multi3 = sum(f for w, f in short.items() if ntok[w] > 2)
        print(f"distinct <=8B words: {len(short):,}; "
              f"3+-token occurrences (front-unrepresentable): {multi3:,}")
    finally:
        try:
            os.unlink(SO)  # next import rebuilds the production library
        except OSError:
            pass


if __name__ == "__main__":
    main()
