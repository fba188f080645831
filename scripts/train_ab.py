#!/usr/bin/env python
"""Host-trainer timing A/B with interleaved noise calibration.

VERDICT r4 item 3: the driver-captured 32K-vocab train time doubled from
r3 (9.6 s) to r4 (19.9 s).  Round 4's only host-trainer change was the
save-time warm-cache export (commit e71db78) — the merge loop itself was
untouched — so the hypothesis is neighbor noise on the 2-vCPU VM.  This
harness settles it with data: it runs the exact bench 32K training
workload N times in ONE process, sampling the bench's fixed-cost
calibration workload immediately before and after every rep, and prints
raw seconds alongside noise-normalized seconds (raw * ref/calib).  If
normalized times are stable across reps while raw times swing, the
driver number was environmental; a real regression shows up as a stable
normalized slowdown.

Usage: python scripts/train_ab.py [n_reps]
"""

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CALIB_SORT_REF_S, _calib_sort_s, bench_texts  # noqa: E402


def main(n_reps: int = 3) -> None:
    from complexity_tokenizer_tpu.trainers.inl_trainer import (
        InlBpeTrainer,
        TrainerConfig,
    )

    texts = bench_texts()
    rows = []
    for rep in range(n_reps):
        c0 = _calib_sort_s()
        t0 = time.perf_counter()
        tr = InlBpeTrainer(
            TrainerConfig(vocab_size=32_000, min_frequency=1)
        )
        with contextlib.redirect_stdout(io.StringIO()):
            tr.train_from_texts(texts)
        raw = time.perf_counter() - t0
        c1 = _calib_sort_s()
        calib = min(c0, c1)
        rows.append(
            {
                "rep": rep,
                "raw_s": round(raw, 3),
                "merges": len(tr.merges),
                "merges_per_s": round(len(tr.merges) / raw, 1),
                "calib_ms": round(calib * 1e3, 2),
                "noise_index": round(calib / CALIB_SORT_REF_S, 2),
                "normalized_s": round(raw * CALIB_SORT_REF_S / calib, 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    norm = [r["normalized_s"] for r in rows]
    print(
        json.dumps(
            {
                "summary": "train_32k A/B",
                "normalized_min_s": min(norm),
                "normalized_max_s": max(norm),
                "raw_min_s": min(r["raw_s"] for r in rows),
                "raw_max_s": max(r["raw_s"] for r in rows),
            }
        )
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
