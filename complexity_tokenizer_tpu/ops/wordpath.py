"""Device word path: the TPU encodes distinct cache-miss words.

The reference re-runs its merge loop for every occurrence of every word
(bpe.rs:82-118 via huggingface/mod.rs:601-605).  This tier splits the work
by its nature instead: the native scanner (memory-bound, SIMD C++) finds
word boundaries and assembles cached results, while the TPU does the
compute-bound part — the BPE merge loop — once per *distinct* word, batched
as a dense ``[n_words, W]`` token matrix (SURVEY §7 "words-flattened
layout").  Results are inserted into the native runtime's shared word
caches, so steady-state serving runs at host assembly speed and every new
word is merged on the accelerator.

Compared to the text-lanes pipeline (ops/pipeline.py), the word layout cuts
both compute and transfer by an order of magnitude: rows are one 128-lane
tile instead of up to 4096, the fixpoint loop runs only as long as the
deepest *word* (not the slowest text), and only distinct words cross the
host<->device link.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["DeviceWordEncoder", "build_word_encoder"]

# [B, W] shapes compile once each.  W = 128 (one full TPU lane tile):
# last dims below 128 lanes hit a pathological Mosaic/XLA compile path on
# this backend (a [n,32] merge never finished compiling; [n,128] compiles
# in ~80s and runs in ~60ms for 1024 words), and 128 bytes covers
# effectively every natural pre-split word — longer matches fall back to
# the native merge loop.
_WORD_W = 128
# extra intermediate buckets keep first-compile cost low on backends where
# the persistent compile cache misses across processes (axon embeds a
# session fingerprint in the key): Mosaic/XLA compile time for the merge
# loop grows with the batch dimension on that backend
_B_BUCKETS = (1024, 2048, 8192, 65536)


class DeviceWordEncoder:
    """Encodes batches by device-merging distinct uncached words."""

    # encode-path fills reuse one stable [fill_cap, W] compiled shape; the
    # remainder of a large novel batch is host-merged (and cached) by the
    # native tier, so capping bounds latency without affecting results
    fill_cap = 1024
    # once warm, skip the miss scan and only sweep periodically — misses
    # between sweeps are handled (and cached) by the native merge loop
    sweep_interval = 32

    def __init__(self, pipeline, native):
        self.pipeline = pipeline
        self.native = native
        # optional jax.sharding.NamedSharding for the word-matrix rows
        # (parallel/encode.shard_word_encoder)
        self.sharding = None
        self._steady = False
        self._batches_since_sweep = 0

    @functools.cached_property
    def _fn(self):
        import jax
        import jax.numpy as jnp

        from ..utils.jax_setup import setup_compilation_cache
        from .merge import merge_word_rows

        setup_compilation_cache()
        p = self.pipeline
        byte_token_table = p.byte_token_table

        from .pallas_kernels import pallas_available, pallas_seed_tokens

        use_pallas = pallas_available()

        def fn(arr, lens):
            if use_pallas:
                # fused VMEM seed kernel (gather + mask + tombstone fill)
                tokens = pallas_seed_tokens(arr, lens, byte_token_table)
            else:
                from .merge import seed_tokens

                W = arr.shape[1]
                pos = jnp.arange(W, dtype=jnp.int32)[None, :]
                valid = pos < lens[:, None]
                tokens, _ = seed_tokens(arr, lens, valid, byte_token_table)
            return merge_word_rows(
                tokens, p.disp, p.rows, p.table_size, p.n_buckets
            )

        return jax.jit(fn)

    def _encode_word_matrix(self, words_buf: np.ndarray, lens: np.ndarray):
        """[n] ragged words -> list of id rows via device merge."""
        n = len(lens)
        offs = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        rows_out: list[list[int]] = []
        max_b = _B_BUCKETS[-1]
        for start in range(0, n, max_b):
            stop = min(start + max_b, n)
            m = stop - start
            B = next(b for b in _B_BUCKETS if b >= m)
            arr, ls = self._pack(words_buf, offs, start, m, B)
            if self.sharding is not None:
                import jax

                arr = jax.device_put(arr, self.sharding)
                ls = jax.device_put(ls, self.sharding)
            tokens, counts = self._fn(arr, ls)
            tokens = np.asarray(tokens)[:m]
            counts = np.asarray(counts)[:m]
            # one vectorized extraction: live ids in row order, split at
            # the per-row counts (a per-row mask+tolist loop is pure
            # Python overhead at 64K-row chunks)
            flat = tokens[tokens >= 0].tolist()
            bounds = np.zeros(m + 1, np.int64)
            np.cumsum(counts, out=bounds[1:])
            rows_out.extend(
                flat[bounds[r] : bounds[r + 1]] for r in range(m)
            )
        return rows_out

    def _pack(self, words_buf, offs, start: int, m: int, B: int):
        arr = np.zeros((B, _WORD_W), np.uint8)
        ls = np.zeros(B, np.int32)
        lib = getattr(self.native, "_lib", None)
        if lib is not None:
            from ..native import _ptr

            wb = np.ascontiguousarray(words_buf, np.uint8)
            chunk_offs = np.ascontiguousarray(offs[start : start + m + 1], np.int64)
            lib.ctok_pack(_ptr(wb if wb.size else np.zeros(1, np.uint8)),
                          _ptr(chunk_offs), m, _WORD_W, _ptr(arr), _ptr(ls))
            # rows >= m stay zero from the np.zeros allocation — ctok_pack
            # only writes rows < m
            return arr, ls
        for r in range(m):
            a = offs[start + r]
            ls[r] = lens_ = int(offs[start + r + 1] - a)
            arr[r, :lens_] = words_buf[a : a + lens_]
        return arr, ls

    def fill_caches(self, data: list[bytes], max_words: int | None = None) -> int:
        """Device-encode the distinct uncached words in the corpus and
        insert them into the native shared caches.  Returns the number of
        words filled.  ``max_words`` caps the device batch (the remainder
        is computed lazily by the native merge loop) — useful on backends
        with expensive first compiles for large batch shapes."""
        words_buf, lens = self.native.collect_miss_words(data, _WORD_W)
        n = len(lens)
        if n == 0:
            return 0
        if max_words is not None and n > max_words:
            n = max_words
            lens = lens[:n]
            words_buf = words_buf[: int(np.sum(lens))]
        ids_rows = self._encode_word_matrix(words_buf, lens)
        self.native.cache_insert(words_buf, lens, ids_rows)
        return n

    def _maybe_fill(self, data: list[bytes]) -> int:
        """Adaptive fill: scan-and-fill until the caches are warm, then
        skip the (serial) miss scan and only sweep every
        ``sweep_interval`` batches.  Skipping never affects results —
        uncached words are merged and cached by the native tier."""
        if self._steady and self._batches_since_sweep < self.sweep_interval:
            self._batches_since_sweep += 1
            return 0
        n = self.fill_caches(data, max_words=self.fill_cap)
        self._batches_since_sweep = 0
        self._steady = n < max(16, self.fill_cap // 64)
        return n

    def encode_batch(self, data: list[bytes]) -> list[list[int]]:
        """Full batch encode: device merges the distinct new words, the
        native runtime assembles per-text ids from the caches."""
        self._maybe_fill(data)
        return self.native.encode_batch(data)

    def encode_batch_ragged(self, data: list[bytes]):
        self._maybe_fill(data)
        return self.native.encode_batch_ragged(data)


def build_word_encoder(tokenizer) -> DeviceWordEncoder | None:
    """Word-path encoder for a Tokenizer, or None when ineligible (needs
    both the device tables and the native runtime)."""
    pipeline = tokenizer._get_pipeline()
    native = tokenizer._get_native_encoder()
    if pipeline is None or native is None:
        return None
    return DeviceWordEncoder(pipeline, native)
