"""ctypes bindings for the native host runtime (ctok_host.cpp).

Compiled on first use with the system C++ toolchain; everything degrades
gracefully to the pure-Python oracle when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

__all__ = ["load_library", "NativeEncoder", "NativeDecoder", "native_pack", "match_any", "available"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ctok_host.cpp")
_LIB_PATH = os.path.join(_HERE, f"_libctok_py{sys.version_info[0]}{sys.version_info[1]}.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _python_include() -> str | None:
    import sysconfig

    inc = sysconfig.get_paths().get("include")
    if inc and os.path.exists(os.path.join(inc, "Python.h")):
        return inc
    return None


def _build() -> bool:
    # -march=native unlocks SIMD memcmp/memmem and wider byte loops; fall
    # back to baseline -O3 where it is unsupported (build is per-machine,
    # on first use, so there is no distribution concern).  When Python.h
    # is available the same .so additionally exports a CPython extension
    # module (_ctok_ext) with the fused batch-prep entry point; Python
    # symbols stay undefined and resolve against the running interpreter,
    # so a plain build is retried if that load fails.
    flag_sets = []
    inc = _python_include()
    if inc:
        flag_sets.append(
            ["-O3", "-march=native", "-funroll-loops",
             "-DCTOK_WITH_PYTHON", f"-I{inc}"]
        )
        flag_sets.append(["-O3", "-DCTOK_WITH_PYTHON", f"-I{inc}"])
    flag_sets.append(["-O3", "-march=native", "-funroll-loops"])
    flag_sets.append(["-O3"])
    for cxx in ("g++", "c++", "clang++"):
        for flags in flag_sets:
            try:
                subprocess.run(
                    [cxx, *flags, "-shared", "-fPIC", "-std=c++17", _SRC,
                     "-o", _LIB_PATH],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (OSError, subprocess.SubprocessError):
                continue
            try:
                ctypes.CDLL(_LIB_PATH)
                return True
            except OSError:
                continue
    return False


def load_library():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.ctok_new.restype = ctypes.c_void_p
        lib.ctok_new.argtypes = [
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.ctok_free.argtypes = [ctypes.c_void_p]
        lib.ctok_encode.restype = ctypes.c_int64
        lib.ctok_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.ctok_encode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.ctok_compact.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.ctok_match_any.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.ctok_encode_batch_gated.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.ctok_collect_miss_words.restype = ctypes.c_int64
        lib.ctok_collect_miss_words.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
        ]
        lib.ctok_cache_insert_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.ctok_warm_start.restype = ctypes.c_int64
        lib.ctok_warm_start.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.ctok_decoder_new.restype = ctypes.c_void_p
        lib.ctok_decoder_new.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.ctok_decoder_free.argtypes = [ctypes.c_void_p]
        lib.ctok_decode_batch.restype = ctypes.c_int64
        lib.ctok_decode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.ctok_pack.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.ctok_pack_seg.restype = ctypes.c_int64
        lib.ctok_pack_seg.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


_ext = None
_ext_tried = False


def load_ext():
    """The CPython extension view of the native library (fused batch
    entry points), or None when unavailable."""
    global _ext, _ext_tried
    with _lock:
        if _ext is not None or _ext_tried:
            return _ext
        _ext_tried = True
    if load_library() is None:
        return None
    try:
        import importlib.util
        from importlib.machinery import ExtensionFileLoader

        loader = ExtensionFileLoader("_ctok_ext", _LIB_PATH)
        spec = importlib.util.spec_from_file_location(
            "_ctok_ext", _LIB_PATH, loader=loader
        )
        mod = importlib.util.module_from_spec(spec)
        loader.exec_module(mod)
        ext = mod if hasattr(mod, "encode_ragged") else None
    except Exception:
        ext = None
    with _lock:
        _ext = ext
    return ext


def available() -> bool:
    return load_library() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class NativeEncoder:
    """Native byte-level BPE encoder (presplit + seed + merge loop).

    Semantically identical to the host oracle path for ByteLevel configs;
    used for low-latency single-text encodes where device dispatch is not
    worth it.
    """

    def __init__(self, merge_ranks, merge_ops, byte_token_table: np.ndarray,
                 packed=None):
        from ..utils.unicode_tables import gpt2_class_table

        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        if packed is not None:
            # prebuilt (pa, pb, pr, rank_new) — see
            # core.bpe.BpeTokenizer.packed_merge_arrays
            pa, pb, pr, rank_new = packed
            n = len(pa)
        else:
            n = len(merge_ranks)
            pa = np.empty(n, np.int32)
            pb = np.empty(n, np.int32)
            pr = np.empty(n, np.int32)
            for i, ((a, b), r) in enumerate(merge_ranks.items()):
                pa[i], pb[i], pr[i] = a, b, r
            max_rank = max(merge_ops) if merge_ops else 0
            rank_new = np.full(max_rank + 1, -1, np.int32)
            for r, (_pair, new_id) in merge_ops.items():
                rank_new[r] = new_id
        # keep referenced arrays alive for the ctx lifetime
        self._keep = (
            pa,
            pb,
            pr,
            rank_new,
            np.ascontiguousarray(byte_token_table, np.int32),
            np.ascontiguousarray(gpt2_class_table()),
        )
        cls = self._keep[5]
        self._ctx = lib.ctok_new(
            n,
            _ptr(pa),
            _ptr(pb),
            _ptr(pr),
            _ptr(rank_new),
            len(rank_new),
            _ptr(self._keep[4]),
            _ptr(cls),
            len(cls),
        )

    def __del__(self):
        try:
            if getattr(self, "_ctx", None):
                self._lib.ctok_free(self._ctx)
        except Exception:
            pass

    def encode_one_fused(self, text: str, add_prefix_space: bool,
                         patterns: list[bytes] | None):
        """Single-text encode in one C call (UTF-8 view, prefix space,
        added-token gate, encode, list build).  Returns None when an
        added-token pattern matches or the extension is unavailable —
        distinguish with ``ext_available``."""
        ext = load_ext()
        if ext is None or not hasattr(ext, "encode_one"):
            raise RuntimeError("extension surface unavailable")
        return ext.encode_one(
            self._ctx, text, int(bool(add_prefix_space)),
            patterns if patterns is not None else None,
        )

    def encode(self, data: bytes) -> list[int]:
        n = len(data)
        if n == 0:
            return []
        buf = np.frombuffer(data, np.uint8)
        out = np.empty(n, np.int32)
        m = self._lib.ctok_encode(self._ctx, _ptr(buf), n, _ptr(out))
        return out[:m].tolist()

    def _encode_batch_raw(
        self,
        data: list[bytes],
        n_threads: int | None,
        gate_patterns: list[bytes] | None = None,
    ):
        """Returns (out, offsets, counts).  With ``gate_patterns``, texts
        containing any pattern are skipped with count = -1 (fused
        added-token gate, one pass over the corpus)."""
        n = len(data)
        if n_threads is None:
            n_threads = os.cpu_count() or 1
        joined = b"".join(data)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum([len(d) for d in data], out=offsets[1:])
        total = int(offsets[-1])
        out = np.empty(max(total, 1), np.int32)
        counts = np.zeros(n, np.int32)
        jb = np.frombuffer(joined, np.uint8) if joined else np.zeros(1, np.uint8)
        if gate_patterns:
            pat_buf = b"".join(gate_patterns)
            pat_offsets = np.zeros(len(gate_patterns) + 1, np.int64)
            np.cumsum([len(p) for p in gate_patterns], out=pat_offsets[1:])
            pb = np.frombuffer(pat_buf, np.uint8)
            self._lib.ctok_encode_batch_gated(
                self._ctx, _ptr(jb), _ptr(offsets), n, _ptr(pb),
                _ptr(pat_offsets), len(gate_patterns), _ptr(out),
                _ptr(counts), int(n_threads),
            )
        else:
            self._lib.ctok_encode_batch(
                self._ctx, _ptr(jb), _ptr(offsets), n, _ptr(out), _ptr(counts),
                int(n_threads),
            )
        return out, offsets, counts

    def collect_miss_words(
        self, data: list[bytes], max_wlen: int = 32,
        cap_words: int = 1 << 20, cap_bytes: int = 1 << 24,
        n_threads: int | None = None,
    ):
        """Distinct pre-split words in the corpus that the SHARED caches
        do not know yet (<= max_wlen bytes): (words_buf uint8, lens
        int32[n]) — the candidates for a device batch encode +
        cache_insert.  Probes only the shared tables (its own native
        mutex), so it may run on a background thread concurrently with
        host encodes; ``n_threads=1`` keeps it off the worker pool."""
        n = len(data)
        if n == 0:
            return np.zeros(0, np.uint8), np.zeros(0, np.int32)
        joined = b"".join(data)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum([len(d) for d in data], out=offsets[1:])
        jb = np.frombuffer(joined, np.uint8) if joined else np.zeros(1, np.uint8)
        cap_bytes = min(cap_bytes, len(joined) + 1)
        cap_words = min(cap_words, (len(joined) // 1) + 1)
        words = np.empty(cap_bytes, np.uint8)
        lens = np.empty(cap_words, np.int32)
        n_words = self._lib.ctok_collect_miss_words(
            self._ctx, _ptr(jb), _ptr(offsets), n, int(max_wlen),
            _ptr(words), _ptr(lens), cap_words, cap_bytes,
            int(n_threads or 0),
        )
        lens = lens[:n_words]
        return words[: int(lens.sum())] if n_words else np.zeros(0, np.uint8), lens

    def warm_start(self, words_buf: np.ndarray, word_lens,
                   n_threads: int | None = None):
        """Pre-merge distinct words through the native merge loop and
        insert them into the shared caches (the vocabulary warm-start,
        ctok_warm_start).  Returns (ids_flat int32, counts int64[n]) in
        input order — the caller may persist these and bulk-reload them
        later with :meth:`cache_insert_flat` instead of re-merging."""
        import os as _os

        n = len(word_lens)
        if n == 0:
            return np.zeros(0, np.int32), np.zeros(0, np.int64)
        lens = np.ascontiguousarray(word_lens, np.int64)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        wb = np.ascontiguousarray(words_buf, np.uint8)
        if not wb.size:
            wb = np.zeros(1, np.uint8)
        ids_tmp = np.empty(max(int(offsets[-1]), 1), np.int32)
        counts32 = np.zeros(n, np.int32)
        self._lib.ctok_warm_start(
            self._ctx, _ptr(wb), _ptr(offsets), n, _ptr(ids_tmp),
            _ptr(counts32),
            int(n_threads if n_threads is not None
                else min(_os.cpu_count() or 1, 16)),
        )
        counts = counts32.astype(np.int64)
        # compact ids from byte offsets to a flat ragged buffer
        out_offs = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=out_offs[1:])
        tot = int(out_offs[-1])
        idx = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(out_offs[:-1], counts)
            + np.repeat(offsets[:-1], counts)
        )
        return ids_tmp[idx], counts

    def cache_insert(self, words_buf: np.ndarray, word_lens: np.ndarray,
                     ids_rows: list[list[int]]):
        """Insert precomputed word encodes into the shared caches (not
        concurrency-safe with encode calls)."""
        n = len(word_lens)
        if n == 0:
            return
        ids_counts = np.fromiter(
            (len(r) for r in ids_rows), np.int64, count=n
        )
        total = int(ids_counts.sum())
        ids_buf = np.fromiter(
            (i for r in ids_rows for i in r), np.int32, count=total
        ) if total else np.zeros(1, np.int32)
        self.cache_insert_flat(words_buf, word_lens, ids_buf, ids_counts)

    def cache_insert_flat(self, words_buf: np.ndarray, word_lens,
                          ids_flat: np.ndarray, ids_counts):
        """cache_insert from flat device output: ids for word w are
        ``ids_flat[cumsum(ids_counts)[w-1]:...[w]]`` — no Python-list
        materialization (not concurrency-safe with encode calls)."""
        n = len(word_lens)
        if n == 0:
            return
        word_offsets = np.zeros(n + 1, np.int64)
        np.cumsum(word_lens, out=word_offsets[1:])
        ids_offsets = np.zeros(n + 1, np.int64)
        np.cumsum(ids_counts, out=ids_offsets[1:])
        ids_buf = np.ascontiguousarray(ids_flat, np.int32)
        if ids_buf.size == 0:
            ids_buf = np.zeros(1, np.int32)
        wb = np.ascontiguousarray(words_buf, np.uint8)
        self._lib.ctok_cache_insert_batch(
            self._ctx, _ptr(wb), _ptr(word_offsets), n, _ptr(ids_buf),
            _ptr(ids_offsets),
        )

    def compact(self, out: np.ndarray, offsets: np.ndarray, counts: np.ndarray):
        """Per-text id regions at byte offsets -> (flat int32, row_offsets
        int64).  All counts must be >= 0."""
        n = len(counts)
        total_ids = int(counts.sum())
        flat = np.empty(max(total_ids, 1), np.int32)
        row_offsets = np.zeros(n + 1, np.int64)
        self._lib.ctok_compact(
            _ptr(out), _ptr(offsets), _ptr(counts), n, _ptr(flat), _ptr(row_offsets)
        )
        return flat[:total_ids], row_offsets

    def encode_batch(self, data: list[bytes], n_threads: int | None = None):
        """Batch encode with per-thread word caches; returns list of lists."""
        if not data:
            return []
        out, offsets, counts = self._encode_batch_raw(data, n_threads)
        results = []
        for i in range(len(data)):
            a = int(offsets[i])
            results.append(out[a : a + int(counts[i])].tolist())
        return results

    def encode_ragged_fused(
        self,
        texts: list[str],
        add_prefix_space: bool,
        patterns: list[bytes] | None,
        n_threads: int | None = None,
        ascii_norm: bool = False,
    ):
        """Fully-fused batch encode from Python strings: UTF-8 access via
        the unicode objects' cached in-place buffers (zero-copy spans, no
        corpus join), prefix space, added-token gate, encode and ragged
        compaction all in one native call.  Returns (flat int32,
        row_offsets int64, flagged_indices or None, nonascii_indices or
        None) — flagged/nonascii rows are empty in the output and must be
        re-encoded and spliced by the caller (``ascii_norm=True`` marks
        non-ASCII rows instead of encoding them, for callers whose
        normalizer is the identity on ASCII).  None when the extension
        surface is unavailable."""
        ext = load_ext()
        if ext is None:
            return None
        if n_threads is None:
            n_threads = os.cpu_count() or 1
        flat_b, off_b, flagged, nonascii = ext.encode_ragged(
            self._ctx, texts, int(bool(add_prefix_space)), patterns or [],
            int(n_threads), int(bool(ascii_norm)),
        )
        flat = np.frombuffer(flat_b, np.int32)
        offs = np.frombuffer(off_b, np.int64)
        return flat, offs, flagged, nonascii

    def encode_rows_fused(
        self,
        texts: list[str],
        add_prefix_space: bool,
        patterns: list[bytes] | None,
        n_threads: int | None = None,
        ascii_norm: bool = False,
    ):
        """list[list[int]] built in C (None rows = added-token candidates
        and, under ``ascii_norm``, non-ASCII rows — both for the caller's
        exact single-text path).  None when the extension surface is
        unavailable."""
        ext = load_ext()
        if ext is None or not hasattr(ext, "encode_rows"):
            return None
        if n_threads is None:
            n_threads = os.cpu_count() or 1
        return ext.encode_rows(
            self._ctx, texts, int(bool(add_prefix_space)), patterns or [],
            int(n_threads), int(bool(ascii_norm)),
        )

    def encode_batch_ragged(self, data: list[bytes], n_threads: int | None = None):
        """(flat_ids int32 [total], row_offsets int64 [n+1]) — zero-copy
        ragged output, the framework-native form for feeding device code."""
        n = len(data)
        if n == 0:
            return np.zeros(0, np.int32), np.zeros(1, np.int64)
        out, offsets, counts = self._encode_batch_raw(data, n_threads)
        return self.compact(out, offsets, counts)


class NativeDecoder:
    """Native ByteLevel batch decoder: id->raw-bytes arena concat, strict
    UTF-8 gate, the reference's cleanup table, unicode-whitespace
    split-join (decoders.rs:94-119, mod.rs:749-769).  Rows with invalid
    UTF-8 are flagged back to the exact Python path."""

    def __init__(self, id_bytes: list[bytes], special_mask: np.ndarray):
        from ..utils.unicode_tables import gpt2_class_table

        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        n = len(id_bytes)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum([len(b) for b in id_bytes], out=offsets[1:])
        arena = np.frombuffer(b"".join(id_bytes) or b"\0", np.uint8)
        cls = np.ascontiguousarray(gpt2_class_table())
        self._keep = (cls,)
        sm = np.ascontiguousarray(special_mask, np.uint8)
        self._ctx = lib.ctok_decoder_new(
            _ptr(arena), _ptr(offsets), n, _ptr(sm), _ptr(cls), len(cls)
        )

    def __del__(self):
        try:
            if getattr(self, "_ctx", None):
                self._lib.ctok_decoder_free(self._ctx)
        except Exception:
            pass

    def decode_batch(
        self, batch, skip_special_tokens: bool, cleanup: bool
    ):
        """(texts: list[str|None], flagged: list[int]) — flagged rows are
        None (invalid UTF-8; caller uses the lossy Python path)."""
        from itertools import chain

        n = len(batch)
        row_offsets = np.zeros(n + 1, np.int64)
        np.cumsum([len(r) for r in batch], out=row_offsets[1:])
        total_ids = int(row_offsets[-1])
        ids_flat = np.fromiter(
            chain.from_iterable(batch), np.int32, count=total_ids
        ) if total_ids else np.zeros(1, np.int32)
        return self.decode_ragged(
            ids_flat, row_offsets, skip_special_tokens, cleanup
        )

    def decode_ragged(
        self,
        ids_flat: np.ndarray,
        row_offsets: np.ndarray,
        skip_special_tokens: bool,
        cleanup: bool,
    ):
        """Ragged-input decode (the zero-copy mirror of
        encode_batch_ragged): ids_flat int32 + row_offsets int64."""
        n = len(row_offsets) - 1
        total_ids = int(row_offsets[-1])
        ids_flat = np.ascontiguousarray(ids_flat, np.int32)
        row_offsets = np.ascontiguousarray(row_offsets, np.int64)
        if ids_flat.size == 0:
            ids_flat = np.zeros(1, np.int32)
        ext = load_ext()
        if ext is not None and hasattr(ext, "decode_ragged"):
            texts, flagged = ext.decode_ragged(
                self._ctx, ids_flat, row_offsets,
                int(skip_special_tokens), int(cleanup),
            )
            return texts, (list(flagged) if flagged is not None else [])
        cap = max(total_ids * 16 + 64, 1024)
        while True:
            out = np.empty(cap, np.uint8)
            out_offsets = np.zeros(n + 1, np.int64)
            flags = np.zeros(max(n, 1), np.uint8)
            written = self._lib.ctok_decode_batch(
                self._ctx, _ptr(ids_flat), _ptr(row_offsets), n,
                int(skip_special_tokens), int(cleanup), _ptr(out),
                _ptr(out_offsets), _ptr(flags), cap,
            )
            if written >= 0:
                break
            cap *= 4
        texts: list[str | None] = [None] * n
        flagged: list[int] = []
        buf = out[:written].tobytes()
        for i in range(n):
            if flags[i]:
                flagged.append(i)
            else:
                texts[i] = buf[out_offsets[i] : out_offsets[i + 1]].decode("utf-8")
        return texts, flagged


_scan_ctx = None
_scan_keep = None


def scanner_ctx():
    """A minimal native context usable for pure scanning (no vocab):
    word boundaries / word counting for trainers."""
    global _scan_ctx, _scan_keep
    lib = load_library()
    if lib is None:
        return None
    if _scan_ctx is None:
        from ..utils.unicode_tables import gpt2_class_table

        cls = np.ascontiguousarray(gpt2_class_table())
        empty = np.zeros(1, np.int32)
        bt = np.full(256, -1, np.int32)
        _scan_keep = (cls, empty, bt)
        _scan_ctx = lib.ctok_new(
            0, _ptr(empty), _ptr(empty), _ptr(empty), _ptr(empty), 0,
            _ptr(bt), _ptr(cls), len(cls),
        )
    return _scan_ctx


def count_words(texts: list[str], min_len: int = 1,
                n_threads: int | None = None) -> dict[bytes, int] | None:
    """Corpus word-frequency count via the native scanner: {raw word
    bytes: count}.  None when the extension surface is unavailable."""
    ext = load_ext()
    if ext is None or not hasattr(ext, "count_words"):
        return None
    ctx = scanner_ctx()
    if ctx is None:
        return None
    if n_threads is None:
        n_threads = os.cpu_count() or 1
    return ext.count_words(ctx, texts, int(min_len), int(n_threads))


def match_any(data: list[bytes], patterns: list[bytes],
              n_threads: int | None = None) -> np.ndarray | None:
    """Per-text flags: True iff any pattern byte-string occurs in the text.

    SIMD multi-pattern substring scan (native); None when the library is
    unavailable."""
    lib = load_library()
    if lib is None:
        return None
    n = len(data)
    flags = np.zeros(max(n, 1), np.uint8)
    if n == 0 or not patterns:
        return flags[:n].astype(bool)
    joined = b"".join(data)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(d) for d in data], out=offsets[1:])
    pat_buf = b"".join(patterns)
    pat_offsets = np.zeros(len(patterns) + 1, np.int64)
    np.cumsum([len(p) for p in patterns], out=pat_offsets[1:])
    jb = np.frombuffer(joined, np.uint8) if joined else np.zeros(1, np.uint8)
    pb = np.frombuffer(pat_buf, np.uint8) if pat_buf else np.zeros(1, np.uint8)
    if n_threads is None:
        n_threads = os.cpu_count() or 1
    lib.ctok_match_any(
        _ptr(jb), _ptr(offsets), n, _ptr(pb), _ptr(pat_offsets),
        len(patterns), _ptr(flags), int(n_threads),
    )
    return flags.astype(bool)


def native_pack(data: list[bytes], L: int, B: int):
    """C-accelerated version of ops.pipeline.pack_texts."""
    lib = load_library()
    if lib is None:
        return None
    joined = b"".join(data)
    offsets = np.zeros(len(data) + 1, np.int64)
    np.cumsum([len(d) for d in data], out=offsets[1:])
    arr = np.empty((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    jb = np.frombuffer(joined, np.uint8) if joined else np.zeros(1, np.uint8)
    lib.ctok_pack(_ptr(jb), _ptr(offsets), len(data), L, _ptr(arr), _ptr(lens))
    if len(data) < B:
        arr[len(data) :] = 0
    return arr, lens
