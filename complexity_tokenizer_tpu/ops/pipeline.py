"""End-to-end device encode pipeline.

Batch encode = host normalize + UTF-8 pack -> [B, L] uint8 tensors (bucketed
widths) -> jitted device pass (pre-split, byte->token seed, merge loop) ->
host unpack to ragged id lists.  This replaces the reference's rayon
par_iter over per-text scalar encodes (huggingface/mod.rs:694-696) with
data-parallel tensor ops; on multi-chip meshes the batch axis shards over
devices (see parallel/encode.py).

Eligibility: BPE model + ByteLevel pre-tokenizer + well-formed merge table
(checked at build).  Normalizers run on the host (CPython's C-level
unicodedata), added-token-bearing texts are routed to the host tier by the
Tokenizer.
"""

from __future__ import annotations

import functools

import numpy as np

from ..core import pretokenizers as PT

__all__ = ["EncodePipeline", "build_encode_pipeline", "pack_texts"]

# few, coarse buckets: every (B, L) combination is a separate XLA
# compilation (~1 min over the axon remote-compile tunnel), so shape
# diversity is deliberately small; padding waste is cheap by comparison
_LENGTH_BUCKETS = (128, 512, 2048, 4096)
_BATCH_BUCKETS = (16, 256, 2048, 8192)


def _bucket(n: int, buckets) -> int | None:
    for b in buckets:
        if n <= b:
            return b
    return None


def pack_texts(data: list[bytes], L: int, B: int):
    """Pack UTF-8 byte strings into a zero-padded [B, L] uint8 matrix.

    Uses the native C packer when available (one memcpy per row)."""
    try:
        from ..native import native_pack

        packed = native_pack(data, L, B)
        if packed is not None:
            return packed
    except Exception:
        pass
    arr = np.zeros((B, L), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    joined = b"".join(data)
    flat = np.frombuffer(joined, dtype=np.uint8)
    off = 0
    for i, d in enumerate(data):
        n = len(d)
        arr[i, :n] = flat[off : off + n]
        lens[i] = n
        off += n
    return arr, lens


class EncodePipeline:
    """Holds device tables + compiled per-shape encode functions."""

    def __init__(
        self, tables, normalizer, add_prefix_space: bool, host_bpe=None, sharding=None
    ):
        import jax.numpy as jnp

        self._host_bpe = host_bpe
        self.normalizer = normalizer
        self.add_prefix_space = add_prefix_space
        self.tables = tables
        self.byte_token_table = jnp.asarray(tables.byte_token_table)
        self.disp = jnp.asarray(tables.chd.disp)
        self.rows = jnp.asarray(tables.chd.rows)
        self.table_size = tables.chd.size
        self.n_buckets = tables.chd.n_buckets
        # two-choice cuckoo fast path (round 4); None -> CHD fallback
        if tables.qc is not None:
            self.qc_t1 = jnp.asarray(tables.qc.t1)
            self.qc_t2 = jnp.asarray(tables.qc.t2)
            self.qc_size = tables.qc.size
        else:
            self.qc_t1 = self.qc_t2 = None
            self.qc_size = None
        self.sharding = sharding  # optional jax.sharding.NamedSharding for batch
        self.n_devices = 1

    def merge_fixpoint(self, tokens, wid):
        """The segmented merge fixpoint over this pipeline's pair table
        (two-choice cuckoo when eligible, CHD otherwise) — the one entry
        point every device encode body shares."""
        from .merge import merge_words, merge_words_qc

        if self.qc_t1 is not None:
            return merge_words_qc(
                tokens, wid, self.qc_t1, self.qc_t2, self.qc_size
            )
        return merge_words(
            tokens, wid, self.disp, self.rows, self.table_size, self.n_buckets
        )

    def pair_lookup(self):
        """``(a, b, valid) -> (rank, minted)`` closure over this
        pipeline's pair table (cuckoo when eligible, CHD fallback) —
        for bodies that compose the fixpoint pieces themselves (the
        phased/compacting fill, ops/merge.phased_merge_words)."""
        from .hashtable import chd_lookup_rows_jnp, qc_lookup_jnp

        if self.qc_t1 is not None:
            t1, t2, size = self.qc_t1, self.qc_t2, self.qc_size
            return lambda a, b, v: qc_lookup_jnp(t1, t2, size, a, b, v)
        disp, rows = self.disp, self.rows
        ts, nb = self.table_size, self.n_buckets
        return lambda a, b, v: chd_lookup_rows_jnp(
            disp, rows, ts, nb, a, b, v
        )

    @functools.cached_property
    def _class_table(self):
        from .presplit import class_table_jnp

        return class_table_jnp()

    @functools.cached_property
    def _encode_fn(self):
        import jax

        from ..utils.jax_setup import setup_compilation_cache

        setup_compilation_cache()

        from .merge import seed_tokens
        from .presplit import presplit

        # evaluate the table eagerly — creating it lazily inside the trace
        # would cache a tracer
        class_table = self._class_table

        def fn(byte_arr, lengths):
            start, word_id, valid = presplit(byte_arr, lengths, class_table)
            tokens, wid = seed_tokens(byte_arr, word_id, valid, self.byte_token_table)
            return self.merge_fixpoint(tokens, wid)

        return jax.jit(fn)

    # ------------------------------------------------------------------

    @functools.cached_property
    def _norm_checker(self):
        """Device stability checker for the configured normalizer (None
        when unsupported -> every row host-normalizes, exact as before)."""
        if self.normalizer is None:
            return None
        try:
            from .normalize_device import DeviceNormChecker, plan_for_normalizer

            plan = plan_for_normalizer(self.normalizer)
            return DeviceNormChecker(plan) if plan is not None else None
        except Exception:
            return None

    def _prepare(self, texts: list[str], already_normalized: bool = False) -> list[bytes]:
        norm = self.normalizer if not already_normalized else None
        aps = self.add_prefix_space
        if norm is not None:
            checker = self._norm_checker
            if checker is not None:
                # device stability pass: rows proven to be fixed points of
                # the normalizer skip the host rewrite entirely (SURVEY C3)
                raw = [t.encode("utf-8") for t in texts]
                clean = checker.check_bytes(raw, _LENGTH_BUCKETS, pack_texts)
                out = []
                for t, d, c in zip(texts, raw, clean):
                    if not c:
                        d = norm.normalize(t).encode("utf-8")
                    if aps and d and not d.startswith(b" "):
                        d = b" " + d
                    out.append(d)
                return out
        out = []
        for t in texts:
            if norm is not None:
                t = norm.normalize(t)
            if aps and t and not t.startswith(" "):
                t = " " + t
            out.append(t.encode("utf-8"))
        return out

    def encode_batch(
        self, texts: list[str], already_normalized: bool = False
    ) -> list[list[int]]:
        data = self._prepare(texts, already_normalized)
        n = len(data)
        results: list[list[int] | None] = [None] * n

        # group by length bucket
        groups: dict[int, list[int]] = {}
        host_fallback: list[int] = []
        for i, d in enumerate(data):
            L = _bucket(max(len(d), 1), _LENGTH_BUCKETS)
            if L is None:
                host_fallback.append(i)
            else:
                groups.setdefault(L, []).append(i)

        for L, idxs in groups.items():
            B = _bucket(len(idxs), _BATCH_BUCKETS) or len(idxs)
            for chunk_start in range(0, len(idxs), B):
                chunk = idxs[chunk_start : chunk_start + B]
                Bpad = _bucket(len(chunk), _BATCH_BUCKETS) or len(chunk)
                nd = self.n_devices
                if Bpad % nd:
                    Bpad = ((Bpad + nd - 1) // nd) * nd
                arr, lens = pack_texts([data[i] for i in chunk], L, Bpad)
                if self.sharding is not None:
                    import jax

                    arr = jax.device_put(arr, self.sharding)
                    lens = jax.device_put(lens, self.sharding)
                tokens, counts = self._encode_fn(arr, lens)
                tokens = np.asarray(tokens)
                for row, i in enumerate(chunk):
                    rt = tokens[row]
                    results[i] = rt[rt >= 0].tolist()

        if host_fallback:
            # over-long texts: chunk at word boundaries (merges never cross
            # pre-split boundaries, so concatenation is exact) — done by
            # splitting the byte string at top-level match starts via the
            # host scanner, then device-encoding the pieces as one batch.
            for i in host_fallback:
                results[i] = self._encode_long(data[i])
        return results  # type: ignore[return-value]

    def _encode_long(self, d: bytes) -> list[int]:
        """Over-long text: split at word boundaries into max-bucket pieces.

        Merges never cross pre-split word boundaries, so concatenating the
        pieces' encodings is exact (SURVEY §5.7).  Pieces are device-encoded
        as a sub-batch; a single pathological word longer than the widest
        bucket falls back to the host oracle merge loop.
        """
        from ..core.pretokenizers import gpt2_split_spans

        text = d.decode("utf-8")
        spans = gpt2_split_spans(text)
        max_L = _LENGTH_BUCKETS[-1]
        # pieces: ("dev", text) encoded on device, ("host", word) via oracle
        pieces: list[tuple[str, str]] = []
        cur: list[str] = []
        cur_len = 0

        def flush():
            nonlocal cur, cur_len
            if cur:
                pieces.append(("dev", "".join(cur)))
                cur, cur_len = [], 0

        for a, b in spans:
            w = text[a:b]
            wb = len(w.encode("utf-8"))
            if wb > max_L:
                flush()
                pieces.append(("host", w))
                continue
            if cur_len + wb > max_L:
                flush()
            cur.append(w)
            cur_len += wb
        flush()

        dev_idx = [j for j, (kind, _) in enumerate(pieces) if kind == "dev"]
        piece_results: list[list[int]] = [[] for _ in pieces]
        if dev_idx:
            sub = [pieces[j][1].encode("utf-8") for j in dev_idx]
            groups: dict[int, list[int]] = {}
            for k, pd in enumerate(sub):
                L = _bucket(max(len(pd), 1), _LENGTH_BUCKETS)
                groups.setdefault(L, []).append(k)
            for L, ks in groups.items():
                Bpad = _bucket(len(ks), _BATCH_BUCKETS) or len(ks)
                arr, lens = pack_texts([sub[k] for k in ks], L, Bpad)
                tokens, counts = self._encode_fn(arr, lens)
                tokens = np.asarray(tokens)
                for row, k in enumerate(ks):
                    rt = tokens[row]
                    piece_results[dev_idx[k]] = rt[rt >= 0].tolist()
        for j, (kind, w) in enumerate(pieces):
            if kind == "host":
                piece_results[j] = self._host_word_encode(w)
        out: list[int] = []
        for pr in piece_results:
            out.extend(pr)
        return out

    def _host_word_encode(self, word: str) -> list[int]:
        """Oracle encode of one pre-split word (byte-level alphabet)."""
        from ..utils.bytelevel import encode_bytes

        return self._host_bpe.encode(encode_bytes(word.encode("utf-8")))


def build_encode_pipeline(tokenizer) -> EncodePipeline | None:
    """Pipeline for a Tokenizer, or None when the config is ineligible."""
    pt = tokenizer.pre_tokenizer
    if not isinstance(pt, PT.ByteLevel):
        return None
    if not tokenizer.bpe.vocab:
        return None
    from .tables import build_device_tables

    # the tables derive solely from the immutable merge/vocab state, so a
    # pipeline invalidation (added tokens, config changes, a bench's cold
    # reset) reuses them — the CHD build over a 50K-pair vocab is seconds
    # of background CPU that would otherwise tax every cold start
    tables = getattr(tokenizer.bpe, "_device_tables_cache", None)
    if tables is None:
        tables = build_device_tables(tokenizer.bpe)
        tokenizer.bpe._device_tables_cache = tables
    if not tables.well_formed or tables.chd is None:
        return None
    return EncodePipeline(
        tables, tokenizer.normalizer, pt.add_prefix_space, host_bpe=tokenizer.bpe
    )
