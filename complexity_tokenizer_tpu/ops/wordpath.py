"""Device word path: the TPU encodes distinct cache-miss words.

The reference re-runs its merge loop for every occurrence of every word
(bpe.rs:82-118 via huggingface/mod.rs:601-605).  This tier splits the work
by its nature instead: the native scanner (memory-bound, SIMD C++) finds
word boundaries and assembles cached results, while the TPU does the
compute-bound part — the BPE merge loop — once per *distinct* word.

Layout (v2, segment-packed): distinct words are laid back to back into
dense ``[B, 128]`` byte rows (a word never spans rows) with per-position
segment marks; the device derives word ids from the marks and runs the
``merge_words`` segmented fixpoint kernel (ops/merge.py).  Compared to the
v1 one-word-per-row layout this keeps the matrix ~95% occupied instead of
~6%, cutting host<->device transfer AND on-device scan work by an order of
magnitude per word — the dominant costs at this batch scale.

Integration modes:

- explicit (``backend="device"`` / ``fill_caches``): synchronous fill,
  used by tests and the bench's honest on-chip measurement.
- auto (``maybe_fill_async``): non-blocking — the caller's thread only
  scans for misses (a fast native pass) and harvests finished device
  results into the shared caches; the JAX dispatch + readback runs on a
  single background thread.  Every batch stays exact regardless of fill
  timing because the native tier merges whatever is not yet cached.  All
  native shared-cache access stays on the calling thread (the C caches
  are not concurrency-safe by design — SURVEY §5.2's "safety by
  construction" applies here as thread ownership, not locks).
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["DeviceWordEncoder", "build_word_encoder"]

# W = 128 (one full TPU lane tile): last dims below 128 lanes hit a
# pathological Mosaic/XLA compile path on this backend, and 128 bytes
# covers effectively every natural pre-split word — longer words fall
# back to the native merge loop.
_WORD_W = 128
# row-count buckets: each [B, 128] shape compiles once (persistently
# cached); packed rows hold ~16 natural words each.  1024 is deliberately
# the LARGEST dispatch size: fills beyond it go out as pipelined
# length-graded [1024, 128] packs, so each pack's fixpoint trips track its
# own (sorted) word depth instead of the global deepest word — measured
# 245 ms -> 146 ms for a 49K-word Zipf fill vs a single [4096, 128] pack
# (the per-pack dispatch round trip amortizes across the in-flight packs;
# see PROFILE.md "device fill cost model").
_ROW_BUCKETS = (64, 256, 1024)


class _FillResult:
    """Result slot for one background device scan+fill (daemon thread)."""

    __slots__ = ("result", "error", "done", "words", "lens")

    def __init__(self):
        import threading

        self.result = None
        self.error = None
        self.done = threading.Event()
        # the scanned miss words (filled by the background thread before
        # the device encode; consumed by the harvest)
        self.words = None
        self.lens = None


# Fills still running at interpreter exit must be waited out: a daemon
# thread parked inside an XLA compile would otherwise be force-unwound by
# CPython's finalization when it next touches the GIL, aborting the whole
# process through the runtime's C++ frames ("FATAL: exception not
# rethrown").  The atexit hook joins live fills (a compile finishes in
# bounded time); CTOK_FILL_EXIT_WAIT=0 opts out.
_live_fills: set = set()
_exit_hook_installed = False

# Serializes device fills across threads: the background auto-fill thread
# and a synchronous fill (explicit backend="device", tests, bench) must
# not compile/execute concurrently — the remote-compile TPU backend used
# here wedges under concurrent compilation from two threads of one
# process.  Ordinary host encode work never takes this lock, so the
# intended overlap (chip fills vs native assembly) is unaffected.
_device_lock = None


def _get_device_lock():
    global _device_lock
    if _device_lock is None:
        import threading

        _device_lock = threading.Lock()
    return _device_lock


def _wait_live_fills():
    import os

    if os.environ.get("CTOK_FILL_EXIT_WAIT", "") == "0":
        return
    for holder in list(_live_fills):
        holder.done.wait()


def _track_fill(holder) -> None:
    global _exit_hook_installed
    if not _exit_hook_installed:
        import atexit

        atexit.register(_wait_live_fills)
        _exit_hook_installed = True
    _live_fills.add(holder)


class DeviceWordEncoder:
    """Encodes batches by device-merging distinct uncached words."""

    # cap on distinct words per synchronous fill (the remainder of a large
    # novel batch is host-merged and cached by the native tier, so capping
    # bounds latency without affecting results); a fill this large goes
    # out as multiple pipelined [_ROW_BUCKETS[-1], W] length-graded packs
    fill_cap = 65536
    # once warm, skip the miss scan and only sweep periodically — misses
    # between sweeps are handled (and cached) by the native merge loop.
    # Consecutive EMPTY sweeps back the interval off exponentially (to
    # max_sweep_interval): on a fully-warm serving corpus the scan should
    # cost asymptotically nothing, even on a 2-core host where the
    # background thread competes with the assembly threads.
    sweep_interval = 32
    max_sweep_interval = 512
    # below this many misses the host loop is cheaper than a device round
    # trip; the async path leaves them to the native tier
    min_async_fill = 64
    # transient device errors tolerated before the auto-fill is disabled
    # for this tokenizer (each one is logged; exactness is never affected)
    max_fill_failures = 3

    def __init__(self, pipeline, native):
        # ``pipeline`` may be the built device pipeline or a zero-arg
        # callable building it on first use — the auto path passes the
        # callable so the (seconds-scale) table build runs on the
        # background fill thread, never on the serving thread
        import threading

        self._pipeline = None if callable(pipeline) else pipeline
        self._pipeline_fn = pipeline if callable(pipeline) else None
        self._pipeline_lock = threading.Lock()
        self.native = native
        # optional jax.sharding.NamedSharding for the word-matrix rows
        # (parallel/encode.shard_word_encoder); see the property below —
        # (re)assignment invalidates the compiled sharded fns
        self._sharding = None
        self._steady = False
        self._batches_since_sweep = 0
        self._sweep_cur = self.sweep_interval
        # async state (auto mode): _pending = a _FillResult whose scan +
        # device encode run on a daemon thread (a non-daemon executor
        # would block interpreter exit on an in-flight first compile).
        # _async_mu guards _pending/_steady/_batches_since_sweep against
        # concurrent serving threads; it is never held while blocking.
        self._async_mu = threading.Lock()
        self._pending = None
        self._device_broken = False
        self._fill_failures = 0
        # set by the tokenizer when the batch that launched a fill has
        # finished serving: the background scan defers to it so the
        # miss scan's CPU never overlaps the launching batch (on big
        # hosts this is noise; on a 2-core host it is the difference
        # between a cold batch paying for the scan or not)
        self._serving_idle = threading.Event()
        self._serving_idle.set()

    @property
    def sharding(self):
        return self._sharding

    @sharding.setter
    def sharding(self, value):
        # the compiled sharded fills close over the mesh captured at first
        # access and their per-device chunk layout is read back out by
        # _unpack_fused_sharded from the CURRENT mesh — a stale compiled
        # fill under a new mesh would silently corrupt ids, so any
        # (re)assignment drops the cached compilations
        if getattr(self, "_sharding", None) is not value:
            self.__dict__.pop("_fn_sharded", None)
            self.__dict__.pop("_fn_full_sharded", None)
        self._sharding = value

    @property
    def pipeline(self):
        # double-checked lock: the background fill thread and a main-
        # thread force-build (tokenizer._get_word_path adoption) may race
        p = self._pipeline
        if p is None:
            with self._pipeline_lock:
                if self._pipeline is None:
                    fn, self._pipeline_fn = self._pipeline_fn, None
                    if fn is not None:
                        self._pipeline = fn()
                p = self._pipeline
            if p is None:
                raise RuntimeError("device pipeline unavailable")
        return p

    # compacted-output capacity as a fraction of total lanes: 3/8 covers
    # realistic novel-word traffic (unseen lexicon words measure ~0.34
    # ids/byte under a 50K vocab) with headroom; a pack that overflows is
    # redispatched once through the lazily-compiled full-capacity variant
    _CAP_NUM, _CAP_DEN = 3, 8

    @property
    def _phase_n1(self) -> int:
        """Fixpoint iterations before the mid-fixpoint lane compaction
        (0 disables phasing — the DEFAULT, by measurement).  ~45% of
        lanes are tombstones by iteration 6, which round 4 estimated as
        a ≤1.5x lever; the round-5 on-chip A/B killed it: at the
        production [1024,128] pack the 49K-word steady fill measures
        141.3 ms unphased vs 143.9/141.6/143.6 ms at n1=6/8/10 (and
        372.6 ms at n1=4, where half-rows overflow and every pack pays
        the spill redispatch).  The per-iteration gather wall is per-OP
        overhead on this backend, insensitive to lane count just as r4
        measured it insensitive to gathered bytes — so halving lanes
        buys nothing and the extra mid-sort risks spills.  The phased
        body stays available (CTOK_PHASE_N1=N) as a measured variant
        for future backends where gathers are throughput-bound."""
        v = getattr(self, "_phase_n1_cached", None)
        if v is None:
            import os

            v = int(os.environ.get("CTOK_PHASE_N1", "0"))
            self._phase_n1_cached = v
        return v

    @functools.cached_property
    def _fn(self):
        return self._merge_fn(
            self._CAP_NUM, self._CAP_DEN, self._phase_n1
        )

    @functools.cached_property
    def _fn_full(self):
        # cap = all lanes, UNPHASED: cannot spill (live ids <= lanes);
        # only compiled if a compact-cap pack ever overflows
        return self._merge_fn(1, 1, 0)

    @functools.cached_property
    def _fn_sharded(self):
        return self._merge_fn_sharded(
            self._CAP_NUM, self._CAP_DEN, self._phase_n1
        )

    @functools.cached_property
    def _fn_full_sharded(self):
        return self._merge_fn_sharded(1, 1, 0)

    def _local_fill_body(self, cap_num: int, cap_den: int,
                         phase_n1: int = 0):
        """The per-block fill body: (bytes [B,W] uint8, start_bits
        [B,W//8], row_len [B] int32) -> fused uint8 buffer.

        Unphased (``phase_n1 == 0``) layout:
          [cap·itemsize ids ++ B·W/8 alive bits ++ 4-byte total]
        Phased (the default fast path, VERDICT r4 item 5): the fixpoint
        runs ``phase_n1`` iterations at [B, W], compacts surviving
        lanes into a [B/2, W] matrix (ops/merge.phased_merge_words) and
        finishes there — the pair-table gathers, the per-iteration
        cost, run over half the lanes.  Layout:
          [cap·itemsize ids ++ B·W/16 alive bits ++ B·W/16 word-start
           bits ++ 4-byte total]
        (same total size; the start bits replace the host's
        byte-derived word boundaries, which compaction invalidates).
        A pack whose kept lanes overflow a half-row reports the spill
        sentinel in ``total`` and is redispatched through the unphased
        full-capacity body.

        Row-local by construction — a word never spans rows, word ids
        are a running count of starts (only equality between adjacent
        lanes matters, so a block-local count is as good as a global
        one), and the sort-compaction orders by flat position within
        the block.  This is what makes the sharded variant collective-
        free: every device runs this same body on its row slice."""
        import jax
        import jax.numpy as jnp

        p = self.pipeline
        byte_token_table = p.byte_token_table
        narrow = self._out_dtype == np.uint16

        def body(bytes_bw, start_bits, row_len):
            B, W = bytes_bw.shape
            pos = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
            valid = pos < row_len[:, None]
            bits = jnp.repeat(start_bits, 8, axis=1)  # byte j covers cols 8j..8j+7
            starts = (
                (bits >> (pos % 8).astype(jnp.uint8)) & 1
            ).astype(jnp.int32)
            starts = jnp.where(valid, starts, 0)
            wid = jnp.cumsum(starts.reshape(-1)).reshape(B, W) - 1
            wid = jnp.where(valid, wid, -1)
            tokens = byte_token_table[bytes_bw.astype(jnp.int32)]
            tokens = jnp.where(valid, tokens, -1)
            phased = phase_n1 > 0 and B % 2 == 0
            if phased:
                from .merge import _shift_right, phased_merge_words

                merged, wid2, spill = phased_merge_words(
                    tokens, wid, p.pair_lookup(), phase_n1
                )
                wstart = (wid2 >= 0) & (
                    wid2 != _shift_right(wid2, jnp.int32(-2))
                )
            else:
                # two-choice cuckoo when eligible, CHD fallback
                merged, _counts = p.merge_fixpoint(tokens, wid)
            alive = merged >= 0
            aflat = alive.reshape(-1)
            cum = jnp.cumsum(aflat.astype(jnp.int32))
            total = cum[-1]
            cap = B * W * cap_num // cap_den
            if phased:
                # a pack that could not compact reports past-the-
                # sentinel so the host redispatches it full-capacity
                total = jnp.where(spill, jnp.int32(B * W + 1), total)
            # compaction by sort, the TPU idiom: live lanes get their
            # output position as the key (strictly increasing -> order
            # preserved), dead lanes a shared past-the-end sentinel; a
            # static slice then keeps the first cap.  lax.sort is
            # heavily optimized on TPU, unlike 1-D dynamic scatter.
            n_lanes = aflat.shape[0]
            keys = jnp.where(aflat, cum - 1, jnp.int32(n_lanes))
            vals = merged.reshape(-1)
            if narrow:
                vals = vals.astype(jnp.uint16)
            _skeys, svals = jax.lax.sort_key_val(keys, vals)
            out = svals[:cap]
            alive_bits = jnp.packbits(alive, axis=1, bitorder="little")
            # ONE fused uint8 result (ids ++ alive bitmap [++ start
            # bitmap] ++ total): the remote-dispatch tunnel charges a
            # fixed latency per transfer, so separate small D2H rounds
            # cost multiple dispatch floors — fusing them is a 2-3x at
            # small fills
            ids_u8 = jax.lax.bitcast_convert_type(out, jnp.uint8).reshape(
                -1
            )
            tot_u8 = jax.lax.bitcast_convert_type(
                total.reshape(1).astype(jnp.int32), jnp.uint8
            ).reshape(-1)
            parts = [ids_u8, alive_bits.reshape(-1)]
            if phased:
                parts.append(
                    jnp.packbits(
                        wstart, axis=1, bitorder="little"
                    ).reshape(-1)
                )
            parts.append(tot_u8)
            return jnp.concatenate(parts)

        return body

    def _merge_fn(self, cap_num: int, cap_den: int, phase_n1: int = 0):
        """jit of the fill body (single-device: the whole pack is one
        block).  See ``_local_fill_body`` for the contract and the
        on-device compaction story (VERDICT r2 item 2)."""
        import jax

        from ..utils.jax_setup import setup_compilation_cache

        setup_compilation_cache()
        return jax.jit(self._local_fill_body(cap_num, cap_den, phase_n1))

    def _merge_fn_sharded(self, cap_num: int, cap_den: int,
                          phase_n1: int = 0):
        """shard_map twin of ``_merge_fn``: row blocks shard over the
        mesh's ``data`` axis and every device compacts ITS rows locally
        — zero collectives (the global-cumsum/global-sort form would
        force cross-device data movement for an operation that is
        row-independent by construction).  Output is the per-device
        fused blocks concatenated: [n_dev · chunk_loc] uint8, split
        back apart by ``_unpack_fused_sharded``."""
        import jax
        from jax.sharding import PartitionSpec as P

        try:  # jax >= 0.4.35
            from jax.experimental.shard_map import shard_map
        except ImportError:  # pragma: no cover
            from jax.shard_map import shard_map

        from ..utils.jax_setup import setup_compilation_cache

        setup_compilation_cache()
        mesh = self.sharding.mesh
        body = self._local_fill_body(cap_num, cap_den, phase_n1)
        spec = P(*self.sharding.spec)

        def local(bytes_bw, start_bits, row_len):
            return body(bytes_bw, start_bits, row_len)

        return jax.jit(
            shard_map(
                local,
                mesh=mesh,
                in_specs=(spec, spec, spec),
                out_specs=spec,
            )
        )

    # ------------------------------------------------------------------
    # packed device encode
    # ------------------------------------------------------------------

    def _pack_seg(self, words_buf: np.ndarray, offs: np.ndarray, w0: int,
                  n_words: int, max_rows: int):
        """Segment-pack words [w0, w0+n_words) into dense rows.  Returns
        (bytes [max_rows,W], marks [max_rows,W], starts [n_fit], n_fit,
        rows_used)."""
        lib = getattr(self.native, "_lib", None)
        arr = np.empty((max_rows, _WORD_W), np.uint8)
        marks = np.empty((max_rows, _WORD_W), np.uint8)
        starts = np.empty(max(n_words, 1), np.int64)
        if lib is not None:
            from ..native import _ptr

            wb = np.ascontiguousarray(words_buf, np.uint8)
            if not wb.size:
                wb = np.zeros(1, np.uint8)
            chunk_offs = np.ascontiguousarray(
                offs[w0 : w0 + n_words + 1], np.int64
            )
            rows_used = np.zeros(1, np.int64)
            n_fit = lib.ctok_pack_seg(
                _ptr(wb), _ptr(chunk_offs), n_words, _WORD_W, max_rows,
                _ptr(arr), _ptr(marks), _ptr(starts), _ptr(rows_used),
            )
            return arr, marks, starts[:n_fit], int(n_fit), int(rows_used[0])
        # pure-numpy fallback (no native library)
        arr[:] = 0
        marks[:] = 0
        row = col = 0
        n_fit = 0
        for w in range(n_words):
            a, b = int(offs[w0 + w]), int(offs[w0 + w + 1])
            ln = b - a
            if ln <= 0 or ln > _WORD_W:
                break
            if col + ln > _WORD_W:
                row += 1
                col = 0
            if row >= max_rows:
                break
            base = row * _WORD_W + col
            arr.reshape(-1)[base : base + ln] = words_buf[a:b]
            marks.reshape(-1)[base] = 1
            marks.reshape(-1)[base + 1 : base + ln] = 2
            starts[w] = base
            col += ln
            n_fit += 1
        rows_used = row + (1 if col else 0)
        return arr, marks, starts[:n_fit], n_fit, rows_used

    def _encode_words_packed(self, words_buf: np.ndarray, lens: np.ndarray):
        """Ragged distinct words -> (ids_flat int32, counts int64[n]).

        ``counts[w]`` is word w's token count, or -1 for a word the
        device did not cover (compaction spill or oversize) — callers
        skip those and the host tier merges them lazily.  ``ids_flat``
        concatenates covered words' ids in input order.  Pure device +
        numpy work — safe to run off the main thread (no native
        shared-cache access); fills are serialized process-wide (see
        _device_lock)."""
        with _get_device_lock():
            return self._encode_words_packed_locked(words_buf, lens)

    @functools.cached_property
    def _out_dtype(self):
        """Device id dtype: uint16 when every producible id fits."""
        p = self.pipeline
        max_id = int(p.byte_token_table.max())
        if p.rows.size:
            max_id = max(max_id, int(p.rows[:, 3].max()))
        return np.uint16 if max_id < 65535 else np.int32

    def _unpack_fused(self, fused, cap: int):
        """Split the jitted fill's fused uint8 buffer back into
        (ids ndarray[cap], alive per-lane bit array, total int).
        Layout: [cap ids][B*W/8 alive bits][4-byte total]."""
        raw = np.asarray(fused)
        ids_bytes = cap * np.dtype(self._out_dtype).itemsize
        out_ids = raw[:ids_bytes].view(self._out_dtype)
        alive = np.unpackbits(raw[ids_bytes:-4], bitorder="little")
        total = int(raw[-4:].view(np.int32)[0])
        return out_ids, alive, total

    def _unpack_fused_phased(self, fused, B: int, cap: int):
        """Phased-layout twin of :meth:`_unpack_fused`: the compacted
        matrix has B*W/2 lanes with alive AND word-start bitmaps.
        Returns (ids, alive bits, word-start bits, total)."""
        raw = np.asarray(fused)
        ids_bytes = cap * np.dtype(self._out_dtype).itemsize
        nb = B * _WORD_W // 16
        out_ids = raw[:ids_bytes].view(self._out_dtype)
        alive = np.unpackbits(
            raw[ids_bytes : ids_bytes + nb], bitorder="little"
        )
        wstart = np.unpackbits(raw[ids_bytes + nb : -4], bitorder="little")
        total = int(raw[-4:].view(np.int32)[0])
        return out_ids, alive, wstart, total

    def _unpack_fused_sharded_phased(self, fused, B: int, cap_num: int,
                                     cap_den: int):
        """Sharded phased unpack: per-device blocks carry the phased
        layout; concatenating in device order reproduces the global
        compacted flat order (devices hold contiguous row slices).
        Returns (ids, alive bits, word-start bits, spilled)."""
        raw = np.asarray(fused)
        ndev = int(self.sharding.mesh.devices.size)
        B_loc = B // ndev
        isz = np.dtype(self._out_dtype).itemsize
        cap_loc = B_loc * _WORD_W * cap_num // cap_den
        nb = B_loc * _WORD_W // 16
        chunk = cap_loc * isz + 2 * nb + 4
        ids_parts, alive_parts, ws_parts = [], [], []
        spilled = False
        for d in range(ndev):
            blk = raw[d * chunk : (d + 1) * chunk]
            ids = blk[: cap_loc * isz].view(self._out_dtype)
            alive_parts.append(
                np.unpackbits(
                    blk[cap_loc * isz : cap_loc * isz + nb],
                    bitorder="little",
                )
            )
            ws_parts.append(
                np.unpackbits(blk[cap_loc * isz + nb : -4],
                              bitorder="little")
            )
            total = int(blk[-4:].view(np.int32)[0])
            if total > cap_loc:  # cap spill OR phase-spill sentinel
                spilled = True
                total = cap_loc
            ids_parts.append(ids[:total])
        return (
            np.concatenate(ids_parts),
            np.concatenate(alive_parts),
            np.concatenate(ws_parts),
            spilled,
        )

    def _unpack_fused_sharded(self, fused, B: int, cap_num: int,
                              cap_den: int):
        """Split a sharded fill's concatenated per-device blocks into
        (ids concatenated in global row order, alive per-lane bits,
        spilled).  Per-device block layout matches _unpack_fused with
        B_loc = B/n_dev rows; devices hold contiguous row slices, so
        concatenating per-device ids/alive in device order reproduces
        exactly what the single-block form would have produced."""
        raw = np.asarray(fused)
        ndev = int(self.sharding.mesh.devices.size)
        B_loc = B // ndev
        isz = np.dtype(self._out_dtype).itemsize
        cap_loc = B_loc * _WORD_W * cap_num // cap_den
        chunk = cap_loc * isz + B_loc * _WORD_W // 8 + 4
        ids_parts, alive_parts, spilled = [], [], False
        for d in range(ndev):
            blk = raw[d * chunk : (d + 1) * chunk]
            ids = blk[: cap_loc * isz].view(self._out_dtype)
            alive_parts.append(
                np.unpackbits(blk[cap_loc * isz : -4], bitorder="little")
            )
            total = int(blk[-4:].view(np.int32)[0])
            if total > cap_loc:
                spilled = True
                total = cap_loc
            ids_parts.append(ids[:total])
        return (
            np.concatenate(ids_parts),
            np.concatenate(alive_parts),
            spilled,
        )

    @staticmethod
    def _ragged_gather(src, starts, counts):
        """Concatenate src[starts[i] : starts[i]+counts[i]] for all i."""
        out_offs = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, out=out_offs[1:])
        tot = int(out_offs[-1])
        idx = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(out_offs[:-1], counts)
            + np.repeat(starts, counts)
        )
        return src[idx]

    def _encode_words_packed_locked(self, words_buf, lens):
        n = len(lens)
        if n == 0:
            return np.zeros(0, np.int32), np.zeros(0, np.int64)
        lens = np.asarray(lens, np.int32)
        words_buf = np.asarray(words_buf, np.uint8)
        # Length-sort (VERDICT r2 item 3): uniform-length rows pack
        # densely and each bucket's fixpoint trip count tracks ITS
        # deepest word instead of the global deepest; outputs are
        # inverse-permuted back to input order below.
        order = None
        if n > 64:
            order = np.argsort(lens, kind="stable").astype(np.int64)
            if np.array_equal(order, np.arange(n)):
                order = None
        if order is not None:
            offs0 = np.zeros(n + 1, np.int64)
            np.cumsum(lens, out=offs0[1:])
            work_lens = lens[order]
            work_buf = self._ragged_gather(
                words_buf, offs0[:-1][order], work_lens
            )
        else:
            work_buf, work_lens = words_buf, lens
        offs = np.zeros(n + 1, np.int64)
        np.cumsum(work_lens, out=offs[1:])
        # Dispatch every bucket before harvesting any (VERDICT r2 item
        # 4): jax dispatch is async, so bucket k+1's H2D + compute
        # overlap bucket k's D2H readback; only np.asarray blocks.
        pending = []
        spill_args: dict = {}
        w_done = 0
        max_rows = _ROW_BUCKETS[-1]
        while w_done < n:
            arr, marks, starts, n_fit, rows_used = self._pack_seg(
                work_buf, offs, w_done, n - w_done, max_rows
            )
            if n_fit == 0:
                break
            B = next(b for b in _ROW_BUCKETS if b >= rows_used)
            a = arr[:B]
            mk = marks[:B]
            # compress the segment marks for transfer: a 1-bit start map
            # (little-endian within each byte) + per-row content length
            # (rows are packed densely from column 0)
            bits = np.packbits(mk == 1, axis=1, bitorder="little")
            row_len = (mk > 0).sum(axis=1).astype(np.int32)
            sharded = (
                self.sharding is not None
                and B % int(self.sharding.mesh.devices.size) == 0
            )
            if sharded:
                import jax

                a = jax.device_put(a, self.sharding)
                bits = jax.device_put(bits, self.sharding)
                row_len = jax.device_put(row_len, self.sharding)
                fused = self._fn_sharded(a, bits, row_len)
            else:
                fused = self._fn(a, bits, row_len)
            pending.append((fused, starts, w_done, n_fit, B, sharded))
            spill_args[(w_done, n_fit)] = (a, bits, row_len)
            w_done += n_fit
        # harvest in dispatch order
        ids_parts: list[np.ndarray] = []
        counts_sorted = np.full(n, -1, np.int64)  # -1 = not covered
        for fused, starts, w0, n_fit, B, sharded in pending:
            ndev = (
                int(self.sharding.mesh.devices.size) if sharded else 1
            )
            phased = self._phase_n1 > 0 and (B // ndev) % 2 == 0
            cnts = None
            if phased:
                # compacted layout: word boundaries come from the
                # device's start bitmap (byte-derived starts no longer
                # correspond to lane positions)
                if sharded:
                    out_ids, alive, wstart, spilled = (
                        self._unpack_fused_sharded_phased(
                            fused, B, self._CAP_NUM, self._CAP_DEN
                        )
                    )
                else:
                    cap = B * _WORD_W * self._CAP_NUM // self._CAP_DEN
                    out_ids, alive, wstart, total = (
                        self._unpack_fused_phased(fused, B, cap)
                    )
                    spilled = total > cap
                    if not spilled:
                        out_ids = out_ids[:total]
                if not spilled:
                    sf = np.flatnonzero(wstart)
                    if len(sf) != n_fit:  # pragma: no cover — defensive
                        spilled = True
                    else:
                        cs = np.zeros(len(alive) + 1, np.int64)
                        np.cumsum(alive, out=cs[1:])
                        bounds = np.append(sf, len(alive))
                        cnts = cs[bounds[1:]] - cs[bounds[:-1]]
            else:
                if sharded:
                    out_ids, alive, spilled = self._unpack_fused_sharded(
                        fused, B, self._CAP_NUM, self._CAP_DEN
                    )
                else:
                    cap = B * _WORD_W * self._CAP_NUM // self._CAP_DEN
                    out_ids, alive, total = self._unpack_fused(fused, cap)
                    spilled = total > cap
                    if not spilled:
                        out_ids = out_ids[:total]
                cs = np.zeros(len(alive) + 1, np.int64)
                np.cumsum(alive, out=cs[1:])
                ln = work_lens[w0 : w0 + n_fit].astype(np.int64)
                w_end = cs[starts + ln]
                cnts = w_end - cs[starts]
            if spilled:
                # compaction/cap spill (poorly-compressible pack):
                # redispatch this pack once through the full-capacity
                # UNPHASED variant — coverage stays complete, the
                # compact path stays the fast common case.  Counts come
                # from the redispatch when the phased bitmap was
                # unusable (cnts is None or phased).
                if sharded:
                    out_ids, alive_f, _sp2 = self._unpack_fused_sharded(
                        self._fn_full_sharded(*spill_args[(w0, n_fit)]),
                        B, 1, 1,
                    )
                else:
                    out_ids, alive_f, total = self._unpack_fused(
                        self._fn_full(*spill_args[(w0, n_fit)]),
                        B * _WORD_W,
                    )
                    out_ids = out_ids[:total]
                if cnts is None:
                    cs = np.zeros(len(alive_f) + 1, np.int64)
                    np.cumsum(alive_f, out=cs[1:])
                    ln = work_lens[w0 : w0 + n_fit].astype(np.int64)
                    w_end = cs[starts + ln]
                    cnts = w_end - cs[starts]
            counts_sorted[w0 : w0 + n_fit] = cnts
            ids_parts.append(out_ids)
        ids_sorted = (
            np.concatenate(ids_parts)
            if ids_parts
            else np.zeros(0, np.int32)
        )
        if order is None:
            return ids_sorted.astype(np.int32, copy=False), counts_sorted
        counts = np.full(n, -1, np.int64)
        counts[order] = counts_sorted
        s_cnt = np.where(counts_sorted < 0, 0, counts_sorted)
        s_off = np.zeros(n + 1, np.int64)
        np.cumsum(s_cnt, out=s_off[1:])
        spos = np.empty(n, np.int64)
        spos[order] = np.arange(n)
        ids_flat = self._ragged_gather(
            ids_sorted, s_off[:-1][spos], np.where(counts < 0, 0, counts)
        )
        return ids_flat.astype(np.int32, copy=False), counts

    # ------------------------------------------------------------------
    # synchronous fill (explicit device backend, bench, tests)
    # ------------------------------------------------------------------

    def fill_caches(self, data: list[bytes], max_words: int | None = None) -> int:
        """Device-encode the distinct uncached words in the corpus and
        insert them into the native shared caches.  Returns the number of
        words filled.  ``max_words`` caps the device batch (the remainder
        is computed lazily by the native merge loop)."""
        words_buf, lens = self.native.collect_miss_words(data, _WORD_W)
        n = len(lens)
        if n == 0:
            return 0
        cap = max_words if max_words is not None else self.fill_cap
        if n > cap:
            n = cap
            lens = lens[:n]
            words_buf = words_buf[: int(np.sum(lens))]
        ids_flat, counts = self._encode_words_packed(words_buf, lens)
        return self._insert_covered(words_buf, lens, ids_flat, counts)

    def _insert_covered(self, words_buf, lens, ids_flat, counts) -> int:
        """Insert the device-covered words (counts >= 0) into the shared
        caches; uncovered words (compaction spill / oversize) are left to
        the host tier.  Returns the number inserted."""
        lens = np.asarray(lens, np.int32)
        covered = counts >= 0
        n_cov = int(covered.sum())
        if n_cov == 0:
            return 0
        if n_cov == len(lens):
            self.native.cache_insert_flat(words_buf, lens, ids_flat, counts)
            return n_cov
        offs = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        keep_lens = lens[covered]
        keep_buf = self._ragged_gather(
            np.asarray(words_buf, np.uint8), offs[:-1][covered], keep_lens
        )
        self.native.cache_insert_flat(
            keep_buf, keep_lens, ids_flat, counts[covered]
        )
        return n_cov

    def _maybe_fill(self, data: list[bytes]) -> int:
        """Adaptive synchronous fill: scan-and-fill until the caches are
        warm, then skip the (serial) miss scan and only sweep every
        ``sweep_interval`` batches.  Skipping never affects results —
        uncached words are merged and cached by the native tier."""
        if self._steady and self._batches_since_sweep < self.sweep_interval:
            self._batches_since_sweep += 1
            return 0
        n = self.fill_caches(data, max_words=self.fill_cap)
        self._batches_since_sweep = 0
        self._steady = n < max(16, self.fill_cap // 4096)
        return n

    def encode_batch(self, data: list[bytes]) -> list[list[int]]:
        """Full batch encode: device merges the distinct new words, the
        native runtime assembles per-text ids from the caches."""
        self._maybe_fill(data)
        return self.native.encode_batch(data)

    def encode_batch_ragged(self, data: list[bytes]):
        self._maybe_fill(data)
        return self.native.encode_batch_ragged(data)

    # ------------------------------------------------------------------
    # async fill (backend="auto" on TPU)
    # ------------------------------------------------------------------

    def _harvest(self, holder) -> int:
        """Consume a FINISHED fill: record errors (disabling the device
        path after ``max_fill_failures``, with a logged warning — never
        silently) or insert the results into the shared caches.  Caller
        must have detached ``holder`` from ``self._pending`` under
        ``_async_mu``.  Returns words inserted."""
        wb, ls = holder.words, holder.lens
        if holder.error is None and (wb is None or len(ls) == 0):
            return 0  # scan found nothing to fill
        if holder.error is not None or holder.result is None:
            # result can be None without error only if something
            # BaseException-shaped unwound the fill thread — treat it as
            # a failure, never unpack None
            import logging

            with self._async_mu:
                self._fill_failures += 1
                failures = self._fill_failures
                if failures >= self.max_fill_failures:
                    self._device_broken = True
            if failures >= self.max_fill_failures:
                logging.getLogger(__name__).warning(
                    "device word fill failed %d times; disabling the TPU "
                    "auto-fill for this tokenizer (host tier continues, "
                    "results unaffected). Last error: %r",
                    failures,
                    holder.error,
                )
            else:
                logging.getLogger(__name__).warning(
                    "device word fill failed (%d/%d before disable): %r",
                    failures,
                    self.max_fill_failures,
                    holder.error,
                )
            return 0
        ids_flat, counts = holder.result
        n = self._insert_covered(wb, ls, ids_flat, counts)
        from ..utils.metrics import counters

        counters.add("device_words_filled", n)
        counters.add("device_fill_bytes", float(np.sum(ls)))
        return n

    def maybe_fill_async(self, data_fn) -> None:
        """Non-blocking scan+fill hook for the auto path, called at the
        top of a batch encode on the calling thread.  Harvests a finished
        device fill into the shared caches (calling-thread insert), else
        launches a background scan+fill when one is due.  Both the miss
        scan and the device encode run on the background thread — the
        scan probes only the shared caches (its own native mutex), so a
        cold batch's serving wall time never includes it.  ``data_fn``
        lazily materializes the corpus byte strings on that thread.
        Safe under concurrent callers: all pending/steady state changes
        happen under ``_async_mu`` (never held while blocking)."""
        if self._device_broken:
            return
        with self._async_mu:
            pending = self._pending
            if pending is not None:
                if not pending.done.is_set():
                    return
                self._pending = None
            elif (
                self._steady
                and self._batches_since_sweep < self._sweep_cur
            ):
                self._batches_since_sweep += 1
                return
        if pending is not None:
            self._harvest(pending)
            return
        holder = _FillResult()
        with self._async_mu:
            if self._pending is not None:
                return  # another caller launched meanwhile
            self._batches_since_sweep = 0
            self._pending = holder
        self._serving_idle.clear()

        def _run():
            try:
                import os as _os

                # let the launching batch finish serving first (bounded:
                # a caller that never signals only delays the scan)
                self._serving_idle.wait(0.5)

                try:
                    # deprioritize against the serving threads (Linux
                    # honors per-thread nice via the thread id)
                    import threading as _t

                    _os.setpriority(
                        _os.PRIO_PROCESS, _t.get_native_id(), 10
                    )
                except (OSError, AttributeError):  # pragma: no cover
                    pass
                # n_threads=1: stay off the worker pool the serving
                # thread's encode is using
                words_buf, lens = self.native.collect_miss_words(
                    data_fn(), _WORD_W, n_threads=1
                )
                n = len(lens)
                with self._async_mu:
                    self._steady = n < self.min_async_fill
                    if n < self.min_async_fill:
                        # empty sweep: back off; a real fill resets
                        self._sweep_cur = min(
                            self._sweep_cur * 2, self.max_sweep_interval
                        )
                    else:
                        self._sweep_cur = self.sweep_interval
                if n < self.min_async_fill:
                    return  # host merges + caches the stragglers
                if n > self.fill_cap:
                    n = self.fill_cap
                    lens = lens[:n]
                    words_buf = words_buf[: int(np.sum(lens))]
                holder.words, holder.lens = words_buf, lens
                holder.result = self._encode_words_packed(words_buf, lens)
            except Exception as e:  # device errors recorded, not raised
                holder.error = e
            finally:
                holder.done.set()
                _live_fills.discard(holder)

        import threading

        _track_fill(holder)
        threading.Thread(
            target=_run, name="ctok-devfill", daemon=True
        ).start()

    def batch_done(self) -> None:
        """Caller-side hint: the batch that may have launched a fill has
        finished serving; the background scan may start."""
        self._serving_idle.set()

    def drain_async(self, timeout: float | None = None) -> int:
        """Block until an in-flight async fill lands in the caches (for
        benches/tests).  Returns the number of words inserted.  Waits
        WITHOUT holding ``_async_mu`` so concurrent batch encodes never
        stall behind a long compile."""
        with self._async_mu:
            pending = self._pending
        if pending is None:
            return 0
        if not pending.done.wait(timeout):
            return 0
        with self._async_mu:
            if self._pending is not pending:
                return 0  # another thread harvested it
            self._pending = None
        return self._harvest(pending)


def build_word_encoder(tokenizer) -> DeviceWordEncoder | None:
    """Word-path encoder for a Tokenizer, or None when ineligible (needs
    both the device tables and the native runtime)."""
    pipeline = tokenizer._get_pipeline()
    native = tokenizer._get_native_encoder()
    if pipeline is None or native is None:
        return None
    return DeviceWordEncoder(pipeline, native)
