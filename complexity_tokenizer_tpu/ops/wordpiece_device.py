"""Device WordPiece: greedy longest-match as a batched gather/match kernel.

The reference's WordPiece is a per-word scalar loop — at each position try
the longest substring in the vocab, else emit UNK and advance one char
(models.rs:52-95).  TPU-native formulation (SURVEY C17):

- Words live as codepoint rows ``[B, W]`` (W = 128 lanes).
- Substring hashes are O(1) from prefix polynomial hashes:
  ``h(s, e) = P[e] - P[s] * pow[e - s]`` in uint32, two independent hash
  functions; the ``##`` continuation variant adds ``seed * pow[len]``.
- The vocab is a CHD perfect-hash table keyed on the two hashes (reusing
  ops/hashtable.py — a string key is just a pair of uint32s), so one
  probe = 2 gathers, vectorized over every word and every candidate
  length at once.
- Each outer step matches, in every active word simultaneously, the
  longest hashing candidate at the current position, verifies it exactly
  against a packed token-codepoint table (hash collisions can't corrupt
  output), emits at the start position (tombstone layout) and advances.
  Steps needed = max tokens in any word.
- Exactness: duplicate 64-bit token hashes are detected at build time
  (fall back to host); a runtime verify mismatch poisons the word and the
  caller re-tokenizes it on host.  Both are ~impossible in practice but
  keep the tier bit-exact by construction.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from .hashtable import INF_RANK, build_chd_table

__all__ = ["WordPieceDeviceTables", "build_wordpiece_tables", "WordPieceDevice",
           "WordLevelDevice", "build_wordlevel_tables"]

_W = 128  # codepoint lanes per word row
_B1 = np.uint32(0x01000193)
_B2 = np.uint32(0x0BADC0DF)  # odd
_SEED_CONT1 = np.uint32(0x9E3779B9)
_SEED_CONT2 = np.uint32(0x7F4A7C15)


def _poly_hash_np(chars: list[int], base: np.uint32, seed: np.uint32) -> np.uint32:
    h = np.uint32(seed)
    with np.errstate(over="ignore"):
        for c in chars:
            h = h * base + np.uint32(c + 1)
    return h


def rolling_prefix_hashes(chars):
    """(P1, P2, pow1, pow2) for substring hashing over codepoint rows.

    ``P[b, i]`` is the polynomial hash of ``chars[b, :i]`` (codepoints
    +1-shifted so 0 is free; -1 padding contributes 0), so any substring
    hash is ``P[e] - P[s] * pow[e - s]`` — the device twin of
    :func:`_poly_hash_np`.  Shared by the WordPiece matcher, the Unigram
    Viterbi scan, and the distributed WordPiece trainer kernel."""
    import jax
    import jax.numpy as jnp

    B, W = chars.shape
    u = jnp.where(chars >= 0, chars.astype(jnp.uint32) + 1, 0)

    def prefix(base):
        def step(h, c):
            h2 = h * base + c
            return h2, h2

        _, out = jax.lax.scan(step, jnp.zeros(B, jnp.uint32), u.T)
        return jnp.concatenate([jnp.zeros((B, 1), jnp.uint32), out.T], axis=1)

    pow1 = jnp.concatenate(
        [jnp.ones(1, jnp.uint32), jnp.cumprod(jnp.full(W, _B1, jnp.uint32))]
    )
    pow2 = jnp.concatenate(
        [jnp.ones(1, jnp.uint32), jnp.cumprod(jnp.full(W, _B2, jnp.uint32))]
    )
    return prefix(_B1), prefix(_B2), pow1, pow2


@dataclass
class WordPieceDeviceTables:
    chd: object  # ChdTable keyed on (h1, h2); rank column = SLOT index
    token_chars: np.ndarray  # [S, Lt] int32, -1 padded (matchable form)
    token_lens: np.ndarray  # [S] int32
    emit_ids: np.ndarray  # [S] int32: slot -> vocab token id
    max_token_len: int
    unk_id: int  # -1 when UNK not in vocab
    max_input_chars: int


def build_wordpiece_tables(model) -> WordPieceDeviceTables | None:
    """Tables for a models.wordpiece.WordPieceModel; None if ineligible
    (token hash collision, empty vocab).

    Each vocab entry is inserted under every *matchable form* (one table
    slot per form, CHD rank column = slot, ``emit_ids[slot]`` = token id):

    - a plain key (full token chars, unseeded hashes) — the start==0 probe
      in models.rs:63-66 looks up the raw substring, so an entry that
      literally begins with the continuation prefix (e.g. ``##abc``) must
      be findable by its full spelling at word start;
    - a continuation key (prefix-stripped body, seeded hashes) when the
      entry strictly extends the prefix — the start>0 probe prepends the
      prefix before lookup.

    Forms longer than the lane width are skipped (a word that could match
    them is itself over-wide and host-routed by the caller).
    """
    vocab = model.vocab
    if not vocab:
        return None
    prefix = model.continuing_subword_prefix
    keys: dict[tuple[int, int], int] = {}
    Lt = 1
    slot_chars: list[list[int]] = []
    slot_emit: list[int] = []

    def add_key(chars: list[int], s1: np.uint32, s2: np.uint32, tid: int) -> bool:
        nonlocal Lt
        h1 = int(_poly_hash_np(chars, _B1, s1))
        h2 = int(_poly_hash_np(chars, _B2, s2))
        key = (
            h1 if h1 < 1 << 31 else h1 - (1 << 32),
            h2 if h2 < 1 << 31 else h2 - (1 << 32),
        )
        if key in keys:
            return False  # 64-bit hash collision between two forms
        keys[key] = len(slot_chars)
        slot_chars.append(chars)
        slot_emit.append(tid)
        Lt = max(Lt, len(chars))
        return True

    for tok, tid in vocab.items():
        full = [ord(c) for c in tok]
        if full and len(full) <= _W:
            if not add_key(full, np.uint32(0), np.uint32(0), tid):
                return None
        if tok.startswith(prefix) and len(tok) > len(prefix):
            body = [ord(c) for c in tok[len(prefix):]]
            if len(body) <= _W - 1:  # continuation matches start at >= 1
                if not add_key(body, _SEED_CONT1, _SEED_CONT2, tid):
                    return None
    if not slot_chars:
        return None
    chd = build_chd_table(keys)
    if chd is None:
        return None
    S = len(slot_chars)
    token_chars = np.full((S, Lt), -1, np.int32)
    token_lens = np.zeros(S, np.int32)
    for slot, chars in enumerate(slot_chars):
        token_chars[slot, : len(chars)] = chars
        token_lens[slot] = len(chars)
    unk_id = vocab.get(model.unk_token)
    return WordPieceDeviceTables(
        chd=chd,
        token_chars=token_chars,
        token_lens=token_lens,
        emit_ids=np.asarray(slot_emit, np.int32),
        max_token_len=Lt,
        unk_id=-1 if unk_id is None else int(unk_id),
        max_input_chars=int(model.max_input_chars_per_word),
    )


class WordPieceDevice:
    """Jitted greedy longest-match over word rows."""

    def __init__(self, tables: WordPieceDeviceTables):
        import jax.numpy as jnp

        self.t = tables
        self.disp = jnp.asarray(tables.chd.disp)
        self.rows = jnp.asarray(tables.chd.rows)
        self.token_chars = jnp.asarray(tables.token_chars)
        self.token_lens = jnp.asarray(tables.token_lens)
        self.emit_ids = jnp.asarray(tables.emit_ids)

    @functools.cached_property
    def _fn(self):
        import jax
        import jax.numpy as jnp

        from ..utils.jax_setup import setup_compilation_cache
        from .hashtable import chd_lookup_jnp

        setup_compilation_cache()
        t = self.t
        disp, rows = self.disp, self.rows
        token_chars, token_lens = self.token_chars, self.token_lens
        emit_ids = self.emit_ids
        size, n_buckets = t.chd.size, t.chd.n_buckets
        Lt = t.max_token_len
        maxlen = min(Lt, _W)
        unk = jnp.int32(t.unk_id)
        max_input = jnp.int32(t.max_input_chars)

        def fn(chars, lens):
            B, W = chars.shape
            P1, P2, pow1, pow2 = rolling_prefix_hashes(chars)
            ls = jnp.arange(1, maxlen + 1, dtype=jnp.int32)  # [L]
            lens_i = lens.astype(jnp.int32)

            # words over the char limit collapse to a single UNK
            # (models.rs:55-57)
            over = lens_i > max_input

            def take(P, idx):
                return jnp.take_along_axis(P, idx, axis=1)

            def body(state):
                start, out, poison = state
                active = (start < lens_i) & ~over
                e = start[:, None] + ls[None, :]  # [B, L]
                cand_ok = (e <= lens_i[:, None]) & active[:, None]
                e_c = jnp.clip(e, 0, W)
                s_c = jnp.clip(start[:, None], 0, W)
                h1 = take(P1, e_c) - take(P1, s_c) * pow1[ls][None, :]
                h2 = take(P2, e_c) - take(P2, s_c) * pow2[ls][None, :]
                is_cont = (start > 0)[:, None]
                h1 = jnp.where(is_cont, h1 + _SEED_CONT1 * pow1[ls][None, :], h1)
                h2 = jnp.where(is_cont, h2 + _SEED_CONT2 * pow2[ls][None, :], h2)
                tid = chd_lookup_jnp(
                    disp, rows, size, n_buckets,
                    h1.astype(jnp.int32), h2.astype(jnp.int32), cand_ok,
                )
                hit = tid != INF_RANK
                best_l = jnp.max(jnp.where(hit, ls[None, :], 0), axis=1)  # [B]
                matched = best_l > 0
                cand_id = jnp.take_along_axis(
                    tid, jnp.maximum(best_l - 1, 0)[:, None], axis=1
                )[:, 0]
                # exact verify of the chosen candidate (collision guard)
                vpos = jnp.clip(
                    start[:, None] + jnp.arange(Lt, dtype=jnp.int32)[None, :],
                    0, W - 1,
                )
                wchars = jnp.take_along_axis(chars, vpos, axis=1)  # [B, Lt]
                trow = token_chars[jnp.maximum(cand_id, 0)]  # [B, Lt]
                within = jnp.arange(Lt, dtype=jnp.int32)[None, :] < best_l[:, None]
                verified = (
                    jnp.all(jnp.where(within, trow == wchars, True), axis=1)
                    & (token_lens[jnp.maximum(cand_id, 0)] == best_l)
                )
                poison_now = matched & ~verified
                emit_unk = active & ~matched & (unk >= 0)
                emit_id = jnp.where(
                    matched & verified, emit_ids[jnp.maximum(cand_id, 0)], unk
                )
                do_emit = (matched & verified) | emit_unk
                cols = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
                out = jnp.where(
                    (cols == start[:, None]) & do_emit[:, None],
                    emit_id[:, None],
                    out,
                )
                adv = jnp.where(matched & verified, best_l, 1)
                start = jnp.where(active, start + adv, start)
                return start, out, poison | poison_now

            def cond(state):
                start, _, _ = state
                return jnp.any((start < lens_i) & ~over)

            start0 = jnp.zeros(chars.shape[0], jnp.int32)
            out0 = jnp.full(chars.shape, -1, jnp.int32)
            poison0 = jnp.zeros(chars.shape[0], bool)
            start, out, poison = jax.lax.while_loop(
                cond, body, (start0, out0, poison0)
            )
            # over-limit words: single UNK at position 0 (or nothing)
            cols = jax.lax.broadcasted_iota(jnp.int32, chars.shape, 1)
            out = jnp.where(
                (cols == 0) & over[:, None] & (unk >= 0), unk, out
            )
            count = jnp.sum((out >= 0).astype(jnp.int32), axis=1)
            return out, count, poison

        return jax.jit(fn)

    def tokenize_words(self, words: list[str]) -> list[list[int]] | None:
        """Greedy longest-match for a batch of words; None rows never
        occur — poisoned words (verify failure, ~impossible) are
        re-tokenized via the caller-provided host model by returning the
        poison indices."""
        import jax

        n = len(words)
        if n == 0:
            return []
        B = 1
        while B < n:
            B <<= 1
        B = max(B, 8)
        chars = np.full((B, _W), -1, np.int32)
        lens = np.zeros(B, np.int32)
        skipped: list[int] = []
        for i, w in enumerate(words):
            cps = [ord(c) for c in w][:_W]
            if len(w) > _W and len(w) <= self.t.max_input_chars:
                # longer than lanes but under the UNK limit: host path
                skipped.append(i)
                continue
            chars[i, : len(cps)] = cps
            lens[i] = min(len(w), _W)
        out, count, poison = self._fn(chars, lens)
        out = np.asarray(out)
        poison = np.asarray(poison)
        rows: list[list[int]] = []
        for i in range(n):
            rows.append(out[i, out[i] >= 0].tolist())
        self.last_poisoned = [i for i in range(n) if poison[i]] + skipped
        return rows


def build_wordlevel_tables(model) -> WordPieceDeviceTables | None:
    """Tables for a models.wordlevel.WordLevelModel: whole-word hash ->
    CHD -> id with exact verify (models.rs:316-362).  Reuses the
    WordPiece table layout with no continuation seeds."""
    vocab = model.vocab
    if not vocab:
        return None
    keys: dict[tuple[int, int], int] = {}
    Lt = 1
    slot_chars: list[list[int]] = []
    slot_emit: list[int] = []
    for tok, tid in vocab.items():
        chars = [ord(c) for c in tok]
        if not chars or len(chars) > _W:
            # empty or over-wide vocab tokens: host lookup only
            return None
        Lt = max(Lt, len(chars))
        h1 = int(_poly_hash_np(chars, _B1, np.uint32(0)))
        h2 = int(_poly_hash_np(chars, _B2, np.uint32(0)))
        key = (
            h1 if h1 < 1 << 31 else h1 - (1 << 32),
            h2 if h2 < 1 << 31 else h2 - (1 << 32),
        )
        if key in keys:
            return None
        keys[key] = len(slot_chars)
        slot_chars.append(chars)
        slot_emit.append(tid)
    chd = build_chd_table(keys)
    if chd is None:
        return None
    S = len(slot_chars)
    token_chars = np.full((S, Lt), -1, np.int32)
    token_lens = np.zeros(S, np.int32)
    for slot, chars in enumerate(slot_chars):
        token_chars[slot, : len(chars)] = chars
        token_lens[slot] = len(chars)
    unk_id = vocab.get(model.unk_token, 0)
    return WordPieceDeviceTables(
        chd=chd,
        token_chars=token_chars,
        token_lens=token_lens,
        emit_ids=np.asarray(slot_emit, np.int32),
        max_token_len=Lt,
        unk_id=int(unk_id),
        max_input_chars=1 << 30,
    )


class WordLevelDevice:
    """One whole-word CHD probe + exact verify per word; UNK on miss."""

    def __init__(self, tables: WordPieceDeviceTables):
        import jax.numpy as jnp

        self.t = tables
        self.disp = jnp.asarray(tables.chd.disp)
        self.rows = jnp.asarray(tables.chd.rows)
        self.token_chars = jnp.asarray(tables.token_chars)
        self.token_lens = jnp.asarray(tables.token_lens)
        self.emit_ids = jnp.asarray(tables.emit_ids)

    @functools.cached_property
    def _fn(self):
        import jax
        import jax.numpy as jnp

        from ..utils.jax_setup import setup_compilation_cache
        from .hashtable import chd_lookup_jnp

        setup_compilation_cache()
        t = self.t
        disp, rows = self.disp, self.rows
        token_chars, token_lens = self.token_chars, self.token_lens
        emit_ids = self.emit_ids
        size, n_buckets = t.chd.size, t.chd.n_buckets
        Lt = t.max_token_len
        unk = jnp.int32(t.unk_id)

        def fn(chars, lens):
            B, W = chars.shape
            u = jnp.where(chars >= 0, chars.astype(jnp.uint32) + 1, 0)

            def whole_hash(base):
                def step(h, c):
                    h2 = jnp.where(c > 0, h * base + c, h)
                    return h2, None
                h, _ = jax.lax.scan(step, jnp.zeros(B, jnp.uint32), u.T)
                return h

            h1 = whole_hash(_B1).astype(jnp.int32)
            h2 = whole_hash(_B2).astype(jnp.int32)
            valid = lens > 0
            tid = chd_lookup_jnp(disp, rows, size, n_buckets, h1, h2, valid)
            hit = tid != INF_RANK
            safe = jnp.maximum(tid, 0)
            within = (
                jax.lax.broadcasted_iota(jnp.int32, (B, Lt), 1)
                < lens[:, None]
            )
            trow = token_chars[jnp.where(hit, safe, 0)]
            ok = (
                jnp.all(
                    jnp.where(within, trow == chars[:, :Lt], True), axis=1
                )
                & (token_lens[jnp.where(hit, safe, 0)] == lens)
                & (lens <= Lt)
            )
            out = jnp.where(hit & ok, emit_ids[safe], unk)
            return jnp.where(valid, out, -1)

        return jax.jit(fn)

    def lookup_words(self, words: list[str]) -> list[int]:
        n = len(words)
        if n == 0:
            return []
        B = 8
        while B < n:
            B <<= 1
        chars = np.full((B, _W), -1, np.int32)
        lens = np.zeros(B, np.int32)
        long_idx = []
        for i, w in enumerate(words):
            cps = [ord(c) for c in w]
            if len(cps) > _W:
                long_idx.append(i)
                continue
            chars[i, : len(cps)] = cps
            lens[i] = len(cps)
        out = np.asarray(self._fn(chars, lens))[:n].tolist()
        for i in long_idx:  # longer than the lane width: host lookup
            out[i] = self.t.unk_id
        return out
