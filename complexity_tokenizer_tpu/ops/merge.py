"""The BPE merge kernel: local-minima parallel apply over tombstone chains.

The reference's hot loop (bpe.rs:104-153) scans all adjacent pairs, merges
the leftmost occurrence of the lowest-rank pair, and repeats — O(n^2) hash
probes per word, one merge per iteration.

TPU design (v3):

- **tombstone layout**: tokens stay at their byte positions; merged-away
  slots become -1.  Nothing is compacted or sorted inside the loop; the
  ragged extraction happens once on the host.
- **carry scans instead of gathers**: every neighbor relation (next-alive
  token/word, neighbor pair ranks, partner kill) is a first/last-valid
  associative scan along the lane axis — scans are nearly free on TPU
  while data-dependent gathers are the dominant cost.
- **pair-table rank lookup**: a packed-row two-choice cuckoo table
  resolves pair -> (rank, minted id) with two INDEPENDENT [m,2] u32 row
  gathers (they overlap on-chip; chosen by on-chip A/B over CHD and a
  quotient-compressed variant, PROFILE.md round 4).  A CHD perfect-hash
  table (serial displacement -> [T,4] row chain) remains the fallback
  for vocabs whose ids/ranks exceed u16 packing.
- **per-word minimum-rank apply**: each iteration merges, in every word
  simultaneously, all non-overlapping occurrences of that word's
  lowest-rank pair (leading occurrence first in overlapping runs).  This
  is the only locally-decidable rule that is provably order-equivalent to
  the reference's global lowest-rank-first loop: any pair created by
  applying rank r ranks after r (well-formed tables,
  core.bpe.merges_well_formed), so a word's current minimum can never be
  preempted.  A tempting stronger rule — merge every *local* rank
  minimum — is unsound: with state [Ġ, Mi, x, ed] and ranks
  (Ġ,Mi)=353, (x,ed)=242, merging the locally-minimal (Ġ,Mi) is wrong
  because (x,ed) later forms (Mi,xed)=331 < 353, which the sequential
  loop merges first.  The per-word min is computed by two segmented scans
  over the static word segments.  Diff-tested against the host oracle in
  tests/test_device_encode.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .hashtable import INF_RANK, chd_lookup_rows_jnp, qc_lookup_jnp

__all__ = [
    "merge_words",
    "merge_words_qc",
    "merge_word_rows",
    "merge_word_rows_qc",
    "seed_tokens",
    "phased_merge_words",
]


def _shift_left(x, fill):
    pad = jnp.full(x.shape[:-1] + (1,), fill, dtype=x.dtype)
    return jnp.concatenate([x[..., 1:], pad], axis=-1)


def _shift_right(x, fill):
    pad = jnp.full(x.shape[:-1] + (1,), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


def _carry_last(v, valid, axis):
    """Inclusive forward carry: value at the last valid position <= i."""

    def comb(x, y):
        vx, fx = x
        vy, fy = y
        return jnp.where(fy, vy, vx), fx | fy

    out, _ = jax.lax.associative_scan(comb, (v, valid), axis=axis)
    return out


def _carry_first(v, valid, axis):
    """Inclusive reverse carry: value at the first valid position >= i.

    NB: jax's reverse associative_scan passes the NEARER element (lower
    original index) as the combine's second argument, so both directions
    use the same prefer-second combine.
    """

    def comb(x, y):
        vx, fx = x
        vy, fy = y
        return jnp.where(fy, vy, vx), fx | fy

    out, _ = jax.lax.associative_scan(comb, (v, valid), axis=axis, reverse=True)
    return out


def _carry_first2(v1, v2, valid, axis):
    def comb(x, y):
        a1, a2, fx = x
        b1, b2, fy = y
        return jnp.where(fy, b1, a1), jnp.where(fy, b2, a2), fx | fy

    o1, o2, _ = jax.lax.associative_scan(
        comb, (v1, v2, valid), axis=axis, reverse=True
    )
    return o1, o2


def seed_tokens(byte_arr, word_id, valid, byte_token_table):
    """bytes -> initial token ids at their byte positions.

    OOV bytes (alphabet char not in vocab) become tombstones immediately,
    matching the reference's silent char drop (bpe.rs:94-97) — the merge
    chain simply skips them.
    """
    tokens = byte_token_table[byte_arr.astype(jnp.int32)]
    tokens = jnp.where(valid, tokens, -1)
    return tokens, word_id


def _word_rows_fixpoint(tokens, lookup):
    """Shared fixpoint for the word-flattened layout (one word per row):
    no word-id carries, and the per-word minimum rank is a plain row
    reduction instead of two segmented scans.  ``lookup(a, b, valid) ->
    (rank, minted)`` is the pair-table probe (CHD or quotient-cuckoo)."""
    axis = tokens.ndim - 1

    def body(state):
        t, _ = state
        alive = t >= 0
        tn_incl = _carry_first(t, alive, axis)
        t_next = _shift_left(tn_incl, jnp.int32(-1))
        pair_valid = alive & (t_next >= 0)
        r, minted = lookup(t, t_next, pair_valid)
        rowmin = jnp.min(r, axis=axis, keepdims=True)
        is_best = (r == rowmin) & (rowmin < INF_RANK) & pair_valid
        # overlapping-run resolution (a==b runs): leading occurrence wins
        prev_best = _shift_right(_carry_last(is_best, alive, axis), False)
        selected = is_best & ~prev_best
        t2 = jnp.where(selected, minted, t)
        killed = alive & _shift_right(_carry_last(selected, alive, axis), False)
        t2 = jnp.where(killed, -1, t2)
        return t2, jnp.any(selected)

    # initial carry derived from the data, not a literal True: under
    # shard_map the loop's continue flag is varying over the mesh axis
    # (each device's fixpoint ends on its own iteration), and a literal
    # would be unvarying-typed, failing the carry-type check
    always_true = jnp.any(tokens > jnp.int32(-2))
    tokens, _ = jax.lax.while_loop(
        lambda s: s[1], body, (tokens, always_true)
    )
    count = jnp.sum((tokens >= 0).astype(jnp.int32), axis=axis)
    return tokens, count


@functools.partial(jax.jit, static_argnames=("table_size", "n_buckets"))
def merge_word_rows(tokens, disp, rows, table_size: int, n_buckets: int):
    """Word-flattened merge fixpoint over a CHD pair table.

    Args:
      tokens: [B, W] int32, -1 = tombstone/pad; row = one word.
    Returns:
      (tokens, count) as merge_words.
    """

    def lookup(a, b, valid):
        return chd_lookup_rows_jnp(
            disp, rows, table_size, n_buckets, a, b, valid
        )

    return _word_rows_fixpoint(tokens, lookup)


@functools.partial(jax.jit, static_argnames=("size",))
def merge_word_rows_qc(tokens, t1, t2, size: int):
    """Word-flattened merge fixpoint over a two-choice cuckoo pair
    table (two independent row gathers per probe; see ops/hashtable.py
    QcTable for the measured win over the CHD form's serial
    displacement->row chain)."""

    def lookup(a, b, valid):
        return qc_lookup_jnp(t1, t2, size, a, b, valid)

    return _word_rows_fixpoint(tokens, lookup)


def _segmented_fixpoint(tokens, wid, lookup):
    """Shared segmented merge fixpoint on the tombstone layout.

    Args:
      tokens: [B, L] int32, -1 = tombstone/pad, positions never move.
      wid: [B, L] int32 static word ids (-1 past end).
      lookup: (a, b, valid) -> (rank, minted) pair-table probe.
    Returns:
      (tokens, count): scattered ids (-1 tombstones, original order) and
      per-row live counts.
    """
    axis = tokens.ndim - 1
    # static per-word segment boundaries (word ids never move)
    seg_start = wid != _shift_right(wid, jnp.int32(-2))
    seg_end = _shift_left(seg_start, True)

    def _segmin(r):
        # reset-at-flag min; the nearer element is the combine's second
        # argument in BOTH scan directions (see _carry_first note)
        def comb(x, y):
            vx, fx = x
            vy, fy = y
            return jnp.where(fy, vy, jnp.minimum(vx, vy)), fx | fy

        fwd, _ = jax.lax.associative_scan(comb, (r, seg_start), axis=axis)
        bwd, _ = jax.lax.associative_scan(
            comb, (r, seg_end), axis=axis, reverse=True
        )
        return jnp.minimum(fwd, bwd)

    def body(state):
        t, _ = state
        alive = t >= 0
        tn_incl, wn_incl = _carry_first2(t, wid, alive, axis)
        t_next = _shift_left(tn_incl, jnp.int32(-1))
        w_next = _shift_left(wn_incl, jnp.int32(-3))
        pair_valid = alive & (t_next >= 0) & (w_next == wid) & (wid >= 0)
        r, minted = lookup(t, t_next, pair_valid)
        segmin = _segmin(r)
        is_best = (r == segmin) & (segmin < INF_RANK) & pair_valid
        # overlapping-run resolution: suppress a match whose chain-previous
        # pair is also a match (only possible for a==b runs)
        prev_best = _shift_right(_carry_last(is_best, alive, axis), False)
        selected = is_best & ~prev_best
        t2 = jnp.where(selected, minted, t)
        killed = alive & _shift_right(_carry_last(selected, alive, axis), False)
        t2 = jnp.where(killed, -1, t2)
        return t2, jnp.any(selected)

    def cond(state):
        return state[1]

    # data-derived initial carry: see _word_rows_fixpoint (shard_map)
    always_true = jnp.any(tokens > jnp.int32(-2))
    tokens, _ = jax.lax.while_loop(cond, body, (tokens, always_true))
    count = jnp.sum((tokens >= 0).astype(jnp.int32), axis=axis)
    return tokens, count


def _segmented_fixpoint_bounded(tokens, wid, lookup, max_iters: int):
    """First ``max_iters`` iterations of :func:`_segmented_fixpoint`
    (the word may be unfinished — callers continue on a compacted
    layout).  Same body, iteration-capped cond."""
    axis = tokens.ndim - 1
    seg_start = wid != _shift_right(wid, jnp.int32(-2))
    seg_end = _shift_left(seg_start, True)

    def _segmin(r):
        def comb(x, y):
            vx, fx = x
            vy, fy = y
            return jnp.where(fy, vy, jnp.minimum(vx, vy)), fx | fy

        fwd, _ = jax.lax.associative_scan(comb, (r, seg_start), axis=axis)
        bwd, _ = jax.lax.associative_scan(
            comb, (r, seg_end), axis=axis, reverse=True
        )
        return jnp.minimum(fwd, bwd)

    def body(state):
        t, _, it = state
        alive = t >= 0
        tn_incl, wn_incl = _carry_first2(t, wid, alive, axis)
        t_next = _shift_left(tn_incl, jnp.int32(-1))
        w_next = _shift_left(wn_incl, jnp.int32(-3))
        pair_valid = alive & (t_next >= 0) & (w_next == wid) & (wid >= 0)
        r, minted = lookup(t, t_next, pair_valid)
        segmin = _segmin(r)
        is_best = (r == segmin) & (segmin < INF_RANK) & pair_valid
        prev_best = _shift_right(_carry_last(is_best, alive, axis), False)
        selected = is_best & ~prev_best
        t2 = jnp.where(selected, minted, t)
        killed = alive & _shift_right(
            _carry_last(selected, alive, axis), False
        )
        t2 = jnp.where(killed, -1, t2)
        return t2, jnp.any(selected), it + 1

    always_true = jnp.any(tokens > jnp.int32(-2))
    tokens, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < max_iters),
        body,
        (tokens, always_true, jnp.int32(0)),
    )
    return tokens


def phased_merge_words(tokens, wid, lookup, n1: int):
    """Merge fixpoint with mid-fixpoint LANE COMPACTION (VERDICT r4
    item 5): run ``n1`` iterations at full size, compact each row's
    surviving lanes left, slice each row to W/2, and RESHAPE pairs of
    half-rows into full-width rows — the fixpoint finishes on a
    [B/2, W] matrix.  The per-iteration cost of this kernel is the
    pair-table gather over every lane (PROFILE round 4: ~1.2 ms per
    [1024,128] probe pair, insensitive to bytes), so the remaining
    iterations run at half cost.  The lane dim stays W=128 on purpose:
    sub-128 last dims hit a pathological compile path on this backend
    (see ops/wordpath._WORD_W), and the half-row boundary inside a
    fused row is safe — its two sides hold different word ids, and
    pair validity requires equal wid.

    The compaction keeps every word's FIRST lane even when dead (an
    all-OOV word must still occupy a slot so the k-th start flag maps
    to input word k), and a row whose kept lanes exceed W/2 raises
    the spill flag — the caller redispatches that pack through the
    uncompacted full-capacity body, exactly like a cap spill.

    Returns (t_final [B/2, W], wid2 [B/2, W], spill bool).  wid2 is -1
    on non-kept lanes; start flags for the compacted layout are the
    wid2 transitions among wid2 >= 0 lanes and are static across the
    finishing fixpoint (a killed lane keeps its wid).  Flat order of
    the compacted layout preserves the input word order.
    """
    B, W = tokens.shape
    w2 = W // 2
    t = _segmented_fixpoint_bounded(tokens, wid, lookup, n1)
    alive = t >= 0
    # word-start lanes (static; from the ORIGINAL wid layout)
    is_start = (wid >= 0) & (wid != _shift_right(wid, jnp.int32(-2)))
    keep = alive | is_start
    rowcum = jnp.cumsum(keep.astype(jnp.int32), axis=1)
    row_kept = rowcum[:, -1]
    spill = jnp.any(row_kept > w2)
    key = jnp.where(keep, rowcum - 1, jnp.int32(W))
    wid_k = jnp.where(keep, wid, jnp.int32(-1))
    _k, ts, ws = jax.lax.sort(
        (key, t, wid_k), dimension=1, num_keys=1
    )
    ts = ts[:, :w2].reshape(B // 2, W)
    ws = ws[:, :w2].reshape(B // 2, W)
    t_final, _counts = _segmented_fixpoint(ts, ws, lookup)
    return t_final, ws, spill


@functools.partial(jax.jit, static_argnames=("table_size", "n_buckets"))
def merge_words(
    tokens,
    wid,
    disp,
    rows,
    table_size: int,
    n_buckets: int,
):
    """Segmented merge fixpoint over a CHD pair table (fallback form;
    see :func:`merge_words_qc` for the fast path)."""

    def lookup(a, b, valid):
        return chd_lookup_rows_jnp(
            disp, rows, table_size, n_buckets, a, b, valid
        )

    return _segmented_fixpoint(tokens, wid, lookup)


@functools.partial(jax.jit, static_argnames=("size",))
def merge_words_qc(tokens, wid, t1, t2, size: int):
    """Segmented merge fixpoint over a two-choice cuckoo pair table:
    the production device form when the table is eligible (u16
    ids/ranks/minted — every standard trained/loaded BPE).  Replaces
    the reference hot loop bpe.rs:104-153; the probe is 2 INDEPENDENT
    row gathers vs CHD's serial displacement->row chain — measured
    1.94 -> 1.26 ms per fixpoint iteration at [1024,128] on a v5e chip
    (PROFILE.md round 4)."""

    def lookup(a, b, valid):
        return qc_lookup_jnp(t1, t2, size, a, b, valid)

    return _segmented_fixpoint(tokens, wid, lookup)
