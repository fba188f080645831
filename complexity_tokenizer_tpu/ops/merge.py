"""The BPE merge kernel: segmented-min rank selection over tombstone chains.

The reference's hot loop (bpe.rs:104-153) scans all adjacent pairs, merges
the leftmost occurrence of the lowest-rank pair, and repeats — O(n^2) hash
probes per word, one merge per iteration.

TPU design (v2, tombstone layout — no per-iteration compaction):

- tokens stay at their original byte positions forever; merged-away slots
  become tombstones (-1).  ``word_id`` from the pre-split is static, so the
  per-word segment structure (and its scan masks) is computed ONCE;
- each iteration: a reverse-cummin scan finds every slot's next-alive
  neighbor, pair ranks come from hash-table gathers, two segmented scans
  give each word's best rank at every position, and a match is applied iff
  its chain-predecessor is not also a match (run-leading selection);
- merged slots take the minted id, their partners become tombstones via a
  prev-alive gather — all elementwise ops and scans, nothing sorted;
- the final ragged extraction (drop tombstones) happens on the host.

Run-leading selection vs the reference's leftmost-first: within one word
and one iteration only non-overlapping occurrences of the word's single
best pair are applied, leading occurrence first; an overlapping chain like
"aaa" resolves across iterations in the same left-to-right order, so ids
match the reference exactly (for well-formed tables, see
core.bpe.merges_well_formed — new pairs always rank after the applied
rank, so the applied-rank sequence is identical).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .hashtable import INF_RANK, lookup_ranks_jnp

__all__ = ["merge_words", "seed_tokens"]


def _shift_left(x, fill):
    pad = jnp.full(x.shape[:-1] + (1,), fill, dtype=x.dtype)
    return jnp.concatenate([x[..., 1:], pad], axis=-1)


def _shift_right(x, fill):
    pad = jnp.full(x.shape[:-1] + (1,), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


def _seg_comb(x, y):
    vx, fx = x
    vy, fy = y
    return jnp.where(fy, vy, jnp.minimum(vx, vy)), fx | fy


def _segmented_min(rank, seg_start, seg_end):
    """Per-position min over each (static) segment via two scans."""
    axis = rank.ndim - 1
    fwd, _ = jax.lax.associative_scan(_seg_comb, (rank, seg_start), axis=axis)
    bwd, _ = jax.lax.associative_scan(
        _seg_comb, (rank, seg_end), axis=axis, reverse=True
    )
    return jnp.minimum(fwd, bwd)


def seed_tokens(byte_arr, word_id, valid, byte_token_table):
    """bytes -> initial token ids at their byte positions.

    OOV bytes (alphabet char not in vocab) become tombstones immediately,
    matching the reference's silent char drop (bpe.rs:94-97) — the merge
    chain simply skips them.
    """
    tokens = byte_token_table[byte_arr.astype(jnp.int32)]
    tokens = jnp.where(valid, tokens, -1)
    return tokens, word_id


@functools.partial(jax.jit, static_argnames=("table_size", "max_probes"))
def merge_words(
    tokens,
    wid,
    key_a,
    key_b,
    rank_arr,
    merge_new,
    table_size: int,
    max_probes: int,
):
    """Run the merge loop to fixpoint on the tombstone layout.

    Args:
      tokens: [B, L] int32, -1 = tombstone/pad, positions never move.
      wid: [B, L] int32 static word ids (-1 past end).
    Returns:
      (tokens, count): scattered ids (-1 tombstones, original order) and
      per-row live counts.
    """
    B, L = tokens.shape
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    axis = 1

    # static per-word segment masks
    wid_prev = _shift_right(wid, jnp.int32(-2))
    seg_start = wid != wid_prev
    seg_end = _shift_left(seg_start, True)

    def chain_neighbors(alive):
        """(next_alive_idx, prev_alive_idx) along each row; L / -1 absent."""
        ai = jnp.where(alive, idx, L)
        nxt_incl = jax.lax.cummin(ai, axis=axis, reverse=True)
        nxt = _shift_left(nxt_incl, jnp.int32(L))
        pi = jnp.where(alive, idx, -1)
        prv_incl = jax.lax.cummax(pi, axis=axis)
        prv = _shift_right(prv_incl, jnp.int32(-1))
        return nxt, prv

    def pair_info(t, alive):
        nxt, prv = chain_neighbors(alive)
        has_next = nxt < L
        j = jnp.minimum(nxt, L - 1)
        t_next = jnp.take_along_axis(t, j, axis=axis)
        w_next = jnp.take_along_axis(wid, j, axis=axis)
        pair_valid = alive & has_next & (w_next == wid) & (wid >= 0)
        r = lookup_ranks_jnp(
            (key_a, key_b, rank_arr), max_probes, table_size, t, t_next, pair_valid
        )
        return r, nxt, prv

    def cond(state):
        _, any_left = state
        return any_left

    def body(state):
        t, _ = state
        alive = t >= 0
        r, nxt, prv = pair_info(t, alive)
        segmin = _segmented_min(r, seg_start, seg_end)
        is_best = (r == segmin) & (segmin < INF_RANK)
        # run-leading selection: apply iff chain-predecessor isn't a match
        pv = jnp.maximum(prv, 0)
        prev_best = jnp.take_along_axis(is_best, pv, axis=axis) & (prv >= 0)
        selected = is_best & ~prev_best
        new_id = merge_new[jnp.where(selected, r, 0)]
        t2 = jnp.where(selected, new_id, t)
        # partner slots (chain-successors of selected) become tombstones
        prev_selected = jnp.take_along_axis(selected, pv, axis=axis) & (prv >= 0)
        t2 = jnp.where(prev_selected & alive, -1, t2)
        # loop until an iteration applies nothing (one trailing no-op pass)
        return (t2, jnp.any(selected))

    tokens, _ = jax.lax.while_loop(
        cond, body, (tokens, jnp.array(True))
    )
    count = jnp.sum((tokens >= 0).astype(jnp.int32), axis=axis)
    return tokens, count
