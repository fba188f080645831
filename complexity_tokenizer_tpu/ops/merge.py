"""The BPE merge kernel: segmented-min rank selection + batch apply.

The reference's hot loop (bpe.rs:104-153) scans all adjacent pairs, merges
the leftmost occurrence of the lowest-rank pair, and repeats — O(n^2) hash
probes per word, one merge per iteration.

The TPU design instead runs, per iteration over the whole ``[B, L]`` batch:

1. pair-rank lookup for every adjacent live pair (hash gathers);
2. segmented min over each *word* (two segmented scans) — every word finds
   its own best rank simultaneously;
3. batch-apply every non-overlapping occurrence of each word's best pair
   (leftmost-priority via run-parity selection);
4. compact dead slots out (stable argsort on the lane axis).

Equivalence to the reference's one-at-a-time loop holds for *well-formed*
merge tables (any pair containing merge r's product ranks after r):
new pairs created by applying rank r can never beat r, so the applied-rank
sequence and leftmost ordering are identical.  ``core.bpe.merges_well_formed``
gates this at table-build time; ill-formed tables fall back to the host
path.  Iteration count is max merges-per-word (~word length), not text
length, because every word progresses every step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .hashtable import INF_RANK, lookup_ranks_jnp

__all__ = ["merge_words", "seed_tokens"]


def _shift_left(x, fill):
    pad = jnp.full(x.shape[:-1] + (1,), fill, dtype=x.dtype)
    return jnp.concatenate([x[..., 1:], pad], axis=-1)


def _shift_right(x, fill):
    pad = jnp.full(x.shape[:-1] + (1,), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


def _segmented_min(rank, seg_start):
    """Min over each segment, at every position of the segment.

    ``seg_start`` marks segment beginnings along the lane axis.  Uses two
    associative scans (forward prefix-min with reset, backward suffix-min
    with reset); their elementwise min is the full-segment min.
    """

    def comb(x, y):
        vx, fx = x
        vy, fy = y
        return jnp.where(fy, vy, jnp.minimum(vx, vy)), fx | fy

    axis = rank.ndim - 1
    fwd, _ = jax.lax.associative_scan(comb, (rank, seg_start), axis=axis)
    # backward: segment "starts" are the positions where the *next* element
    # begins a new segment (i.e. segment ends)
    seg_end = _shift_left(seg_start, True)
    bwd, _ = jax.lax.associative_scan(
        comb, (rank, seg_end), axis=axis, reverse=True
    )
    return jnp.minimum(fwd, bwd)


def _compact(tokens, wid):
    """Stable-move dead slots (token < 0) to the end of each row."""
    dead = (tokens < 0).astype(jnp.int32)
    order = jnp.argsort(dead, axis=-1, stable=True)
    return (
        jnp.take_along_axis(tokens, order, axis=-1),
        jnp.take_along_axis(wid, order, axis=-1),
    )


def seed_tokens(byte_arr, word_id, valid, byte_token_table):
    """bytes -> initial token ids (+ aligned word ids), OOV bytes dropped.

    ``byte_token_table`` is the 256-entry byte -> vocab-id map (-1 = the
    byte's alphabet char is not in the vocab; dropped silently, matching
    bpe.rs:94-97).  Dead slots are compacted to row ends.
    """
    tokens = byte_token_table[byte_arr.astype(jnp.int32)]
    tokens = jnp.where(valid, tokens, -1)
    wid = jnp.where(tokens >= 0, word_id, -1)
    tokens, wid = _compact(tokens, wid)
    wid = jnp.where(tokens >= 0, wid, -1)
    return tokens, wid


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
    """Run the merge loop to fixpoint.

    Args:
      tokens: [B, L] int32, -1 for dead/pad, compacted.
      wid: [B, L] int32 word ids (-1 on dead slots).
      key_a/key_b/rank_arr: pair hash table arrays.
      merge_new: [R] int32 rank -> minted token id.
    Returns:
      (tokens, count): compacted ids (-1 padded) and per-row live counts.
    """
    L = tokens.shape[-1]
    idx = jnp.arange(L, dtype=jnp.int32)

    def pair_ranks(t, w):
        t_next = _shift_left(t, -1)
        w_next = _shift_left(w, -1)
        pair_valid = (t >= 0) & (t_next >= 0) & (w == w_next) & (w >= 0)
        r = lookup_ranks_jnp(
            (key_a, key_b, rank_arr), max_probes, table_size, t, t_next, pair_valid
        )
        return r, pair_valid

    def cond(state):
        t, w, any_left = state
        return any_left

    def body(state):
        t, w, _ = state
        r, pair_valid = pair_ranks(t, w)
        seg_start = w != _shift_right(w, jnp.int32(-2))
        segmin = _segmented_min(r, seg_start)
        is_best = pair_valid & (r == segmin) & (segmin < INF_RANK)
        # leftmost-priority non-overlap: in any run of consecutive matches
        # (only possible for a==b pairs) take even offsets from run start
        not_best_idx = jnp.where(is_best, -1, idx[None, :])
        last_nonbest = jax.lax.cummax(not_best_idx, axis=not_best_idx.ndim - 1)
        offset = idx[None, :] - last_nonbest - 1
        selected = is_best & (offset % 2 == 0)

        new_id = merge_new[jnp.where(selected, r, 0)]
        t = jnp.where(selected, new_id, t)
        kill = _shift_right(selected, False)
        t = jnp.where(kill, -3, t)
        w2 = jnp.where(t >= 0, w, -1)
        t, w2 = _compact(t, w2)
        w2 = jnp.where(t >= 0, w2, -1)
        r2, _ = pair_ranks(t, w2)
        return t, w2, jnp.any(r2 < INF_RANK)

    r0, _ = pair_ranks(tokens, wid)
    tokens, wid, _ = jax.lax.while_loop(
        cond, body, (tokens, wid, jnp.any(r0 < INF_RANK))
    )
    count = jnp.sum((tokens >= 0).astype(jnp.int32), axis=-1)
    return tokens, count
