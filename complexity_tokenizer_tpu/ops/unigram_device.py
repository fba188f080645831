"""Device Unigram: Viterbi segmentation as a jitted scan (SURVEY C17).

The reference's Viterbi is a per-text O(n²) scalar DP over all substring
splits with a single-char UNK fallback scored ``min_score - 10``
(models.rs:225-269).  TPU-native formulation:

- Texts live as codepoint rows ``[B, W]``; substring scores come from the
  same rolling-hash + CHD machinery as the WordPiece kernel
  (ops/wordpiece_device.py), with piece log-probs in a dense ``[V]``
  float32 table gathered by id.  Candidate lengths are bounded by the
  vocab's longest piece — longer substrings can never be in the vocab, so
  the bound is exact.
- The forward DP is one ``lax.scan`` over end positions: each step scores
  all candidate lengths for every row at once (one CHD probe each) and
  records the argmax (ties -> smallest start, matching the reference's
  strict-improvement update order).
- The chosen candidate at every end position is verified exactly against
  the packed piece-codepoint table; any hash collision that could have
  influenced the DP is by construction among the chosen candidates, so a
  verify failure poisons the row and the caller re-segments it on host.
- The reference accumulates path scores in f64 (models.rs:234); the device
  DP runs in f32, so every argmax decision whose margin falls inside the
  accumulated-f32-error bound also poisons the row — rows where f32 could
  disagree with f64 (including exact ties from equal piece multisets) are
  re-segmented on host, keeping the tier bit-exact by construction.
- Backtracking is a second pass emitting ids at their start positions
  (tombstone layout), so extraction preserves order with no reversal.

The DP core is exposed as :func:`make_viterbi_fn` so the Unigram *trainer*
E-step (parallel/unigram_trainer.py) can run the identical program under
``shard_map`` — single-char fallbacks are emitted as ``-2`` there so
expected-count histograms can exclude them (the reference's trainer counts
fallback substrings under their own spelling, which is by construction
never a live vocab piece; trainers.rs:427-472).
"""

from __future__ import annotations

import functools

import numpy as np

from .hashtable import INF_RANK, build_chd_table
from .wordpiece_device import (_B1, _B2, _W, _poly_hash_np,
                               rolling_prefix_hashes)

__all__ = ["build_unigram_tables", "UnigramDevice", "make_viterbi_fn",
           "build_piece_tables"]

_NEG = np.float32(-1e30)
FALLBACK_ID = -2  # single-char fallback marker in the output rows


def build_piece_tables(pieces: dict[str, tuple[int, float]]):
    """(chd, piece_chars, piece_lens, piece_scores, Lt) for a piece ->
    (id, score) map; None if ineligible (hash collision, oversized piece,
    empty)."""
    if not pieces:
        return None
    max_id = max(i for i, _ in pieces.values())
    if max_id > 2_000_000:
        return None
    keys: dict[tuple[int, int], int] = {}
    Lt = 1
    rows_by_id: dict[int, tuple[list[int], float]] = {}
    for tok, (tid, score) in pieces.items():
        chars = [ord(c) for c in tok]
        if not chars:
            continue
        if len(chars) > _W:
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
        keys[key] = tid
        rows_by_id[tid] = (chars, float(score))
    chd = build_chd_table(keys)
    if chd is None:
        return None
    piece_chars = np.full((max_id + 1, Lt), -1, np.int32)
    piece_lens = np.zeros(max_id + 1, np.int32)
    piece_scores = np.full(max_id + 1, float(_NEG), np.float32)
    for tid, (chars, score) in rows_by_id.items():
        piece_chars[tid, : len(chars)] = chars
        piece_lens[tid] = len(chars)
        piece_scores[tid] = score
    return chd, piece_chars, piece_lens, piece_scores, Lt


def build_unigram_tables(model):
    """(chd, piece_chars, piece_lens, piece_scores, max_len, unk_id,
    min_score) for a models.unigram.UnigramModel; None if ineligible."""
    built = build_piece_tables(model.vocab)
    if built is None:
        return None
    chd, piece_chars, piece_lens, piece_scores, Lt = built
    return (chd, piece_chars, piece_lens, piece_scores, Lt,
            int(model.unk_id), float(model.min_score))


def make_viterbi_fn(size: int, n_buckets: int, Lt: int, maxcand: int):
    """Build the pure Viterbi DP program (jit/shard_map it yourself).

    ``fn(disp, rows, piece_chars, piece_lens, piece_scores,
    fallback_score, chars, lens) -> (out, count, poison)`` where ``out``
    is ``[B, W]`` int32 holding piece ids at their start positions,
    ``FALLBACK_ID`` (-2) for single-char fallbacks, -1 elsewhere;
    ``count[b]`` = emitted entries; ``poison[b]`` flags rows whose device
    result is not guaranteed bit-equal to the f64 host DP (hash-collision
    verify failure or an argmax margin inside the f32 error bound).

    Statics: CHD geometry (``size``/``n_buckets``), packed piece width
    ``Lt``, and ``maxcand`` — the candidate-length bound (the model DP
    uses the longest piece; the trainer DP additionally caps at its
    ``max_piece_length``, trainers.rs:497).
    """
    import jax
    import jax.numpy as jnp

    from .hashtable import chd_lookup_jnp

    def fn(disp, rows, piece_chars, piece_lens, piece_scores,
           fallback_score, chars, lens):
        B, W = chars.shape
        maxlen = min(maxcand, W)
        P1, P2, pow1, pow2 = rolling_prefix_hashes(chars)
        lens_i = lens.astype(jnp.int32)
        ls = jnp.arange(1, maxlen + 1, dtype=jnp.int32)  # [L]
        fb = fallback_score.astype(jnp.float32)

        # forward DP over end = 1..W
        def step(carry, end):
            best = carry  # [B, W+1] float32
            starts = end - ls  # [L], ascending length = descending start
            ok = (starts >= 0) & (end <= lens_i)[:, None]
            s_c = jnp.clip(starts, 0, W)[None, :].repeat(B, 0)
            e_col = jnp.full((B, 1), end, jnp.int32)
            pe1 = jnp.take_along_axis(P1, e_col, axis=1)  # [B,1]
            pe2 = jnp.take_along_axis(P2, e_col, axis=1)
            ps1 = jnp.take_along_axis(P1, s_c, axis=1)  # [B,L]
            ps2 = jnp.take_along_axis(P2, s_c, axis=1)
            h1 = (pe1 - ps1 * pow1[ls][None, :]).astype(jnp.int32)
            h2 = (pe2 - ps2 * pow2[ls][None, :]).astype(jnp.int32)
            tid = chd_lookup_jnp(disp, rows, size, n_buckets, h1, h2, ok)
            hit = tid != INF_RANK
            safe = jnp.maximum(tid, 0)
            sc = jnp.where(hit, piece_scores[safe], _NEG)
            # correct-length guard (hash alone does not pin the length)
            sc = jnp.where(piece_lens[safe] == ls[None, :], sc, _NEG)
            # single-char fallback (models.rs:241-242, trainers.rs:508)
            is_fb = (ls[None, :] == 1) & ~hit & ok
            sc = jnp.where(is_fb, fb, sc)
            tid = jnp.where(is_fb, jnp.int32(FALLBACK_ID), tid)
            prev = jnp.take_along_axis(best, s_c, axis=1)  # [B,L]
            total = jnp.where(ok & (sc > _NEG / 2), prev + sc, _NEG)
            # Ties -> smallest start: the reference iterates start
            # ascending and updates on strict improvement, so the
            # smallest start (largest candidate length) wins.  Lanes
            # are ascending length = descending start, so pick the
            # LAST max: argmax over the flipped lanes.
            k = (maxlen - 1) - jnp.argmax(total[:, ::-1], axis=1)
            chosen_total = jnp.take_along_axis(total, k[:, None], 1)[:, 0]
            chosen_tid = jnp.take_along_axis(tid, k[:, None], 1)[:, 0]
            chosen_len = k.astype(jnp.int32) + 1
            valid = chosen_total > _NEG / 2
            newcol = jnp.where(valid, chosen_total, _NEG)
            best = jax.lax.dynamic_update_slice_in_dim(
                best, newcol[:, None], end, axis=1
            )
            out_t = jnp.where(valid, chosen_tid, -1)
            # fallbacks carry length -1 so the verify pass can tell them
            # apart from a genuine piece match
            out_l = jnp.where(
                valid,
                jnp.where(chosen_tid == FALLBACK_ID, -1, chosen_len),
                0,
            )
            # decision margin vs the runner-up: if it is inside the
            # f32 accumulated-error bound, f64 might have decided
            # differently -> ambiguous
            masked = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, total.shape, 1)
                == k[:, None],
                _NEG, total,
            )
            runner = jnp.max(masked, axis=1)
            margin = chosen_total - runner
            eps = 1e-4 * (1.0 + jnp.abs(chosen_total))
            ambiguous = valid & (runner > _NEG / 2) & (margin < eps)
            return best, (out_t, out_l, ambiguous)

        best0 = jnp.full((B, W + 1), _NEG, jnp.float32)
        best0 = best0.at[:, 0].set(0.0)
        ends = jnp.arange(1, W + 1, dtype=jnp.int32)
        _, (tids, lsel, amb) = jax.lax.scan(step, best0, ends)
        tids = tids.T  # [B, W], entry for end=i+1
        lsel = lsel.T
        ambiguous_row = jnp.any(amb.T, axis=1)

        # verify chosen candidates (collision guard): compare each
        # chosen piece's chars against the text
        ends_b = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1) + 1
        starts_b = ends_b - jnp.maximum(lsel, 1)
        safe_t = jnp.maximum(tids, 0)
        is_piece = (tids >= 0) & (lsel > 0)
        tmat = piece_chars[safe_t]  # [B, W, Lt], one gather
        poison = jnp.zeros(B, bool)
        for j in range(Lt):
            pos = jnp.clip(starts_b + j, 0, W - 1)
            cchar = jnp.take_along_axis(chars, pos, axis=1)
            need = is_piece & (j < lsel)
            poison = poison | jnp.any(need & (tmat[:, :, j] != cchar), axis=1)

        # backtrack: emit at start positions (tombstone layout)
        def bt_body(state):
            pos, out, _ = state
            active = pos > 0
            idx = jnp.clip(pos - 1, 0, W - 1)[:, None]
            t_here = jnp.take_along_axis(tids, idx, axis=1)[:, 0]
            l_here = jnp.take_along_axis(lsel, idx, axis=1)[:, 0]
            l_here = jnp.where(l_here < 0, 1, jnp.maximum(l_here, 1))
            start = pos - l_here
            cols = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
            out = jnp.where(
                (cols == start[:, None]) & active[:, None],
                t_here[:, None], out,
            )
            pos = jnp.where(active, start, pos)
            return pos, out, active

        pos0 = jnp.minimum(lens_i, W)
        out0 = jnp.full((B, W), -1, jnp.int32)
        _, out, _ = jax.lax.while_loop(
            lambda s: jnp.any(s[0] > 0), bt_body,
            (pos0, out0, jnp.zeros(B, bool)),
        )
        count = jnp.sum((out != -1).astype(jnp.int32), axis=1)
        return out, count, poison | ambiguous_row

    return fn


class UnigramDevice:
    """Jitted Viterbi segmentation over codepoint rows."""

    def __init__(self, tables):
        import jax.numpy as jnp

        (chd, piece_chars, piece_lens, piece_scores, Lt, unk_id,
         min_score) = tables
        self.chd = chd
        self.Lt = Lt
        self.unk_id = unk_id
        self.min_score = min_score
        self.disp = jnp.asarray(chd.disp)
        self.rows = jnp.asarray(chd.rows)
        self.piece_chars = jnp.asarray(piece_chars)
        self.piece_lens = jnp.asarray(piece_lens)
        self.piece_scores = jnp.asarray(piece_scores)

    @functools.cached_property
    def _fn(self):
        import jax
        import jax.numpy as jnp

        from ..utils.jax_setup import setup_compilation_cache

        setup_compilation_cache()
        core = make_viterbi_fn(
            self.chd.size, self.chd.n_buckets, self.Lt, self.Lt
        )
        disp, rows = self.disp, self.rows
        piece_chars = self.piece_chars
        piece_lens = self.piece_lens
        piece_scores = self.piece_scores
        unk = jnp.int32(self.unk_id)
        min_score = jnp.float32(self.min_score)

        def fn(chars, lens):
            out, count, poison = core(
                disp, rows, piece_chars, piece_lens, piece_scores,
                min_score, chars, lens,
            )
            # the model emits its UNK id for single-char fallbacks
            # (models.rs:241-242)
            out = jnp.where(out == FALLBACK_ID, unk, out)
            return out, count, poison

        return jax.jit(fn)

    def tokenize_texts(self, texts: list[str]) -> list[list[int]]:
        """Viterbi segmentation for a batch; poisoned/oversized rows are
        recorded in ``last_poisoned`` for host re-segmentation."""
        n = len(texts)
        if n == 0:
            self.last_poisoned = []
            return []
        B = 8
        while B < n:
            B <<= 1
        chars = np.full((B, _W), -1, np.int32)
        lens = np.zeros(B, np.int32)
        skipped: list[int] = []
        for i, t in enumerate(texts):
            cps = [ord(c) for c in t]
            if len(cps) > _W:
                skipped.append(i)
                continue
            chars[i, : len(cps)] = cps
            lens[i] = len(cps)
        out, count, poison = self._fn(chars, lens)
        out = np.asarray(out)
        poison = np.asarray(poison)
        rows = [out[i, out[i] >= 0].tolist() for i in range(n)]
        self.last_poisoned = [i for i in range(n) if poison[i]] + skipped
        return rows
