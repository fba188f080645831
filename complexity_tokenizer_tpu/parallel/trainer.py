"""Distributed INL-BPE trainer: sharded corpus tensors + psum histograms.

The reference's trainer is rayon fold/reduce pair counting plus a full
par_iter_mut pass per merge (trainer.rs:342-366, 519-588).  The TPU-native
redesign:

- the unique-word corpus lives as a ``[N, W]`` int32 tensor (plus ``[N]``
  freqs), sharded over the mesh ``data`` axis;
- the initial pair histogram is a dense ``[V0*V0]`` scatter-add per shard,
  reduced with ``psum`` (V0 = alphabet+specials, a few hundred);
- each merge step runs one device pass: select all non-overlapping
  occurrences of the chosen pair (same parity machinery as the encode
  kernel), apply them, and emit the *net* pair-count deltas as four dense
  ``[V]`` histograms — destroyed (x,a) / (b,y), created (x',new) /
  (new,y') — reduced with ``psum``.  Net deltas equal the reference's
  sequential bookkeeping because sequential application's total effect on
  pair counts is exactly post-pairs minus pre-pairs; edge double-counting
  between adjacent occurrences is avoided by attributing the shared pair to
  the left edge only;
- merge *selection* (the INL scoring + heap) stays on the host, identical
  on every host because the reduced histogram is identical — no broadcast
  needed (SURVEY §5.8).

Runs unchanged on 1 device, an 8-device CPU mesh, or a multi-host pod
slice.
"""

from __future__ import annotations

import os
import sys
from collections import Counter, defaultdict

import numpy as np

from ..trainers.inl_trainer import InlBpeTrainer, TrainerConfig
from .mesh import DATA_AXIS, data_mesh

__all__ = [
    "DistributedInlTrainer",
    "make_merge_step",
    "make_initial_hist",
    "make_k_merge_steps",
    "make_inl_window_steps",
]


def make_initial_hist(v0: int):
    """jittable: [n, W] words + [n] freqs -> dense [v0*v0] pair histogram."""
    import jax.numpy as jnp

    def fn(words, freqs):
        left = words[:, :-1]
        right = words[:, 1:]
        valid = (left >= 0) & (right >= 0)
        key = jnp.where(valid, left * v0 + right, v0 * v0)
        hist = jnp.zeros(v0 * v0 + 1, dtype=jnp.int32)
        hist = hist.at[key].add(freqs[:, None].astype(jnp.int32))
        return hist[: v0 * v0]

    return fn


def make_merge_step(vocab_bound: int):
    """jittable: apply pair (a,b)->new_id to all rows; emit net deltas.

    Round-4 form: TOMBSTONE layout — merged-away slots become -1 and
    stay in place; every neighbor relation is a carry scan along the
    alive chain (the encode kernel's idiom, ops/merge.py).  The r3 form
    re-compacted each row with a stable argsort per step; sorts are the
    one expensive primitive on TPU while the scans are ~free, and the
    tombstone form is bit-equivalent (the word IS its alive
    subsequence).  The alternation rule for overlapping a==b runs
    (merge occurrences 1st, 3rd, ... left-to-right, exactly the
    reference's sequential pass, trainer.rs:536-588) is a consecutive-
    match counter scan: each lane composes an affine update (reset /
    increment / identity) over the alive chain, and odd counts are
    selected.

    Returns (words', delta [vocab_bound, 4] int32, minted_freq int32):
      kind 0: destroyed (x, a) counts indexed by x
      kind 1: destroyed (b, y) counts indexed by y
      kind 2: created (x', new) counts indexed by x'
      kind 3: created (new, y') counts indexed by y'
    """
    import jax
    import jax.numpy as jnp

    from ..ops.merge import _carry_first, _carry_last, _shift_left, _shift_right

    V = vocab_bound

    def nxt(v, alive):
        """Value at the NEXT alive lane (any fill where none)."""
        return _shift_left(_carry_first(v, alive, 1), jnp.int32(-1))

    def prv(v, alive):
        """Value at the PREVIOUS alive lane (-1/False where none)."""
        return _shift_right(_carry_last(v, alive, 1), jnp.int32(-1))

    def prv_b(v, alive):
        return _shift_right(_carry_last(v, alive, 1), False)

    def nxt_b(v, alive):
        return _shift_left(_carry_first(v, alive, 1), False)

    def fn(words, freqs, a, b, new_id):
        t = words
        alive = t >= 0
        t_next = nxt(t, alive)
        has_next = nxt_b(alive, alive)
        matches = alive & (t == a) & has_next & (t_next == b)

        # consecutive-match count along the alive chain, as an affine
        # composition scan: alive match -> x+1, alive non-match -> 0,
        # tombstone -> identity.  (mult, add) composes associatively:
        # (m2, a2) after (m1, a1) = (m1*m2, a1*m2 + a2).
        mult = jnp.where(alive & ~matches, 0, 1).astype(jnp.int32)
        add = jnp.where(matches, 1, 0).astype(jnp.int32)

        def comb(x, y):
            m1, a1 = x
            m2, a2 = y
            return m1 * m2, a1 * m2 + a2

        _m, cnt = jax.lax.associative_scan(comb, (mult, add), axis=1)
        selected = matches & (cnt % 2 == 1)

        killed = alive & prv_b(selected, alive)

        # neighborhood values BEFORE application
        x_val = prv(t, alive)
        has_prev = prv_b(alive, alive)
        y_val = nxt(t_next, alive)  # two alive steps ahead
        has_y = nxt_b(has_next, alive)
        # previous match chain-adjacent (its partner is our immediate
        # alive predecessor) <=> the lane two alive steps back is a
        # selected match start
        sel_prev2 = prv_b(prv_b(selected, alive), alive)
        # next match start sits AT y and is selected
        sel_next2 = nxt_b(nxt_b(selected, alive), alive)

        f = jnp.broadcast_to(
            freqs[:, None].astype(jnp.int32), t.shape
        )
        left_alive = selected & has_prev
        right_alive = selected & has_y

        delta = jnp.zeros((V, 4), dtype=jnp.int32)
        # destroyed (x, a): always when left neighbor alive
        delta = delta.at[jnp.where(left_alive, x_val, V - 1), 0].add(
            jnp.where(left_alive, f, 0)
        )
        # destroyed (b, y): only when y is not the 'a' of the next match
        dr = right_alive & ~sel_next2
        delta = delta.at[jnp.where(dr, y_val, V - 1), 1].add(
            jnp.where(dr, f, 0)
        )
        # created (x', new): x' = new if previous match adjacent
        xp = jnp.where(sel_prev2, new_id, x_val)
        delta = delta.at[jnp.where(left_alive, xp, V - 1), 2].add(
            jnp.where(left_alive, f, 0)
        )
        # created (new, y'): only when not absorbed by the next match
        delta = delta.at[jnp.where(dr, y_val, V - 1), 3].add(
            jnp.where(dr, f, 0)
        )

        minted = jnp.sum(jnp.where(selected, f, 0))

        # apply in place: replace match starts, tombstone partners
        out = jnp.where(selected, new_id, t)
        out = jnp.where(killed, -1, out)
        return out, delta, minted

    return fn


def make_k_merge_steps(vocab_bound: int, k: int):
    """jittable: run ``k`` classic merge-selection+apply steps entirely
    device-resident (VERDICT r3 item 4) — selection (exact argmax over a
    replicated dense [V, V] pair histogram, ties by flat index ascending
    = the host heap's (a, b)-ascending tie-break), application (the same
    parity machinery as :func:`make_merge_step`) and histogram update
    all inside one ``fori_loop``, so the host pays ONE dispatch per k
    merges instead of one per merge (the reference pays a full
    par_iter_mut pass per merge, trainer.rs:406-516).

    Per-step histogram maintenance mirrors the host `_apply_delta_hist`
    exactly: pop hist[a,b] FIRST, apply the four row/column delta
    updates (they may drive entries negative, e.g. (a,a) runs), then
    clamp at zero — the host deletes non-positive entries, and a deleted
    entry re-created later starts from 0, which is what the clamp gives.

    Returns a function (words, freqs, hist, v0_base, n_do) -> (words',
    hist', ma, mb, mf): merge log arrays [k] (a, b, minted_freq; a == -1
    marks unapplied steps — beyond ``n_do`` or after the histogram went
    empty.  Accepted merges are a prefix, so new_id = v0_base + i is
    exact for accepted step i).  ``v0_base``/``n_do`` are runtime
    scalars so every block reuses one compilation.
    """
    import jax
    import jax.numpy as jnp

    V = vocab_bound
    step_fn = make_merge_step(V)

    def fn(words, freqs, hist, v0_base, n_do):
        def step(i, carry):
            words, hist, ma, mb, mf = carry
            flat = jnp.argmax(hist)  # first max = (a,b)-ascending ties
            f = hist.reshape(-1)[flat]
            a = (flat // V).astype(jnp.int32)
            b = (flat % V).astype(jnp.int32)
            do = (f > 0) & (i < n_do)
            new_id = v0_base.astype(jnp.int32) + i.astype(jnp.int32)
            out, delta, minted = step_fn(words, freqs, a, b, new_id)
            delta = jax.lax.psum(delta, DATA_AXIS)
            minted = jax.lax.psum(minted, DATA_AXIS)
            doi = do.astype(jnp.int32)
            hist = hist.at[a, b].set(
                jnp.where(do, 0, hist[a, b])
            )
            hist = hist.at[:, a].add(-delta[:, 0] * doi)
            hist = hist.at[b, :].add(-delta[:, 1] * doi)
            hist = hist.at[:, new_id].add(delta[:, 2] * doi)
            hist = hist.at[new_id, :].add(delta[:, 3] * doi)
            hist = jnp.maximum(hist, 0)
            words = jnp.where(do, out, words)
            ma = ma.at[i].set(jnp.where(do, a, -1))
            mb = mb.at[i].set(jnp.where(do, b, -1))
            mf = mf.at[i].set(jnp.where(do, minted, 0))
            return words, hist, ma, mb, mf

        ma = jnp.full(k, -1, jnp.int32)
        mb = jnp.full(k, -1, jnp.int32)
        mf = jnp.zeros(k, jnp.int32)
        # dynamic bound: a tail block with n_do < k pays n_do steps, not
        # k (each step runs the full merge pass over the word tensor)
        return jax.lax.fori_loop(
            0, jnp.minimum(jnp.int32(k), n_do.astype(jnp.int32)),
            step, (words, hist, ma, mb, mf),
        )

    return fn


def make_inl_window_steps(vocab_bound: int, k: int, T: int):
    """jittable: one INL rebuild WINDOW (up to ``k`` merges) entirely
    device-resident (VERDICT r4 item 6).

    INL selection scores drift with every merge, so the host rebuilds
    its ranking every ``REBUILD_INTERVAL`` merges and, within a window,
    walks the STALE order skipping dead candidates
    (trainers/inl_trainer.py _selection_loop; reference semantics
    trainer.rs:406-516).  The walk is exactly reproducible on device
    from the window's candidate list alone: the host ships the first
    ``T`` pairs of its (score desc, key asc) order, and each step picks
    the first candidate with position > the last selection's position
    and CURRENT count > 0 — a masked argmax over a [T] bool vector,
    since argmax returns the first True in walk order.  Scoring itself
    stays on the host (float64, bit-identical to the single-host
    trainer); the device only needs the order, never the scores.

    Per-step the merge application + histogram update are exactly the
    classic block's (make_k_merge_steps); additionally the psum'd
    per-merge delta histograms are RECORDED ([k, V, 4]) so the host can
    replay its pair_freqs/token_freqs dicts merge-by-merge and compute
    the next rebuild's scores without any [V, V] readback.

    Returns fn(words, freqs, hist, cand_a, cand_b, n_cand, v0_base,
    n_do) -> (words', hist', ma, mb, mf, deltas, last_pos): ma[i] == -1
    marks unapplied steps (accepted merges are a prefix, so new_id =
    v0_base + i is exact); ``last_pos`` is the walk cursor after the
    block (-1 if nothing applied), letting the host detect an
    exhausted-within-T window and continue the walk itself.
    """
    import jax
    import jax.numpy as jnp

    V = vocab_bound
    step_fn = make_merge_step(V)

    def fn(words, freqs, hist, cand_a, cand_b, n_cand, v0_base, n_do):
        tpos = jnp.arange(T, dtype=jnp.int32)

        def step(i, carry):
            words, hist, last_pos, stopped, ma, mb, mf, deltas = carry
            cf = hist[cand_a, cand_b]  # [T] current candidate counts
            elig = (tpos > last_pos) & (tpos < n_cand) & (cf > 0)
            has = jnp.any(elig)
            pos = jnp.argmax(elig).astype(jnp.int32)  # first in walk order
            do = has & ~stopped & (i < n_do)
            a = cand_a[pos]
            b = cand_b[pos]
            new_id = v0_base.astype(jnp.int32) + i.astype(jnp.int32)
            out, delta, minted = step_fn(words, freqs, a, b, new_id)
            delta = jax.lax.psum(delta, DATA_AXIS)
            minted = jax.lax.psum(minted, DATA_AXIS)
            doi = do.astype(jnp.int32)
            hist = hist.at[a, b].set(jnp.where(do, 0, hist[a, b]))
            hist = hist.at[:, a].add(-delta[:, 0] * doi)
            hist = hist.at[b, :].add(-delta[:, 1] * doi)
            hist = hist.at[:, new_id].add(delta[:, 2] * doi)
            hist = hist.at[new_id, :].add(delta[:, 3] * doi)
            hist = jnp.maximum(hist, 0)
            words = jnp.where(do, out, words)
            last_pos = jnp.where(do, pos, last_pos)
            stopped = stopped | ~has
            ma = ma.at[i].set(jnp.where(do, a, -1))
            mb = mb.at[i].set(jnp.where(do, b, -1))
            mf = mf.at[i].set(jnp.where(do, minted, 0))
            deltas = deltas.at[i].set(delta * doi)
            return words, hist, last_pos, stopped, ma, mb, mf, deltas

        ma = jnp.full(k, -1, jnp.int32)
        mb = jnp.full(k, -1, jnp.int32)
        mf = jnp.zeros(k, jnp.int32)
        deltas = jnp.zeros((k, V, 4), jnp.int32)
        # dynamic bound: tail windows pay n_do steps, not k
        words, hist, last_pos, _stopped, ma, mb, mf, deltas = (
            jax.lax.fori_loop(
                0,
                jnp.minimum(jnp.int32(k), n_do.astype(jnp.int32)),
                step,
                (
                    words,
                    hist,
                    jnp.int32(-1),
                    jnp.bool_(False),
                    ma,
                    mb,
                    mf,
                    deltas,
                ),
            )
        )
        return words, hist, ma, mb, mf, deltas, last_pos

    return fn


class DistributedInlTrainer(InlBpeTrainer):
    """INL-BPE trainer whose counting + merge application run on a mesh.

    API-compatible with :class:`InlBpeTrainer` (train / train_from_texts /
    count_batch / finish_training / save); only the training core differs.
    """

    def __init__(self, config: TrainerConfig | None = None, mesh=None, **kwargs):
        super().__init__(config, **kwargs)
        self._mesh = mesh

    def _get_mesh(self):
        if self._mesh is None:
            self._mesh = data_mesh()
        return self._mesh

    # override the training core; ingestion/scoring/save are inherited
    def _train_from_word_freqs(self, word_freqs: Counter) -> None:
        self._raw_word_freqs = word_freqs

        print("Step 2: Initializing vocabulary (ByteLevel alphabet)...")
        words_list, freqs_list = self._init_vocab(word_freqs)
        v0 = len(self.vocab)
        print(f"  Initial vocab size: {v0}")
        self._device_merge_loop(words_list, freqs_list, seed_hist=True)

    def _resume_merge_loop(self, words, freqs, pair_words) -> None:
        # pair_freqs comes from the checkpoint (verified by the caller);
        # only the word tensors need re-staging on the mesh
        print("Resuming device merge loop from checkpoint...")
        self._device_merge_loop(words, freqs, seed_hist=False)

    def _device_merge_loop(self, words_list, freqs_list, seed_hist: bool):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard_map = jax.shard_map

        cfg = self.config
        mesh = self._get_mesh()
        n_dev = mesh.devices.size
        v0 = len(self.vocab)

        # pack words into a padded [N, W] tensor, N divisible by n_dev
        W = 1
        for toks in words_list:
            W = max(W, len(toks))
        W = max(W, 2)
        N = len(words_list)
        N_pad = ((N + n_dev - 1) // n_dev) * n_dev if N else n_dev
        words_np = np.full((N_pad, W), -1, dtype=np.int32)
        freqs_np = np.zeros(N_pad, dtype=np.int32)
        for i, toks in enumerate(words_list):
            words_np[i, : len(toks)] = toks
            freqs_np[i] = freqs_list[i]

        shard = NamedSharding(mesh, P(DATA_AXIS))
        words_dev = jax.device_put(words_np, shard)
        freqs_dev = jax.device_put(freqs_np, shard)

        if seed_hist:
            print(
                "Step 3: Computing initial pair frequencies (sharded + psum)..."
            )
            hist_fn = make_initial_hist(v0)

            def sharded_hist(w, f):
                return jax.lax.psum(hist_fn(w, f), DATA_AXIS)

            hist = shard_map(
                sharded_hist,
                mesh=mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(),
            )(words_dev, freqs_dev)
            hist = np.asarray(hist).reshape(v0, v0)
            ys, xs = np.nonzero(hist)
            for a, b in zip(ys, xs):
                self.pair_freqs[(int(a), int(b))] = int(hist[a, b])
            print(f"  Found {len(self.pair_freqs)} unique pairs")

        V = max(cfg.vocab_size, v0 + 1)

        # Device-resident k-merge blocks (VERDICT r3 item 4): classic
        # selection is an argmax over the dense pair histogram, so k
        # selection+apply+hist-update steps run per dispatch instead of
        # one host round trip per merge.  Gated on: classic mode (INL
        # scores drift per merge and live on the host), a dense [V, V]
        # histogram that fits comfortably (V^2 int32), and no checkpoint
        # schedule (checkpoints need host-synced pair counts mid-run).
        max_v = int(
            os.environ.get("CTOK_TRAINER_DEVICE_SELECT_MAX_V", "4096")
        )
        if V <= max_v and not (
            cfg.checkpoint_interval and cfg.checkpoint_path
        ):
            if cfg.inl_gate == 0.0:
                self._batched_selection_loop(
                    words_dev, freqs_dev, mesh, V
                )
            else:
                # INL mode (VERDICT r4 item 6): device-resident rebuild
                # windows — host float64 scoring at each boundary, one
                # dispatch per REBUILD_INTERVAL merges in between
                self._inl_window_loop(words_dev, freqs_dev, mesh, V)
            print(f"  Final vocab size: {len(self.vocab)}")
            print(f"  Total merges: {len(self.merges)}")
            return

        step_fn = make_merge_step(V)

        def sharded_step(w, f, a, b, new_id):
            out, delta, minted = step_fn(w, f, a, b, new_id)
            return (
                out,
                jax.lax.psum(delta, DATA_AXIS),
                jax.lax.psum(minted, DATA_AXIS),
            )

        sharded_step = jax.jit(
            shard_map(
                sharded_step,
                mesh=mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P(), P()),
                out_specs=(P(DATA_AXIS), P(), P()),
            )
        )

        print("Step 4: Learning merges with INL dynamics (device steps)...")

        def apply_merge(pair, new_id):
            """One device merge step; returns the touched pairs."""
            nonlocal words_dev
            a, b = pair
            words_dev, delta, minted = sharded_step(
                words_dev,
                freqs_dev,
                jnp.int32(a),
                jnp.int32(b),
                jnp.int32(new_id),
            )
            return self._apply_delta_hist(
                np.asarray(delta), int(minted), a, b, new_id
            )

        # selection (classic exact heap / INL rebuild walk, progress,
        # periodic checkpoints) is the shared _selection_loop — the
        # reduced histogram is identical on every host, so all hosts make
        # the same decisions with no broadcast (SURVEY §5.8).
        self._selection_loop(apply_merge)
        print(f"  Final vocab size: {len(self.vocab)}")
        print(f"  Total merges: {len(self.merges)}")

    # merges per device dispatch in the batched selection loop; 32
    # amortizes the host round trip (~24 ms on a tunnel-attached chip)
    # to <1 ms/merge while keeping the tail overshoot negligible
    _SELECT_BLOCK_K = 32

    def _batched_selection_loop(self, words_dev, freqs_dev, mesh, V: int):
        """Classic-mode merge loop in k-merge device blocks (see
        make_k_merge_steps).  Host work per block: read the [k] merge
        log, mint vocab entries.  pair_freqs is re-synced from the
        device histogram at the end so finish_training/save see the
        exact host-equivalent state."""
        import time as _time

        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..utils.metrics import counters

        shard_map = jax.shard_map
        cfg = self.config
        target = cfg.vocab_size
        target_merges = max(target - len(self.vocab), 0)
        _t_start = _time.perf_counter()
        k = self._SELECT_BLOCK_K

        hist_np = np.zeros((V, V), np.int32)
        for (a, b), f in self.pair_freqs.items():
            if 0 <= a < V and 0 <= b < V and f > 0:
                hist_np[a, b] = f
        hist_dev = jax.device_put(hist_np, NamedSharding(mesh, P()))

        kfn = jax.jit(
            shard_map(
                make_k_merge_steps(V, k),
                mesh=mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P(), P()),
                out_specs=(P(DATA_AXIS), P(), P(), P(), P()),
            )
        )

        iteration = 0
        # per-block wall times (block 0 includes the one-time compile);
        # read by the dryrun/bench to report steady-state ms/merge
        self._select_block_times: list[float] = []
        self._select_block_merges: list[int] = []
        while len(self.vocab) < target:
            n_do = min(k, target - len(self.vocab))
            v0b = len(self.vocab)
            _tb = _time.perf_counter()
            words_dev, hist_dev, ma, mb, mf = kfn(
                words_dev,
                freqs_dev,
                hist_dev,
                jnp.int32(v0b),
                jnp.int32(n_do),
            )
            ma = np.asarray(ma)
            mb = np.asarray(mb)
            mf = np.asarray(mf)
            self._select_block_times.append(_time.perf_counter() - _tb)
            applied = 0
            for i in range(n_do):
                if ma[i] < 0:
                    break
                a, b = int(ma[i]), int(mb[i])
                merged = self.vocab_r[a] + self.vocab_r[b]
                new_id = len(self.vocab)
                self.vocab[merged] = new_id
                self.vocab_r[new_id] = merged
                self.merges.append((self.vocab_r[a], self.vocab_r[b]))
                self.velocity[new_id] = (
                    self.velocity.get(a, 0.0) + self.velocity.get(b, 0.0)
                ) / 2.0
                minted = int(mf[i])
                if a in self.token_freqs:
                    self.token_freqs[a] = max(
                        self.token_freqs[a] - minted, 0
                    )
                if b in self.token_freqs:
                    self.token_freqs[b] = max(
                        self.token_freqs[b] - minted, 0
                    )
                self.token_freqs[new_id] = minted
                applied += 1
            self._select_block_merges.append(applied)
            it_before = iteration
            iteration += applied
            if target_merges and iteration // 1000 > it_before // 1000:
                print(
                    f"\r  {iteration}/{target_merges}"
                    f" ({iteration / target_merges * 100:.1f}%)",
                    end="",
                    file=sys.stderr,
                )
                if cfg.progress_callback is not None:
                    cfg.progress_callback("merge", iteration, target_merges)
            if applied < n_do:
                break  # histogram exhausted
        # re-sync host pair counts from the device histogram (exact:
        # the clamp-at-zero update mirrors the host's non-positive-entry
        # deletion, so nonzero entries ARE the host dict)
        hist_np = np.asarray(hist_dev)
        ys, xs = np.nonzero(hist_np)
        self.pair_freqs = defaultdict(int)
        for a, b in zip(ys, xs):
            self.pair_freqs[(int(a), int(b))] = int(hist_np[a, b])
        if target_merges:
            print(f"\r  {iteration}/{target_merges} done", file=sys.stderr)
            if cfg.progress_callback is not None:
                cfg.progress_callback("merge", iteration, target_merges)
        counters.add("merges", iteration)
        counters.add_time("merges", _time.perf_counter() - _t_start)

    # candidate-list length shipped to the device per INL window; the
    # walk consumes one position per merge PLUS one per dead candidate
    # skipped, so 2048 covers a 100-merge window with ~19x slack — the
    # host continues the walk itself in the rare overflow (exactness is
    # never at stake, only the fast path)
    _INL_WINDOW_T = 2048

    def _inl_window_loop(self, words_dev, freqs_dev, mesh, V: int):
        """INL-mode merge loop in device-resident rebuild windows (see
        make_inl_window_steps).  Host work per window: float64 scoring +
        ordering (bit-identical to the single-host trainer), then a
        merge-by-merge replay of the returned delta log so pair_freqs /
        token_freqs / velocity stay exact for the next boundary's
        scores, checkpoints, and save."""
        import time as _time

        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..trainers.inl_trainer import REBUILD_INTERVAL
        from ..utils.metrics import counters

        shard_map = jax.shard_map
        cfg = self.config
        target = cfg.vocab_size
        target_merges = max(target - len(self.vocab), 0)
        _t_start = _time.perf_counter()
        k = REBUILD_INTERVAL
        T = self._INL_WINDOW_T

        hist_np = np.zeros((V, V), np.int32)
        for (a, b), f in self.pair_freqs.items():
            if 0 <= a < V and 0 <= b < V and f > 0:
                hist_np[a, b] = f
        hist_dev = jax.device_put(hist_np, NamedSharding(mesh, P()))

        kfn = jax.jit(
            shard_map(
                make_inl_window_steps(V, k, T),
                mesh=mesh,
                in_specs=(
                    P(DATA_AXIS), P(DATA_AXIS), P(), P(), P(), P(), P(),
                    P(),
                ),
                out_specs=(
                    P(DATA_AXIS), P(), P(), P(), P(), P(), P(),
                ),
            )
        )
        # per-merge step for the rare beyond-T window continuation
        per_merge_fn = None

        def _mint_from_log(a: int, b: int, minted: int, delta: np.ndarray):
            merged = self.vocab_r[a] + self.vocab_r[b]
            new_id = len(self.vocab)
            self.vocab[merged] = new_id
            self.vocab_r[new_id] = merged
            self.merges.append((self.vocab_r[a], self.vocab_r[b]))
            self.velocity[new_id] = (
                self.velocity.get(a, 0.0) + self.velocity.get(b, 0.0)
            ) / 2.0
            # replays pair_freqs AND token_freqs exactly (the device
            # histogram's clamp-at-zero mirrors the dict's non-positive
            # deletion — parity documented at make_k_merge_steps)
            self._apply_delta_hist(delta, minted, a, b, new_id)
            return new_id

        iteration = 0
        self._select_block_times: list[float] = []
        self._select_block_merges: list[int] = []
        while len(self.vocab) < target:
            pairs, order = self._ordered_pairs()  # host f64 scoring
            if not len(order):
                break
            pairs_np = np.asarray(pairs, np.int32).reshape(-1, 2)
            n_cand = min(T, len(order))
            sel = order[:n_cand]
            ca = np.zeros(T, np.int32)
            cb = np.zeros(T, np.int32)
            ca[:n_cand] = pairs_np[sel, 0]
            cb[:n_cand] = pairs_np[sel, 1]
            # window size (rebuild cadence) is k or the remaining vocab
            # target; the DEVICE loop is additionally bounded by the
            # candidate count (each device selection consumes >= 1
            # candidate) — a near-exhausted corpus stops paying k steps
            # for a handful of merges.  The bounds are distinct: when
            # the device runs out of candidates mid-window, the host
            # walk below continues the SAME window past them.
            window = min(k, target - len(self.vocab))
            n_do = min(window, n_cand)
            v0b = len(self.vocab)
            _tb = _time.perf_counter()
            words_dev, hist_dev, ma, mb, mf, deltas, last_pos = kfn(
                words_dev,
                freqs_dev,
                hist_dev,
                jnp.asarray(ca),
                jnp.asarray(cb),
                jnp.int32(n_cand),
                jnp.int32(v0b),
                jnp.int32(n_do),
            )
            ma = np.asarray(ma)
            mb = np.asarray(mb)
            mf = np.asarray(mf)
            deltas = np.asarray(deltas)
            self._select_block_times.append(_time.perf_counter() - _tb)
            applied = 0
            for i in range(n_do):
                if ma[i] < 0:
                    break
                _mint_from_log(
                    int(ma[i]), int(mb[i]), int(mf[i]), deltas[i]
                )
                applied += 1
            self._select_block_merges.append(applied)
            iteration += applied
            if applied < window:
                # the device walk ran out of eligible candidates within
                # its T-entry list.  The host walk would only end the
                # window if the FULL order has no live candidate left —
                # check with the replayed counts and, if one exists
                # beyond T, continue the window host-side per merge
                # (exact same walk, same per-merge device step)
                pos = int(last_pos)
                while applied < window and len(self.vocab) < target:
                    nxt = None
                    while pos + 1 < len(order):
                        pos += 1
                        cand = tuple(pairs_np[order[pos]])
                        cand = (int(cand[0]), int(cand[1]))
                        if self.pair_freqs.get(cand, 0) > 0:
                            nxt = cand
                            break
                    if nxt is None:
                        break  # window (and maybe training) exhausted
                    if per_merge_fn is None:
                        step_fn = make_merge_step(V)

                        def sharded_step(w, f, a, b, new_id):
                            out, delta, minted = step_fn(
                                w, f, a, b, new_id
                            )
                            return (
                                out,
                                jax.lax.psum(delta, DATA_AXIS),
                                jax.lax.psum(minted, DATA_AXIS),
                            )

                        per_merge_fn = jax.jit(
                            shard_map(
                                sharded_step,
                                mesh=mesh,
                                in_specs=(
                                    P(DATA_AXIS), P(DATA_AXIS), P(), P(),
                                    P(),
                                ),
                                out_specs=(P(DATA_AXIS), P(), P()),
                            )
                        )
                    a, b = nxt
                    new_id = len(self.vocab)
                    words_dev, delta, minted = per_merge_fn(
                        words_dev,
                        freqs_dev,
                        jnp.int32(a),
                        jnp.int32(b),
                        jnp.int32(new_id),
                    )
                    _mint_from_log(a, b, int(minted), np.asarray(delta))
                    # keep the device histogram in sync for later windows
                    hist_np2 = np.zeros((V, V), np.int32)
                    for (pa, pb), f in self.pair_freqs.items():
                        if 0 <= pa < V and 0 <= pb < V and f > 0:
                            hist_np2[pa, pb] = f
                    hist_dev = jax.device_put(
                        hist_np2, NamedSharding(mesh, P())
                    )
                    applied += 1
                    iteration += 1
                if applied == 0:
                    break  # nothing live anywhere: training is done
            if target_merges and iteration and iteration % 1000 < k:
                print(
                    f"\r  {iteration}/{target_merges}"
                    f" ({iteration / target_merges * 100:.1f}%)",
                    end="",
                    file=sys.stderr,
                )
                if cfg.progress_callback is not None:
                    cfg.progress_callback("merge", iteration, target_merges)
        if target_merges:
            print(f"\r  {iteration}/{target_merges} done", file=sys.stderr)
            if cfg.progress_callback is not None:
                cfg.progress_callback("merge", iteration, target_merges)
        counters.add("merges", iteration)
        counters.add_time("merges", _time.perf_counter() - _t_start)

    def _is_checkpoint_writer(self) -> bool:
        # every process runs the identical selection loop; only process 0
        # owns the checkpoint file (all state is host-replicated, so its
        # snapshot is complete)
        import jax

        return jax.process_index() == 0

    def _apply_delta_hist(self, delta: np.ndarray, minted: int, a, b, new_id):
        """Fold the psum'd delta histogram into pair_freqs; returns the
        set of touched pairs (counts changed) for incremental heap
        updates, mirroring the host _apply_merge contract."""
        pf = self.pair_freqs
        pf.pop((a, b), None)
        if not isinstance(pf, defaultdict):
            self.pair_freqs = pf = defaultdict(int, pf)
        touched = set()
        for x in np.nonzero(delta[:, 0])[0]:
            p = (int(x), a)
            pf[p] -= int(delta[x, 0])
            touched.add(p)
        for y in np.nonzero(delta[:, 1])[0]:
            p = (b, int(y))
            pf[p] -= int(delta[y, 1])
            touched.add(p)
        for x in np.nonzero(delta[:, 2])[0]:
            p = (int(x), new_id)
            pf[p] += int(delta[x, 2])
            touched.add(p)
        for y in np.nonzero(delta[:, 3])[0]:
            p = (new_id, int(y))
            pf[p] += int(delta[y, 3])
            touched.add(p)
        for p in [p for p, v in pf.items() if v <= 0]:
            del pf[p]
        if a in self.token_freqs:
            self.token_freqs[a] = max(self.token_freqs[a] - minted, 0)
        if b in self.token_freqs:
            self.token_freqs[b] = max(self.token_freqs[b] - minted, 0)
        self.token_freqs[new_id] = minted
        return touched
