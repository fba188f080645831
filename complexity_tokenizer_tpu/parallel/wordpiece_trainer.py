"""Distributed WordPiece trainer: device re-tokenization + sharded pair
counts (SURVEY C15).

The reference's WordPiece trainer re-tokenizes every word with greedy
longest-match and recounts every adjacent subword pair on every round, on
one thread (trainers.rs:180-273).  The TPU-native redesign keeps those
semantics but runs both hot passes on the device mesh:

- unique words live as a ``[N, W]`` codepoint tensor (plus ``[N]`` freqs),
  sharded over the ``data`` axis once — constant for the whole run;
- the per-round greedy longest-match runs as the same batched
  rolling-hash kernel as the inference tier (ops/wordpiece_device.py),
  except the vocab table is an **incrementally updatable open-address
  hash** (one minted token per round = two tiny ``.at[slot].set`` device
  updates, no per-round table rebuild) and unmatched positions fall back
  to dense codepoint->symbol maps (the trainer emits ``prefix+char`` even
  when it is not in the vocab, trainers.rs:262-268);
- pair counting is a per-shard sort + segmented unique-count over packed
  ``(a<<16)|b`` symbol-pair keys, weighted by word freqs; the per-shard
  (keys, counts) tables are ``all_gather``-ed so every host merges the
  identical exact global histogram and selects the same merge — the
  device never approximates: overflow of the unique-pair budget or an
  unverifiable row falls back to exact host work for that round/word;
- merge selection (highest count, ties -> lexicographically smallest
  string pair — the reference's tie order is HashMap-nondeterministic, so
  the rule is fixed and shared with the host trainer) and vocab minting
  stay on host, identical everywhere.

Exactness: matched candidates are verified against packed token
codepoints (hash collisions poison the word -> host re-tokenization, and
poisoned words' pair weights are zeroed in-kernel so their exact pairs
can be added back on host identically on every host).  The trained vocab
is bit-identical to :class:`trainers.wordpiece_trainer.WordPieceTrainer`
by construction.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from ..ops.hashtable import _mix_hash_np
from ..ops.wordpiece_device import (
    _B1,
    _B2,
    _SEED_CONT1,
    _SEED_CONT2,
    _W,
    _poly_hash_np,
    rolling_prefix_hashes,
)
from ..trainers.wordpiece_trainer import WordPieceTrainer, WordPieceTrainerConfig
from .mesh import DATA_AXIS, data_mesh

__all__ = ["DistributedWordPieceTrainer"]

_MAXP = 16  # open-address probe budget (insert grows the table beyond it)
_EMPTY_H1 = 0  # (0, 1) marks an empty slot; a real form hashing to it
_EMPTY_H2 = 1  # falls back to the host trainer (2^-64, checked on insert)
_MAX_CP = 0x110000
_PAD_KEY = np.int32(0x7FFFFFFF)  # never a real pair key (syms < 2^15)
_MAX_SYMS = 1 << 15

_PROGRAMS: dict = {}


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _form_hashes(chars: list[int], cont: bool) -> tuple[int, int]:
    s1 = _SEED_CONT1 if cont else np.uint32(0)
    s2 = _SEED_CONT2 if cont else np.uint32(0)
    h1 = int(np.int32(np.uint32(_poly_hash_np(chars, _B1, s1))))
    h2 = int(np.int32(np.uint32(_poly_hash_np(chars, _B2, s2))))
    return h1, h2


class _MatchTables:
    """Host master + device mirror of the updatable longest-match tables.

    Slots: one per matchable *form* (plain spelling at word start,
    prefix-stripped body for continuations — see
    ops/wordpiece_device.build_wordpiece_tables on why both).  The
    open-address table maps the form's two rolling hashes to its slot;
    ``emit_sym[slot]`` is the trainer symbol emitted on a match.
    """

    def __init__(self, s_cap: int):
        self.s_cap = s_cap
        self.t_size = _pow2(max(4 * s_cap, 64))
        self.h1 = np.full(self.t_size, _EMPTY_H1, np.int32)
        self.h2 = np.full(self.t_size, _EMPTY_H2, np.int32)
        self.slotv = np.zeros(self.t_size, np.int32)
        self.token_chars = np.full((s_cap, _W), -1, np.int32)
        self.token_lens = np.zeros(s_cap, np.int32)
        self.emit_sym = np.full(s_cap, -1, np.int32)
        self.n_slots = 0
        self.max_len = 1
        self.seen_keys: dict[tuple[int, int], int] = {}
        self._dev = None  # (h1, h2, slotv, token_chars(full width), lens, emit)
        self._pending: list[tuple] = []

    def insert_form(self, chars: list[int], cont: bool, sym: int) -> bool:
        """Returns False when the device tier must be abandoned (hash
        collision between two distinct forms, probe overflow after
        regrowth, slot capacity)."""
        if len(chars) > (_W - 1 if cont else _W):
            return True  # unmatchable within the lane width: skip
        key = _form_hashes(chars, cont)
        if key == (_EMPTY_H1, _EMPTY_H2):
            return False
        if key in self.seen_keys:
            return False  # 64-bit collision between two distinct forms
        if self.n_slots >= self.s_cap:
            return False
        slot = self.n_slots
        self.n_slots += 1
        self.seen_keys[key] = slot
        self.token_chars[slot, : len(chars)] = chars
        self.token_lens[slot] = len(chars)
        self.emit_sym[slot] = sym
        self.max_len = max(self.max_len, len(chars))
        pos = self._probe_insert(key, slot)
        if pos is None:
            return False
        self._pending.append((pos, key, slot, len(chars)))
        return True

    def _probe_insert(self, key, slot):
        mask = self.t_size - 1
        h = int(
            _mix_hash_np(
                np.uint32(key[0] & 0xFFFFFFFF),
                np.uint32(key[1] & 0xFFFFFFFF),
                mask,
            )
        )
        for j in range(_MAXP):
            pos = (h + j) & mask
            if (self.h1[pos], self.h2[pos]) == (_EMPTY_H1, _EMPTY_H2):
                self.h1[pos] = key[0]
                self.h2[pos] = key[1]
                self.slotv[pos] = slot
                return pos
        return None  # probe overflow: caller falls back to host

    def device_arrays(self, lt_cap: int):
        """Device mirrors, applying pending incremental inserts in place
        (two scatter updates per minted token, no rebuild)."""
        import jax.numpy as jnp

        if self._dev is None:
            self._dev = [
                jnp.asarray(self.h1),
                jnp.asarray(self.h2),
                jnp.asarray(self.slotv),
                jnp.asarray(self.token_chars),
                jnp.asarray(self.token_lens),
                jnp.asarray(self.emit_sym),
            ]
            self._pending.clear()
        elif self._pending:
            d = self._dev
            for pos, key, slot, ln in self._pending:
                d[0] = d[0].at[pos].set(key[0])
                d[1] = d[1].at[pos].set(key[1])
                d[2] = d[2].at[pos].set(slot)
                d[3] = d[3].at[slot].set(jnp.asarray(self.token_chars[slot]))
                d[4] = d[4].at[slot].set(ln)
                d[5] = d[5].at[slot].set(int(self.emit_sym[slot]))
            self._pending.clear()
        return self._dev[:3] + [self._dev[3][:, :lt_cap]] + self._dev[4:]


def _match_count_program(mesh, t_size, s_cap, lt_cap, u_cap, n_shard):
    key = (
        tuple(int(d.id) for d in mesh.devices.flat),
        t_size, s_cap, lt_cap, u_cap, n_shard,
    )
    prog = _PROGRAMS.get(key)
    if prog is not None:
        return prog
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..ops.hashtable import mix_hash_jnp

    W = _W
    tmask = t_size - 1

    def match_rows(h1t, h2t, slotv, tchars, tlens, emit, plain_map,
                   cont_map, chars, lens):
        B = chars.shape[0]
        P1, P2, pow1, pow2 = rolling_prefix_hashes(chars)
        ls = jnp.arange(1, lt_cap + 1, dtype=jnp.int32)  # [L]
        lens_i = lens.astype(jnp.int32)

        def take(Pm, idx):
            return jnp.take_along_axis(Pm, idx, axis=1)

        def body(state):
            start, out, poison = state
            active = start < lens_i
            e = start[:, None] + ls[None, :]  # [B, L]
            cand_ok = (e <= lens_i[:, None]) & active[:, None]
            e_c = jnp.clip(e, 0, W)
            s_c = jnp.clip(start[:, None], 0, W)
            h1 = take(P1, e_c) - take(P1, s_c) * pow1[ls][None, :]
            h2 = take(P2, e_c) - take(P2, s_c) * pow2[ls][None, :]
            is_cont = (start > 0)[:, None]
            h1 = jnp.where(is_cont, h1 + _SEED_CONT1 * pow1[ls][None, :], h1)
            h2 = jnp.where(is_cont, h2 + _SEED_CONT2 * pow2[ls][None, :], h2)
            h1 = h1.astype(jnp.int32)
            h2 = h2.astype(jnp.int32)
            # open-address probe: the insert path guarantees every live
            # key sits within _MAXP of its base slot
            base = mix_hash_jnp(h1, h2, tmask)
            slot = jnp.full(h1.shape, -1, jnp.int32)
            for j in range(_MAXP):
                idx = (base + j) & tmask
                hit_j = (h1t[idx] == h1) & (h2t[idx] == h2)
                slot = jnp.where(hit_j & (slot < 0), slotv[idx], slot)
            hit = (slot >= 0) & cand_ok
            safe = jnp.maximum(slot, 0)
            hit = hit & (tlens[safe] == ls[None, :])  # length guard
            best_l = jnp.max(jnp.where(hit, ls[None, :], 0), axis=1)  # [B]
            matched = best_l > 0
            cand_slot = jnp.take_along_axis(
                jnp.where(hit, slot, 0),
                jnp.maximum(best_l - 1, 0)[:, None], axis=1,
            )[:, 0]
            # exact verify of the chosen candidate (collision guard)
            vpos = jnp.clip(
                start[:, None] + jnp.arange(lt_cap, dtype=jnp.int32)[None, :],
                0, W - 1,
            )
            wchars = jnp.take_along_axis(chars, vpos, axis=1)  # [B, Lt]
            trow = tchars[jnp.maximum(cand_slot, 0)]  # [B, Lt]
            within = jnp.arange(lt_cap, dtype=jnp.int32)[None, :] < best_l[:, None]
            verified = jnp.all(jnp.where(within, trow == wchars, True), axis=1)
            poison_now = active & matched & ~verified
            # fallback: prefix+char (start>0) / bare char (start==0),
            # regardless of vocab membership (trainers.rs:262-268)
            cp = jnp.take_along_axis(chars, s_c, axis=1)[:, 0]
            cp_safe = jnp.clip(cp, 0, _MAX_CP - 1)
            fb_sym = jnp.where(start > 0, cont_map[cp_safe], plain_map[cp_safe])
            poison_now = poison_now | (active & ~matched & (fb_sym < 0))
            emit_v = jnp.where(
                matched & verified, emit[jnp.maximum(cand_slot, 0)], fb_sym
            )
            cols = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
            out = jnp.where(
                (cols == start[:, None]) & active[:, None],
                emit_v[:, None], out,
            )
            adv = jnp.where(matched & verified, best_l, 1)
            start = jnp.where(active, start + adv, start)
            return start, out, poison | poison_now

        start0 = jnp.zeros(B, jnp.int32)
        out0 = jnp.full((B, W), -1, jnp.int32)
        poison0 = jnp.zeros(B, bool)
        _, out, poison = jax.lax.while_loop(
            lambda s: jnp.any(s[0] < lens_i), body, (start0, out0, poison0)
        )
        return out, poison

    def fn(h1t, h2t, slotv, tchars, tlens, emit, plain_map, cont_map,
           chars, lens, freqs):
        out, poison = match_rows(
            h1t, h2t, slotv, tchars, tlens, emit, plain_map, cont_map,
            chars, lens,
        )
        # compact the tombstone layout so adjacency = next column
        order = jnp.argsort((out < 0).astype(jnp.int32), axis=1, stable=True)
        c = jnp.take_along_axis(out, order, axis=1)
        a = c[:, :-1]
        b = c[:, 1:]
        valid = (a >= 0) & (b >= 0)
        # poisoned rows contribute nothing on device; their exact pairs
        # are re-added on host from the word strings
        w = jnp.where(valid & ~poison[:, None], freqs[:, None], 0)
        key = jnp.where(valid, (a << 16) | b, _PAD_KEY)
        key = key.reshape(-1)
        w = w.reshape(-1).astype(jnp.int32)
        key_s, w_s = jax.lax.sort_key_val(key, w)
        cw = jnp.cumsum(w_s)
        nxt = jnp.concatenate([key_s[1:], jnp.full(1, -(2**31), jnp.int32)])
        prv = jnp.concatenate([jnp.full(1, -(2**31), jnp.int32), key_s[:-1]])
        is_last = key_s != nxt
        is_first = key_s != prv
        n = key_s.shape[0]
        idxs = jnp.arange(n, dtype=jnp.int32)
        run_start = jax.lax.cummax(jnp.where(is_first, idxs, -1))
        base = jnp.where(run_start > 0, cw[jnp.maximum(run_start - 1, 0)], 0)
        cnt = cw - base  # valid at last positions
        real = is_last & (cnt > 0) & (key_s != _PAD_KEY)
        uidx = jnp.cumsum(real.astype(jnp.int32)) - 1
        tgt = jnp.where(real, jnp.minimum(uidx, u_cap - 1), u_cap)
        ukeys = jnp.full(u_cap + 1, _PAD_KEY, jnp.int32).at[tgt].set(
            jnp.where(real, key_s, _PAD_KEY)
        )[:u_cap]
        ucnts = jnp.zeros(u_cap + 1, jnp.int32).at[tgt].set(
            jnp.where(real, cnt, 0)
        )[:u_cap]
        n_uniq = jnp.sum(real.astype(jnp.int32))
        gkeys = jax.lax.all_gather(ukeys, DATA_AXIS)  # [n_dev, U]
        gcnts = jax.lax.all_gather(ucnts, DATA_AXIS)
        guniq = jax.lax.all_gather(n_uniq, DATA_AXIS)
        gpoison = jax.lax.all_gather(poison, DATA_AXIS)  # [n_dev, n_shard]
        return gkeys, gcnts, guniq, gpoison

    prog = jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(),) * 8 + (P(DATA_AXIS),) * 3,
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
    )
    _PROGRAMS[key] = prog
    return prog


class DistributedWordPieceTrainer(WordPieceTrainer):
    """WordPiece trainer whose re-tokenization + pair counting run sharded
    on a device mesh.  API-compatible with :class:`WordPieceTrainer`."""

    def __init__(self, config: WordPieceTrainerConfig | None = None, mesh=None):
        super().__init__(config)
        self._mesh = mesh

    def _get_mesh(self):
        if self._mesh is None:
            self._mesh = data_mesh()
        return self._mesh

    def _host_fallback(self, word_freqs: Counter):
        """Delegate the whole run to the host trainer, resetting any
        partially-built vocab first — the host path assumes a clean start
        (ids are assigned by insertion order)."""
        self.vocab = {}
        return super()._train_from_word_freqs(word_freqs)

    def _train_from_word_freqs(self, word_freqs: Counter):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..models.wordpiece import WordPieceModel

        cfg = self.config
        word_freqs = Counter(
            {w: f for w, f in word_freqs.items() if f >= cfg.min_frequency}
        )
        prefix = cfg.continuing_subword_prefix

        # ---- vocab init: specials then sorted alphabet (host semantics)
        next_id = 0
        for tok in cfg.special_tokens:
            self.vocab[tok] = next_id
            next_id += 1
        alphabet = sorted({c for w in word_freqs for c in w})
        for c in alphabet:
            if c not in self.vocab:
                self.vocab[c] = next_id
                next_id += 1

        # ---- symbol registry: vocab strings + fallback prefix+char syms
        sym_of: dict[str, int] = {}
        sym_str: list[str] = []

        def sym(s: str) -> int:
            i = sym_of.get(s)
            if i is None:
                i = len(sym_str)
                sym_of[s] = i
                sym_str.append(s)
            return i

        cap = cfg.vocab_size + 2 * len(alphabet) + len(cfg.special_tokens) + 8
        if cap >= _MAX_SYMS:
            # pair keys pack into (a<<16)|b int32: symbol space too large
            return self._host_fallback(word_freqs)

        tables = _MatchTables(2 * cap)
        ok = True
        for tok in self.vocab:
            s = sym(tok)
            ok = ok and tables.insert_form([ord(c) for c in tok], False, s)
            if tok.startswith(prefix) and len(tok) > len(prefix):
                ok = ok and tables.insert_form(
                    [ord(c) for c in tok[len(prefix):]], True, s
                )
        plain_map = np.full(_MAX_CP, -1, np.int32)
        cont_map = np.full(_MAX_CP, -1, np.int32)
        for c in alphabet:
            cp = ord(c)
            plain_map[cp] = sym(c)
            cont_map[cp] = sym(prefix + c)
        if not ok:
            return self._host_fallback(word_freqs)

        # ---- stage the (constant) word corpus, sharded
        mesh = self._get_mesh()
        n_dev = mesh.devices.size
        words = list(word_freqs.keys())
        host_words = [w for w in words if len(w) > _W]
        dev_words = [w for w in words if len(w) <= _W]
        # the device pair counts accumulate in int32 (TPU-native width);
        # bound the total weighted adjacency mass exactly on host and fall
        # back when a cumsum could wrap (the host trainer uses unbounded
        # ints, so exactness is preserved either way)
        pair_weight_bound = sum(
            word_freqs[w] * max(len(w) - 1, 0) for w in dev_words
        )
        if pair_weight_bound >= (1 << 31):
            return self._host_fallback(word_freqs)
        N = len(dev_words)
        N_pad = max(_pow2(max(N, 1)), n_dev)
        chars = np.full((N_pad, _W), -1, np.int32)
        lens = np.zeros(N_pad, np.int32)
        freqs = np.zeros(N_pad, np.int32)
        for i, wd in enumerate(dev_words):
            cps = [ord(c) for c in wd]
            chars[i, : len(cps)] = cps
            lens[i] = len(cps)
            freqs[i] = word_freqs[wd]
        shard = NamedSharding(mesh, P(DATA_AXIS))
        chars_dev = jax.device_put(chars, shard)
        lens_dev = jax.device_put(lens, shard)
        freqs_dev = jax.device_put(freqs, shard)
        n_shard = N_pad // n_dev

        plain_dev = jnp.asarray(plain_map)
        cont_dev = jnp.asarray(cont_map)

        u_cap = 1 << 12
        poisoned_words: list[str] = list(host_words)

        def host_pairs(word_list) -> Counter:
            out: Counter = Counter()
            for wd in word_list:
                toks = self._tokenize_for_training(wd)
                f = word_freqs[wd]
                for i in range(len(toks) - 1):
                    out[(toks[i], toks[i + 1])] += f
            return out

        while len(self.vocab) < cfg.vocab_size:
            lt_cap = min(_pow2(max(tables.max_len, 8)), _W)
            arrs = tables.device_arrays(lt_cap)
            for _attempt in range(6):
                prog = _match_count_program(
                    mesh, tables.t_size, tables.s_cap, lt_cap, u_cap, n_shard
                )
                gkeys, gcnts, guniq, gpoison = prog(
                    *arrs, plain_dev, cont_dev, chars_dev, lens_dev, freqs_dev
                )
                max_uniq = int(np.max(np.asarray(guniq)))
                if max_uniq <= u_cap:
                    break
                u_cap = _pow2(max_uniq)  # recompile with a larger budget
            else:
                return self._host_fallback(word_freqs)

            gkeys = np.asarray(gkeys).reshape(-1)
            gcnts = np.asarray(gcnts).reshape(-1)
            gpoison = np.asarray(gpoison).reshape(-1)[:N_pad]

            poisoned_idx = np.nonzero(gpoison)[0]
            poisoned_words = list(host_words) + [
                dev_words[i] for i in poisoned_idx if i < N
            ]

            live = gcnts > 0
            keys_l = gkeys[live]
            cnts_l = gcnts[live]
            # merge per-shard tables into the exact global histogram
            uk, inv = np.unique(keys_l, return_inverse=True)
            agg = np.zeros(len(uk), np.int64)
            np.add.at(agg, inv, cnts_l)
            pair_freqs: Counter = Counter()
            for k, c in zip(uk.tolist(), agg.tolist()):
                a = (k >> 16) & 0xFFFF
                b = k & 0xFFFF
                pair_freqs[(sym_str[a], sym_str[b])] = int(c)
            pair_freqs.update(host_pairs(poisoned_words))

            if not pair_freqs:
                break
            (a, b), _ = min(pair_freqs.items(), key=lambda kv: (-kv[1], kv[0]))
            if b.startswith(prefix):
                merged = a + b[len(prefix):]
            else:
                merged = a + b
            if merged in self.vocab:
                break  # vocab unchanged -> counts won't change
            self.vocab[merged] = next_id
            next_id += 1
            s = sym(merged)
            if len(sym_str) >= _MAX_SYMS:
                return self._host_fallback(word_freqs)
            ok = tables.insert_form([ord(c) for c in merged], False, s)
            if merged.startswith(prefix) and len(merged) > len(prefix):
                ok = ok and tables.insert_form(
                    [ord(c) for c in merged[len(prefix):]], True, s
                )
            if not ok:
                return self._host_fallback(word_freqs)

        return WordPieceModel(
            dict(self.vocab),
            cfg.continuing_subword_prefix,
            "[UNK]",
            cfg.max_input_chars_per_word,
        )
