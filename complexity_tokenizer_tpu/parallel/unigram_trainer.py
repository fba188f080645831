"""Distributed Unigram trainer: device Viterbi E-step + psum histograms.

The reference's Unigram trainer EM loop re-runs a scalar Viterbi DP over
every sentence per round and tallies expected piece counts on one thread
(trainers.rs:427-472).  The TPU-native redesign (SURVEY C16):

- unique sentences live as a ``[N, W]`` codepoint tensor (plus ``[N]``
  freqs), sharded over the mesh ``data`` axis ONCE — the sentence set is
  constant across EM rounds, only the piece tables change;
- each E-step is one sharded device pass: the same Viterbi scan program as
  the inference tier (ops/unigram_device.make_viterbi_fn) segments every
  sentence, and expected counts land in a dense ``[V]`` int32 histogram
  reduced with ``psum`` — single-char fallbacks are excluded (their
  substring is never a live piece, so they contribute nothing to the
  M-step scores);
- the M-step (sort by expected count, prune to shrinking_factor) stays on
  host, identical on every host because the reduced histogram is
  identical — no broadcast needed (SURVEY §5.8);
- exactness: rows whose device segmentation is not guaranteed bit-equal to
  the host's f64 DP (hash-collision verify failure or an f32-ambiguous
  argmax margin) are excluded from the device histogram and re-segmented
  on host, so the trained vocab is bit-identical to the host trainer's by
  construction.  Piece tables are padded to power-of-two sizes so most EM
  rounds reuse a compiled program.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from ..ops.unigram_device import build_piece_tables, make_viterbi_fn
from ..ops.wordpiece_device import _W
from ..trainers.unigram_trainer import UnigramTrainer, UnigramTrainerConfig
from .mesh import DATA_AXIS, data_mesh

__all__ = ["DistributedUnigramTrainer"]

_PROGRAMS: dict = {}


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _counts_program(mesh, size, n_buckets, Lt, maxcand, Vp):
    key = (
        tuple(int(d.id) for d in mesh.devices.flat),
        size, n_buckets, Lt, maxcand, Vp,
    )
    prog = _PROGRAMS.get(key)
    if prog is not None:
        return prog
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    core = make_viterbi_fn(size, n_buckets, Lt, maxcand)

    def fn(disp, rows, pc, pl, ps, fb, chars, lens, freqs):
        out, _, poison = core(disp, rows, pc, pl, ps, fb, chars, lens)
        ok = (out >= 0) & ~poison[:, None]
        hist = jnp.zeros(Vp + 1, jnp.int32)
        hist = hist.at[jnp.where(ok, out, Vp)].add(
            jnp.where(ok, freqs[:, None], 0)
        )
        # poison comes back replicated (all_gather over the data axis):
        # every controller needs the full poisoned-row set for the host
        # re-segmentation, and a data-sharded output cannot be fetched on
        # a multi-process mesh (it spans non-addressable devices)
        poison_full = jax.lax.all_gather(poison, DATA_AXIS, axis=0, tiled=True)
        return jax.lax.psum(hist[:Vp], DATA_AXIS), poison_full

    prog = jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(),) * 6 + (P(DATA_AXIS),) * 3,
            out_specs=(P(), P()),
            # the Viterbi scan/while carries start as fresh (unvarying)
            # zeros; skip the varying-manual-axes type check rather than
            # thread pvary through the shared DP core
            check_vma=False,
        )
    )
    _PROGRAMS[key] = prog
    return prog


class DistributedUnigramTrainer(UnigramTrainer):
    """Unigram trainer whose E-step runs sharded on a device mesh.

    API-compatible with :class:`UnigramTrainer` (train / train_from_texts /
    train_from_iterator); only the expected-count pass differs.
    """

    def __init__(self, config: UnigramTrainerConfig | None = None, mesh=None):
        super().__init__(config)
        self._mesh = mesh
        self._corpus = None  # (sentences, chars_dev, lens_dev, freqs_dev, host_idx)
        self._count_overflow = False

    def _get_mesh(self):
        if self._mesh is None:
            self._mesh = data_mesh()
        return self._mesh

    def _train_from_sentences(self, sentences):
        # a reused trainer instance must re-stage: the staged corpus tensor
        # belongs to the previous train call's sentence set
        self._corpus = None
        self._count_overflow = False
        return super()._train_from_sentences(sentences)

    def _stage_corpus(self, sentence_freqs: Counter):
        """Upload the (constant) sentence tensor once, sharded over data."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._get_mesh()
        n_dev = mesh.devices.size
        sentences = list(sentence_freqs.keys())
        host_idx = [i for i, s in enumerate(sentences) if len(s) > _W]
        host_set = set(host_idx)
        N = len(sentences)
        N_pad = max(_pow2(N), n_dev)
        chars = np.full((N_pad, _W), -1, np.int32)
        lens = np.zeros(N_pad, np.int32)
        freqs = np.zeros(N_pad, np.int32)
        for i, s in enumerate(sentences):
            if i in host_set:
                continue
            cps = [ord(c) for c in s]
            chars[i, : len(cps)] = cps
            lens[i] = len(cps)
            freqs[i] = sentence_freqs[s]
        shard = NamedSharding(mesh, P(DATA_AXIS))
        # the device histogram accumulates in int32 (TPU-native width):
        # bound the total emitted piece mass (<= sum freq * len) exactly on
        # host and use the all-host E-step when a count could wrap
        self._count_overflow = (
            sum(sentence_freqs[s] * max(len(s), 1) for s in sentences)
            >= (1 << 31)
        )
        self._corpus = (
            sentences,
            jax.device_put(chars, shard),
            jax.device_put(lens, shard),
            jax.device_put(freqs, shard),
            host_idx,
        )

    def _expected_counts(self, sentence_freqs: Counter) -> dict[int, float]:
        import jax.numpy as jnp

        pieces = {t: (i, s) for i, (t, s) in enumerate(self.vocab)}
        built = build_piece_tables(pieces)
        if built is None:
            # ineligible vocab (hash collision / oversized piece): the
            # host E-step is the exact fallback
            return super()._expected_counts(sentence_freqs)
        chd, pc, pl, ps, Lt = built
        V = len(self.vocab)
        cfg = self.config

        if self._corpus is None:
            self._stage_corpus(sentence_freqs)
        if self._count_overflow:
            return super()._expected_counts(sentence_freqs)
        sentences, chars_dev, lens_dev, freqs_dev, host_idx = self._corpus

        # pad the id axis to a power of two for compile-cache reuse
        Vp = _pow2(max(V, 2))
        pc_p = np.full((Vp, Lt), -1, np.int32)
        pc_p[:V] = pc
        pl_p = np.zeros(Vp, np.int32)
        pl_p[:V] = pl
        ps_p = np.full(Vp, -1e30, np.float32)
        ps_p[:V] = ps

        mesh = self._get_mesh()
        maxcand = min(cfg.max_piece_length, _W)
        prog = _counts_program(mesh, chd.size, chd.n_buckets, Lt, maxcand, Vp)
        fb = jnp.float32(dict(self.vocab).get("<unk>", -100.0))
        hist, poison = prog(
            jnp.asarray(chd.disp), jnp.asarray(chd.rows),
            jnp.asarray(pc_p), jnp.asarray(pl_p), jnp.asarray(ps_p),
            fb, chars_dev, lens_dev, freqs_dev,
        )
        hist = np.asarray(hist)
        poison = np.asarray(poison)

        expected: Counter = Counter()
        for i in np.nonzero(hist[:V])[0]:
            expected[int(i)] = int(hist[i])

        # poisoned rows were excluded from the device histogram;
        # re-segment them (and over-wide sentences) with the exact host DP
        host_rows = sorted(
            set(host_idx)
            | {int(i) for i in np.nonzero(poison)[0] if int(i) < len(sentences)}
        )
        if host_rows:
            vocab_map = dict(self.vocab)
            index = {t: i for i, (t, _) in enumerate(self.vocab)}
            for i in host_rows:
                s = sentences[i]
                sfreq = sentence_freqs[s]
                for tok in self._viterbi_segment(s, vocab_map):
                    j = index.get(tok)
                    if j is not None:
                        expected[j] += sfreq
        return expected
