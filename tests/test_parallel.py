"""Multi-device tests on the forced 8-device CPU mesh: sharded encode,
distributed trainer parity vs the host trainer, psum histogram
correctness."""

import numpy as np
import pytest

from helpers import SAMPLE_TEXT, conformance_corpus, trained_tokenizer

jax = pytest.importorskip("jax")


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_encode_matches_host():
    from complexity_tokenizer_tpu.parallel import data_mesh, shard_encode_pipeline

    tok = trained_tokenizer()
    pipeline = tok._get_pipeline()
    assert pipeline is not None
    shard_encode_pipeline(pipeline, data_mesh())
    texts = conformance_corpus()
    expected = [tok._encode_host(t) for t in texts]
    got = pipeline.encode_batch(texts)
    for t, e, g in zip(texts, expected, got):
        assert g == e, repr(t)


def test_distributed_trainer_matches_host_trainer():
    from complexity_tokenizer_tpu.parallel.trainer import DistributedInlTrainer
    from complexity_tokenizer_tpu.trainers.inl_trainer import (
        InlBpeTrainer,
        TrainerConfig,
    )

    texts = [SAMPLE_TEXT, "hello world hello", "the quick brown fox"] * 2
    cfg = dict(vocab_size=400, min_frequency=1)
    host = InlBpeTrainer(TrainerConfig(**cfg))
    host.train_from_texts(list(texts))
    dist = DistributedInlTrainer(TrainerConfig(**cfg))
    dist.train_from_texts(list(texts))
    assert dist.vocab == host.vocab
    assert dist.merges == host.merges
    assert dist.token_freqs == {
        k: v for k, v in host.token_freqs.items()
    }


def test_distributed_trainer_with_inl_dynamics():
    from complexity_tokenizer_tpu.parallel.trainer import DistributedInlTrainer
    from complexity_tokenizer_tpu.trainers.inl_trainer import (
        InlBpeTrainer,
        TrainerConfig,
    )

    texts = ["aaa bbb aaa bbb ccc ddd " * 3, SAMPLE_TEXT]
    cfg = dict(
        vocab_size=350, min_frequency=1, inl_alpha=0.9, inl_beta=0.3, inl_gate=0.5
    )
    host = InlBpeTrainer(TrainerConfig(**cfg))
    host.train_from_texts(list(texts))
    dist = DistributedInlTrainer(TrainerConfig(**cfg))
    dist.train_from_texts(list(texts))
    assert dist.merges == host.merges
    # the INL path must have taken the device-resident window loop
    # (VERDICT r4 item 6), not the per-merge host round trips
    assert getattr(dist, "_select_block_times", None), (
        "INL mode did not take the window-block path"
    )


def test_distributed_trainer_inl_window_overflow(monkeypatch):
    """Forcing a tiny candidate list (T=4) makes every window exhaust
    its device candidates mid-window, driving the host-side walk
    continuation — the rare path must stay bit-exact with the host
    trainer (parallel/trainer.py _inl_window_loop)."""
    from complexity_tokenizer_tpu.parallel.trainer import DistributedInlTrainer
    from complexity_tokenizer_tpu.trainers.inl_trainer import (
        InlBpeTrainer,
        TrainerConfig,
    )

    texts = ["aaa bbb aaa bbb ccc ddd " * 3, SAMPLE_TEXT]
    cfg = dict(
        vocab_size=330, min_frequency=1, inl_alpha=0.9, inl_beta=0.3,
        inl_gate=0.5,
    )
    host = InlBpeTrainer(TrainerConfig(**cfg))
    host.train_from_texts(list(texts))
    monkeypatch.setattr(DistributedInlTrainer, "_INL_WINDOW_T", 4)
    dist = DistributedInlTrainer(TrainerConfig(**cfg))
    dist.train_from_texts(list(texts))
    assert dist.merges == host.merges
    assert dist.vocab == host.vocab


def test_initial_hist_psum():
    from complexity_tokenizer_tpu.parallel.mesh import DATA_AXIS, data_mesh
    from complexity_tokenizer_tpu.parallel.trainer import make_initial_hist
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = data_mesh()
    v0 = 5
    words = np.array(
        [[0, 1, 2, -1], [1, 1, 1, 1], [2, 3, -1, -1], [4, 0, 4, 0]] * 2,
        dtype=np.int32,
    )
    freqs = np.array([1, 2, 3, 1] * 2, dtype=np.int32)
    hist_fn = make_initial_hist(v0)

    def f(w, fr):
        return jax.lax.psum(hist_fn(w, fr), DATA_AXIS)

    out = jax.shard_map(
        f, mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)), out_specs=P()
    )(
        jax.device_put(words, NamedSharding(mesh, P(DATA_AXIS))),
        jax.device_put(freqs, NamedSharding(mesh, P(DATA_AXIS))),
    )
    out = np.asarray(out).reshape(v0, v0)
    expected = np.zeros((v0, v0), np.int64)
    for row, fr in zip(words, freqs):
        toks = [t for t in row if t >= 0]
        for i in range(len(toks) - 1):
            expected[toks[i], toks[i + 1]] += fr
    np.testing.assert_array_equal(out, expected)


def test_merge_step_deltas_adjacent_occurrences():
    """The 'x a b a b y' case: net deltas must match the reference walk."""
    from complexity_tokenizer_tpu.parallel.trainer import make_merge_step

    V = 10
    step = make_merge_step(V)
    x, a, b, y, N = 5, 1, 2, 6, 7
    words = np.array([[x, a, b, a, b, y]], dtype=np.int32)
    freqs = np.array([3], dtype=np.int32)
    out, delta, minted = jax.jit(step, static_argnums=())(
        words, freqs, np.int32(a), np.int32(b), np.int32(N)
    )
    out = np.asarray(out)
    delta = np.asarray(delta)
    assert minted == 6  # two occurrences x freq 3
    # tombstone layout (round 4): the word IS its alive subsequence
    assert out[0][out[0] >= 0].tolist() == [x, N, N, y]
    # destroyed (x,a): x edge and (b,a) between matches
    assert delta[x, 0] == 3 and delta[b, 0] == 3
    # destroyed (b,y): right edge of last match only
    assert delta[y, 1] == 3
    # created (x,N) and (N,N)
    assert delta[x, 2] == 3 and delta[N, 2] == 3
    # created (N,y)
    assert delta[y, 3] == 3


def test_merge_step_overlapping_same_token():
    """'aaa' with pair (a,a): leftmost-priority non-overlap."""
    from complexity_tokenizer_tpu.parallel.trainer import make_merge_step

    step = make_merge_step(8)
    a, N = 1, 4
    words = np.array([[a, a, a, -1]], dtype=np.int32)
    freqs = np.array([2], dtype=np.int32)
    out, delta, minted = step(words, freqs, np.int32(a), np.int32(a), np.int32(N))
    out = np.asarray(out)
    assert minted == 2
    assert out[0][out[0] >= 0].tolist() == [N, a]


def test_distributed_unigram_trainer_matches_host():
    """Device Viterbi E-step + psum histograms vs the host EM loop:
    bit-identical vocab (SURVEY C16)."""
    from complexity_tokenizer_tpu.parallel.unigram_trainer import (
        DistributedUnigramTrainer,
    )
    from complexity_tokenizer_tpu.trainers.unigram_trainer import (
        UnigramTrainer,
        UnigramTrainerConfig,
    )

    texts = [
        "hello world this is a test",
        "the quick brown fox jumps over the lazy dog",
        "unigram training corpus with 日本語 and café text",
        "more text to segment here",
        "hello hello world world",
    ] * 5
    cfg = dict(
        vocab_size=60, n_iterations=5, max_piece_length=6,
        initial_vocab_size=400,
    )
    host = UnigramTrainer(UnigramTrainerConfig(**cfg))
    host.train_from_texts(texts)
    dist = DistributedUnigramTrainer(UnigramTrainerConfig(**cfg))
    model = dist.train_from_texts(texts)
    assert host.vocab == dist.vocab
    # the returned model segments through the trained pieces
    assert model.encode("hello") != []


def test_distributed_unigram_trainer_overwide_sentences():
    """Sentences beyond the 128-lane width are E-stepped on host; counts
    still merge into the same histogram as the all-host trainer."""
    from complexity_tokenizer_tpu.parallel.unigram_trainer import (
        DistributedUnigramTrainer,
    )
    from complexity_tokenizer_tpu.trainers.unigram_trainer import (
        UnigramTrainer,
        UnigramTrainerConfig,
    )

    long_word = "ab" * 100  # 200 chars, over the lane width
    texts = ["short words here", long_word, "ab ab ab"] * 3
    cfg = dict(
        vocab_size=20, n_iterations=3, max_piece_length=4,
        initial_vocab_size=150,
    )
    host = UnigramTrainer(UnigramTrainerConfig(**cfg))
    host.train_from_texts(texts)
    dist = DistributedUnigramTrainer(UnigramTrainerConfig(**cfg))
    dist.train_from_texts(texts)
    assert host.vocab == dist.vocab


def test_distributed_wordpiece_trainer_matches_host():
    """Device greedy re-tokenization + sharded sort/unique pair counts vs
    the host trainer: bit-identical vocab (SURVEY C15)."""
    from complexity_tokenizer_tpu.parallel.wordpiece_trainer import (
        DistributedWordPieceTrainer,
    )
    from complexity_tokenizer_tpu.trainers.wordpiece_trainer import (
        WordPieceTrainer,
        WordPieceTrainerConfig,
    )

    texts = [
        "hello world this is a test",
        "the quick brown fox jumps over the lazy dog",
        "wordpiece training corpus with unusual words",
        "hello hello world",
        "##literal prefix words here",
        "café über naïve 日本語",
    ] * 4
    cfg = dict(vocab_size=120, min_frequency=1)
    host = WordPieceTrainer(WordPieceTrainerConfig(**cfg))
    host.train_from_texts(texts)
    dist = DistributedWordPieceTrainer(WordPieceTrainerConfig(**cfg))
    model = dist.train_from_texts(texts)
    assert host.vocab == dist.vocab
    # the returned model tokenizes through the trained vocab
    assert model.encode("hello world") == [
        model.vocab[t] for t in ("hello", "world")
    ]


def test_distributed_wordpiece_trainer_overwide_words():
    """Words beyond the 128-lane width are tokenized+counted on host each
    round; the merged histogram still matches the all-host trainer."""
    from complexity_tokenizer_tpu.parallel.wordpiece_trainer import (
        DistributedWordPieceTrainer,
    )
    from complexity_tokenizer_tpu.trainers.wordpiece_trainer import (
        WordPieceTrainer,
        WordPieceTrainerConfig,
    )

    wide = "xy" * 80  # 160 chars
    texts = ["aa bb aa", wide, "xy xy yx"] * 3
    cfg = dict(vocab_size=30, min_frequency=1)
    host = WordPieceTrainer(WordPieceTrainerConfig(**cfg))
    host.train_from_texts(texts)
    dist = DistributedWordPieceTrainer(WordPieceTrainerConfig(**cfg))
    dist.train_from_texts(texts)
    assert host.vocab == dist.vocab


def test_distributed_wordpiece_fallback_resets_state():
    """Host-fallback paths must not inherit a partially-built vocab
    (regression: fallback after vocab init produced duplicate ids)."""
    from complexity_tokenizer_tpu.parallel.wordpiece_trainer import (
        DistributedWordPieceTrainer,
    )
    from complexity_tokenizer_tpu.trainers.wordpiece_trainer import (
        WordPieceTrainer,
        WordPieceTrainerConfig,
    )

    texts = ["aa bb ab ba", "bb aa ab"] * 3
    # vocab_size large enough that the packed-symbol cap check trips the
    # host fallback immediately (after specials+alphabet were registered)
    cfg = dict(vocab_size=32760, min_frequency=1)
    dist = DistributedWordPieceTrainer(WordPieceTrainerConfig(**cfg))
    dist.train_from_texts(texts)
    host = WordPieceTrainer(WordPieceTrainerConfig(**cfg))
    host.train_from_texts(texts)
    assert dist.vocab == host.vocab
    ids = sorted(dist.vocab.values())
    assert ids == list(range(len(ids)))  # no duplicate / skipped ids


def test_distributed_wordpiece_int32_overflow_guard():
    """Weighted pair mass >= 2^31 must route to the exact host trainer
    instead of wrapping the device int32 cumsum."""
    from collections import Counter

    from complexity_tokenizer_tpu.parallel.wordpiece_trainer import (
        DistributedWordPieceTrainer,
    )
    from complexity_tokenizer_tpu.trainers.wordpiece_trainer import (
        WordPieceTrainer,
        WordPieceTrainerConfig,
    )

    wf = Counter({"ab": 1 << 31, "ba": 3, "aa": 2})
    cfg = dict(vocab_size=12, min_frequency=1)
    dist = DistributedWordPieceTrainer(WordPieceTrainerConfig(**cfg))
    dist._train_from_word_freqs(Counter(wf))
    host = WordPieceTrainer(WordPieceTrainerConfig(**cfg))
    host._train_from_word_freqs(Counter(wf))
    assert dist.vocab == host.vocab


def test_distributed_unigram_reuse_and_overflow_guard():
    """A reused trainer must re-stage its corpus (regression: the second
    train ran against the first corpus's tensor); huge sentence freqs
    route the E-step to host instead of wrapping int32 histograms."""
    from collections import Counter

    from complexity_tokenizer_tpu.parallel.unigram_trainer import (
        DistributedUnigramTrainer,
    )
    from complexity_tokenizer_tpu.trainers.unigram_trainer import (
        UnigramTrainer,
        UnigramTrainerConfig,
    )

    cfg = dict(vocab_size=20, n_iterations=3, max_piece_length=4,
               initial_vocab_size=150)
    dist = DistributedUnigramTrainer(UnigramTrainerConfig(**cfg))
    dist.train_from_texts(["first corpus words here"] * 4)
    dist.train_from_texts(["totally different second corpus"] * 4)
    host = UnigramTrainer(UnigramTrainerConfig(**cfg))
    host.train_from_texts(["totally different second corpus"] * 4)
    assert dist.vocab == host.vocab

    # overflow guard: sentence freq pushing total piece mass over 2^31
    d2 = DistributedUnigramTrainer(UnigramTrainerConfig(**cfg))
    d2._stage_corpus(Counter({"abab": 1 << 29}))
    assert d2._count_overflow  # 2^29 * len("abab") = 2^31 triggers it


def test_distributed_trainer_classic_mode_matches_host():
    """Classic mode (INL gate 0) uses the exact lazy-deletion heap: newly
    created pairs must be eligible immediately (regression: the interval
    walk reused a stale order for 100 merges and diverged from the host)."""
    from complexity_tokenizer_tpu.parallel.trainer import DistributedInlTrainer
    from complexity_tokenizer_tpu.trainers.inl_trainer import (
        InlBpeTrainer,
        TrainerConfig,
    )

    texts = ["hello world hello", "the quick brown fox", "worldly words matter"] * 30
    cfg = dict(
        vocab_size=400, min_frequency=1, inl_alpha=0.0, inl_beta=0.0, inl_gate=0.0
    )
    host = InlBpeTrainer(TrainerConfig(**cfg))
    host.train_from_texts(list(texts))
    dist = DistributedInlTrainer(TrainerConfig(**cfg))
    dist.train_from_texts(list(texts))
    assert dist.merges == host.merges
    assert dist.vocab == host.vocab


def test_distributed_trainer_two_process_cluster():
    """Genuine multi-controller run: two jax.distributed processes with 4
    CPU devices each train the distributed INL trainer over the shared
    8-device mesh; both must reproduce the host trainer's merges exactly
    (SURVEY §5.8 multi-host story)."""
    import socket
    import subprocess
    import sys as _sys
    import textwrap

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = textwrap.dedent(
        """
        import sys, os
        proc_id = int(sys.argv[1]); port = sys.argv[2]
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        sys.path.insert(0, %r)
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.distributed.initialize("127.0.0.1:" + port, 2, proc_id)
        assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
        from complexity_tokenizer_tpu.parallel.trainer import DistributedInlTrainer
        from complexity_tokenizer_tpu.trainers.inl_trainer import InlBpeTrainer, TrainerConfig
        texts = ["hello world hello", "the quick brown fox", "worldly words matter"] * 30
        cfg = dict(vocab_size=300, min_frequency=1, inl_alpha=0.0, inl_beta=0.0, inl_gate=0.0)
        dt = DistributedInlTrainer(TrainerConfig(**cfg)); dt.train_from_texts(texts)
        ht = InlBpeTrainer(TrainerConfig(**cfg)); ht.train_from_texts(texts)
        assert dt.merges == ht.merges and dt.vocab == ht.vocab
        from complexity_tokenizer_tpu.parallel.wordpiece_trainer import DistributedWordPieceTrainer
        from complexity_tokenizer_tpu.trainers.wordpiece_trainer import WordPieceTrainer, WordPieceTrainerConfig
        wcfg = WordPieceTrainerConfig(vocab_size=120, min_frequency=1)
        dm = DistributedWordPieceTrainer(wcfg).train_from_texts(texts[:60])
        hm = WordPieceTrainer(wcfg).train_from_texts(texts[:60])
        assert dm.vocab == hm.vocab
        from complexity_tokenizer_tpu.parallel.unigram_trainer import DistributedUnigramTrainer
        from complexity_tokenizer_tpu.trainers.unigram_trainer import UnigramTrainer, UnigramTrainerConfig
        ucfg = UnigramTrainerConfig(vocab_size=80)
        du = DistributedUnigramTrainer(ucfg).train_from_texts(texts[:60])
        hu = UnigramTrainer(ucfg).train_from_texts(texts[:60])
        assert du.vocab == hu.vocab
        print("MULTIPROC_OK", flush=True)
        """
    ) % (str(__import__("pathlib").Path(__file__).resolve().parents[1]),)

    env = {
        k: v
        for k, v in __import__("os").environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [_sys.executable, "-c", script, str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        assert "MULTIPROC_OK" in out, out[-2000:]


def test_sharded_word_fill_matches_unsharded():
    """The shard_map fill (per-device local compaction, zero collectives)
    must be bit-identical to the single-block form, including the
    compaction-spill redispatch path."""
    from complexity_tokenizer_tpu.parallel import data_mesh
    from complexity_tokenizer_tpu.parallel.encode import shard_word_encoder

    tok = trained_tokenizer()
    wp = tok._get_word_path()
    if wp is None:
        pytest.skip("word path unavailable")
    rng = np.random.RandomState(3)
    n_w = 700
    wlens = rng.randint(1, 14, size=n_w).astype(np.int32)
    # low-merge random words: most bytes stay single tokens, so the
    # compact 3/8 cap overflows and the spill redispatch is exercised
    wbuf = (rng.randint(0, 26, size=int(wlens.sum())) + 97).astype(np.uint8)
    ids_1, cnt_1 = wp._encode_words_packed(wbuf, wlens)
    shard_word_encoder(wp, data_mesh())
    try:
        ids_n, cnt_n = wp._encode_words_packed(wbuf, wlens)
    finally:
        wp.sharding = None
    assert cnt_n.tolist() == cnt_1.tolist()
    assert ids_n.tolist() == ids_1.tolist()


def test_distributed_trainer_classic_batched_parity():
    """Classic mode (inl_gate=0) takes the device-resident k-merge-block
    selection path (parallel/trainer.make_k_merge_steps) and reproduces
    the host trainer's merges bit-exactly, including the argmax
    tie-break (= heap (a,b)-ascending order)."""
    from complexity_tokenizer_tpu.parallel.trainer import DistributedInlTrainer
    from complexity_tokenizer_tpu.trainers.inl_trainer import (
        InlBpeTrainer,
        TrainerConfig,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "hello world this is a training corpus for merges",
        "pack my box with five dozen liquor jugs",
        "aaa aaaa aaaaa repeated runs a a aa",
    ] * 10
    cfg = dict(
        vocab_size=400, min_frequency=1,
        inl_alpha=0.0, inl_beta=0.0, inl_gate=0.0,
    )
    import contextlib
    import io

    dist = DistributedInlTrainer(TrainerConfig(**cfg))
    with contextlib.redirect_stdout(io.StringIO()):
        dist.train_from_texts(texts)
    assert getattr(dist, "_select_block_times", None), (
        "classic mode must use the batched selection path"
    )
    host = InlBpeTrainer(TrainerConfig(**cfg))
    with contextlib.redirect_stdout(io.StringIO()):
        host.train_from_texts(texts)
    assert dist.merges == host.merges
    assert dist.vocab == host.vocab
    # pair_freqs re-synced from the device histogram must equal host's
    hd = {p: f for p, f in dist.pair_freqs.items() if f > 0}
    hh = {p: f for p, f in host.pair_freqs.items() if f > 0}
    assert hd == hh
