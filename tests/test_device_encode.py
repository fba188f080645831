"""Device encode pipeline vs the host oracle — exact token-id parity."""

import numpy as np
import pytest

from helpers import SAMPLE_TEXT, conformance_corpus, trained_tokenizer

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def tok():
    t = trained_tokenizer()
    t.use_device = True
    return t


@pytest.fixture(scope="module")
def pipeline(tok):
    p = tok._get_pipeline()
    assert p is not None, "fixture tokenizer should be device-eligible"
    return p


def test_pipeline_eligibility(tok):
    assert tok._get_pipeline() is not None


def test_device_conformance_corpus(tok, pipeline):
    texts = conformance_corpus()
    expected = [tok._encode_host(t) for t in texts]
    got = pipeline.encode_batch(texts)
    for t, e, g in zip(texts, expected, got):
        assert g == e, (repr(t), e, g)


def test_device_long_text_chunking(tok, pipeline):
    long_text = (SAMPLE_TEXT.replace("\n", " ") + " ") * 40  # > 4096 bytes
    assert len(long_text.encode()) > 4096
    expected = tok._encode_host(long_text)
    got = pipeline.encode_batch([long_text])[0]
    assert got == expected


def test_device_pathological_word(tok, pipeline):
    word = "a" * 5000  # single word longer than the widest bucket
    expected = tok._encode_host(word)
    got = pipeline.encode_batch([word])[0]
    assert got == expected


def test_device_empty_and_whitespace(tok, pipeline):
    texts = ["", " ", "\n\n\n", "   \t  "]
    expected = [tok._encode_host(t) for t in texts]
    got = pipeline.encode_batch(texts)
    assert got == expected


def test_encode_batch_routes_through_device(tok):
    texts = conformance_corpus()[:8]
    host = [tok._encode_host(t) for t in texts]
    assert tok.encode_batch(texts) == host


def test_encode_batch_added_token_fallback(tok):
    # texts containing added-token substrings route through the host path
    texts = ["hello <s> world", "plain text"]
    host = [tok._encode_host(t) for t in texts]
    assert tok.encode_batch(texts) == host


def test_device_random_fuzz(tok, pipeline):
    rng = np.random.RandomState(0)
    alphabet = list("abcdefgh '!.123é世 \n\t")
    texts = []
    for _ in range(64):
        n = rng.randint(0, 80)
        texts.append("".join(rng.choice(alphabet) for _ in range(n)))
    expected = [tok._encode_host(t) for t in texts]
    got = pipeline.encode_batch(texts)
    for t, e, g in zip(texts, expected, got):
        assert g == e, (repr(t), e, g)


def test_device_fuzz_heavy(tok, pipeline):
    """Wider fuzz: longer words, repeated chars (overlap runs), deep merge
    chains — the cases that distinguish selection rules."""
    rng = np.random.RandomState(7)
    pieces = [
        "Mixed", "mixing", "mixed", "alphanumeric", "Ελληνικά", "γράμματα",
        "supercalifragilistic", "aaaa", "aaaaaaa", "....", "'''", "!!!",
        "don't", "it's", "123456", "  ", "\t", "é", "日本語", "x",
    ]
    texts = []
    for _ in range(96):
        n = rng.randint(1, 12)
        texts.append(" ".join(pieces[rng.randint(0, len(pieces))] for _ in range(n)))
    expected = [tok._encode_host(t) for t in texts]
    got = pipeline.encode_batch(texts)
    for t, e, g in zip(texts, expected, got):
        assert g == e, (repr(t), e, g)


def test_word_path_matches_host():
    """Device word path (collect misses -> device merge -> shared-cache
    insert -> native assemble) must be id-exact vs the host oracle."""
    import pytest

    from helpers import conformance_corpus, trained_tokenizer

    tok = trained_tokenizer()
    if tok._get_native_encoder() is None:
        pytest.skip("native runtime unavailable")
    wp = tok._get_word_path()
    assert wp is not None
    texts = conformance_corpus()
    normalized = [tok.normalizer.normalize(t) for t in texts]
    data = tok._prepare_bytes(normalized)
    host = [tok._encode_host(t, already_normalized=True) for t in normalized]
    assert wp.encode_batch(data) == host
    # second call: everything cached, zero misses
    assert wp.fill_caches(data) == 0
    assert wp.encode_batch(data) == host
    # backend="device" end-to-end through the public API
    assert tok.encode_batch(texts, backend="device") == [
        tok._encode_host(t) for t in texts
    ]


def test_pallas_seed_matches_xla():
    """Pallas fused seed kernel (interpret mode on CPU) vs the plain-XLA
    gather+mask it replaces."""
    import numpy as np

    jnp = pytest.importorskip("jax.numpy")
    from complexity_tokenizer_tpu.ops.pallas_kernels import pallas_seed_tokens

    rng = np.random.RandomState(7)
    table = rng.randint(-1, 500, size=256).astype(np.int32)
    for B, W in ((16, 128), (4, 256)):
        arr = rng.randint(0, 256, size=(B, W)).astype(np.uint8)
        lens = rng.randint(0, W + 1, size=B).astype(np.int32)
        got = np.asarray(
            pallas_seed_tokens(
                jnp.asarray(arr), jnp.asarray(lens), jnp.asarray(table),
                interpret=True,
            )
        )
        exp = np.where(
            np.arange(W)[None, :] < lens[:, None],
            table[arr.astype(np.int32)],
            -1,
        )
        assert np.array_equal(got, exp)


def test_word_path_adaptive_fill_stays_exact():
    """Once warm, the word path skips the miss scan (ops/wordpath.py
    _maybe_fill); batches with novel words arriving in that state must
    still be exact — the native tier merges and caches them."""
    from helpers import trained_tokenizer

    tok = trained_tokenizer()
    if tok._get_native_encoder() is None:
        pytest.skip("native runtime unavailable")
    wp = tok._get_word_path()
    assert wp is not None
    warm = ["hello world the fox", "quick brown dog"] * 8
    data = tok._prepare_bytes([tok.normalizer.normalize(t) for t in warm])
    for _ in range(3):  # drive into the steady (scan-skipping) state
        wp.encode_batch(data)
    assert wp._steady
    novel = ["zyx wvu tsr qpo", "never seen words appear 987"] * 4
    ndata = tok._prepare_bytes([tok.normalizer.normalize(t) for t in novel])
    host = [tok._encode_host(t) for t in novel]
    assert wp.encode_batch(ndata) == host
    # and the sweep path still fills device-side when it next runs
    wp._batches_since_sweep = wp.sweep_interval
    assert wp.encode_batch(ndata) == host


# ---------------------------------------------------------------------------
# device normalization (SURVEY C3): stability bitmaps + checker


def test_stability_bitmaps_sound():
    """Unflagged codepoints must be fixed points in every context: fuzz
    random strings drawn from unflagged cps and assert normalize == id."""
    import unicodedata

    from complexity_tokenizer_tpu.ops.normalize_device import stability_bitmap

    rng = np.random.RandomState(7)
    for kind, ref in [
        ("NFC", lambda s: unicodedata.normalize("NFC", s)),
        ("NFD", lambda s: unicodedata.normalize("NFD", s)),
        ("NFKC", lambda s: unicodedata.normalize("NFKC", s)),
        ("NFKD", lambda s: unicodedata.normalize("NFKD", s)),
        ("lowercase", lambda s: s.lower()),
    ]:
        bm = stability_bitmap(kind)
        stable = np.nonzero(bm[:0x31000] == 0)[0]
        # random strings over unflagged cps, biased toward BMP + Hangul +
        # Latin composites
        for _ in range(300):
            n = rng.randint(1, 30)
            cps = stable[rng.randint(0, len(stable), size=n)]
            s = "".join(chr(int(c)) for c in cps)
            assert ref(s) == s, (kind, [hex(int(c)) for c in cps])
        # adversarial flagged cases must be flagged
    nfc = stability_bitmap("NFC")
    assert nfc[0x301]  # combining acute
    assert nfc[0x1161] and nfc[0x11A8]  # jamo V / T
    assert not nfc[ord("é")] and not nfc[0xAC00]  # composites stay clean
    assert stability_bitmap("NFKC")[0xFB01]  # fi ligature
    low = stability_bitmap("lowercase")
    assert low[ord("A")] and low[0x3A3] and not low[ord("ß")]


def test_norm_plans_and_checker():
    from complexity_tokenizer_tpu.core import normalizers as N
    from complexity_tokenizer_tpu.ops.normalize_device import (
        DeviceNormChecker,
        plan_for_normalizer,
    )
    from complexity_tokenizer_tpu.ops.pipeline import pack_texts

    # Sequence(NFC, Lowercase) + Strip positional predicate
    plan = plan_for_normalizer(
        N.Sequence([N.NFC(), N.Lowercase(), N.Strip()])
    )
    assert plan is not None
    checker = DeviceNormChecker(plan)
    texts = [
        "already clean lowercase",  # clean
        "Has Uppercase",  # lowercase-unstable
        "cafe\u0301 decomposed",  # NFC-unstable (combining acute)
        " leading space",  # Strip positional
        "clean caf\u00e9 composed",  # composed é is stable
        "",
    ]
    raw = [t.encode("utf-8") for t in texts]
    clean = checker.check_bytes(raw, (128, 512), pack_texts)
    assert clean.tolist() == [True, False, False, False, True, True]

    # Replace: pattern-codepoint bitmap
    plan = plan_for_normalizer(N.Replace("x", "y"))
    checker = DeviceNormChecker(plan)
    raw = [b"no pattern here", b"has x inside"]
    assert checker.check_bytes(raw, (128,), pack_texts).tolist() == [True, False]
    assert plan_for_normalizer(N.Replace("", "y")) is None
    assert plan_for_normalizer(N.Prepend("_")) is None

    # BertNormalizer: CJK + control + uppercase flagged
    plan = plan_for_normalizer(N.BertNormalizer())
    checker = DeviceNormChecker(plan)
    raw = [
        "plain ascii lower".encode(),
        "has 中文 chars".encode(),
        "has\tcontrol-ish ws".encode(),
        "Upper Case".encode(),
    ]
    assert checker.check_bytes(raw, (128,), pack_texts).tolist() == [
        True, False, False, False,
    ]


def test_device_norm_in_pipeline_matches_host():
    """Pipeline with an NFC normalizer: device-checked rows skip the host
    rewrite; results equal all-host normalization byte-for-byte."""
    from complexity_tokenizer_tpu.core import normalizers as N
    from complexity_tokenizer_tpu.ops.pipeline import build_encode_pipeline

    tok = trained_tokenizer()  # fresh instance: don't mutate the fixture
    tok.set_normalizer(N.NFC())
    pipe = build_encode_pipeline(tok)
    assert pipe is not None
    texts = [
        "hello world",
        "cafe\u0301 au lait",  # needs composition
        "caf\u00e9 au lait",  # already composed
        "mixed d\u0323\u0307 orderings",  # ccc reordering case
        "plain ascii",
    ]
    got = pipe._prepare(texts)
    exp = []
    for t in texts:
        t = N.NFC().normalize(t)
        if pipe.add_prefix_space and t and not t.startswith(" "):
            t = " " + t
        exp.append(t.encode("utf-8"))
    assert got == exp


# ---------------------------------------------------------------------------
# word path v2: segment packing + async auto fill


def test_pack_seg_layout():
    """ctok_pack_seg lays words back to back (never spanning rows) with
    1/2/0 marks and correct flat start positions."""
    from helpers import trained_tokenizer

    tok = trained_tokenizer()
    if tok._get_native_encoder() is None:
        pytest.skip("native runtime unavailable")
    wp = tok._get_word_path()
    words = [b"alpha", b"bb", b"c" * 128, b"dd", b"e" * 127]
    buf = np.frombuffer(b"".join(words), np.uint8)
    lens = np.array([len(w) for w in words], np.int32)
    offs = np.zeros(len(words) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    arr, marks, starts, n_fit, rows_used = wp._pack_seg(
        buf, offs, 0, len(words), 8
    )
    assert n_fit == len(words)
    flat_b, flat_m = arr.reshape(-1), marks.reshape(-1)
    pos = 0
    for w, word in enumerate(words):
        s = int(starts[w])
        assert s >= pos  # packing is in order
        assert s // 128 == (s + len(word) - 1) // 128  # never spans rows
        assert flat_b[s : s + len(word)].tobytes() == word
        assert flat_m[s] == 1
        assert (flat_m[s + 1 : s + len(word)] == 2).all()
        pos = s + len(word)
    # pads are zero-marked
    used = np.zeros(8 * 128, bool)
    for w, word in enumerate(words):
        used[int(starts[w]) : int(starts[w]) + len(word)] = True
    assert (flat_m[~used] == 0).all()
    assert rows_used == (int(starts[-1]) + len(words[-1]) + 127) // 128


def test_packed_device_merge_exact():
    """The packed segment merge must match the native per-word merge loop
    for every packed word (including multi-chunk fills)."""
    from helpers import trained_tokenizer

    tok = trained_tokenizer()
    if tok._get_native_encoder() is None:
        pytest.skip("native runtime unavailable")
    wp = tok._get_word_path()
    rng = np.random.RandomState(3)
    words = []
    for _ in range(500):
        n = rng.randint(1, 20)
        # letters only: the word path's contract is single pre-split
        # words (one class run), which is what collect_miss_words emits
        words.append(bytes(rng.choice(list(b"abcdefqxZW"), n).astype(np.uint8)))
    words = [w for w in words if w]
    buf = np.frombuffer(b"".join(words), np.uint8)
    lens = np.array([len(w) for w in words], np.int32)
    ids, counts = wp._encode_words_packed(buf, lens)
    bounds = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=bounds[1:])
    assert len(counts) == len(words)
    for w, word in enumerate(words):
        exp = wp.native.encode(word)
        got = ids[bounds[w] : bounds[w + 1]].tolist()
        assert got == exp, (word, exp, got)


def test_async_auto_fill_exact(monkeypatch):
    """backend='auto' async device fill: batches stay exact while a fill
    is pending, the drained fill lands in the shared caches, and the
    steady state skips scans."""
    from helpers import trained_tokenizer

    monkeypatch.setenv("CTOK_AUTO_DEVICE", "1")  # force on (CPU backend)
    tok = trained_tokenizer()
    if tok._get_native_encoder() is None:
        pytest.skip("native runtime unavailable")
    texts = conformance_corpus()
    host = [tok._encode_host(t) for t in texts]
    assert tok.encode_batch(texts) == host  # fill may be in flight
    wp = tok._auto_word_path()
    assert wp is not None
    wp.drain_async(timeout=120)
    assert not wp._device_broken
    # device-filled caches in play now; results identical
    assert tok.encode_batch(texts) == host
    flat, offs = tok.encode_batch_ragged(texts)
    got = [flat[offs[i] : offs[i + 1]].tolist() for i in range(len(texts))]
    assert got == host
    # no misses left: the corpus' distinct words all landed in the caches
    data = tok._prepare_bytes(tok._normalize_batch(texts))
    _, lens = wp.native.collect_miss_words(data, 128)
    assert len(lens) == 0
    # drive into steady state: scans stop, novel words stay exact
    for _ in range(3):
        tok.encode_batch(texts)
        wp.drain_async(timeout=120)
    assert wp._steady
    novel = ["qqqzz wwxx yyvv 998877"]
    assert tok.encode_batch(novel) == [tok._encode_host(t) for t in novel]


def test_packed_device_merge_full_byte_range():
    """Device fills must be exact for words spanning the full byte range
    (multi-byte UTF-8, high bytes, OOV bytes) — what multilingual corpora
    dispatch to the chip."""
    from helpers import trained_tokenizer

    tok = trained_tokenizer()
    if tok._get_native_encoder() is None:
        pytest.skip("native runtime unavailable")
    wp = tok._get_word_path()
    rng = np.random.RandomState(9)
    words = []
    # UTF-8 words from real multilingual strings (as pre-split units)
    for s in ["日本語", "Ελληνικά", "straße", "héllo", "中文字", "é́"]:
        words.append(s.encode("utf-8"))
    # plus raw high-byte / mixed-byte fuzz (the merge operates on bytes;
    # any byte word the scanner could emit must merge exactly)
    for _ in range(200):
        n = rng.randint(1, 24)
        words.append(bytes(rng.randint(1, 256, size=n).astype(np.uint8)))
    buf = np.frombuffer(b"".join(words), np.uint8)
    lens = np.array([len(w) for w in words], np.int32)
    ids, counts = wp._encode_words_packed(buf, lens)
    bounds = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=bounds[1:])
    assert len(counts) == len(words)
    # oracle: the single-word merge loop (seed per byte, OOV dropped,
    # leftmost-lowest-rank) — core/bpe semantics on raw bytes
    from complexity_tokenizer_tpu.utils.bytelevel import bytes_to_unicode

    enc_map = bytes_to_unicode()
    for w, word in enumerate(words):
        text = "".join(enc_map[b] for b in word)
        exp = tok.bpe.encode(text)
        got = ids[bounds[w] : bounds[w + 1]].tolist()
        assert got == exp, (word, exp, got)


def test_packed_device_merge_large_ids():
    """Vocabs with ids >= 32768 must take the int32 fill output (the
    int16 narrowing is gated on the max producible id)."""
    import json

    from complexity_tokenizer_tpu.tokenizer import Tokenizer
    from complexity_tokenizer_tpu.utils.bytelevel import bytes_to_unicode

    enc = bytes_to_unicode()
    base = 40_000  # every id above the int16 range
    vocab = {enc[b]: base + b for b in range(256)}
    vocab[enc[ord("a")] + enc[ord("b")]] = base + 300
    vocab[enc[ord("a")] + enc[ord("b")] + enc[ord("c")]] = base + 301
    j = {
        "model": {
            "type": "BPE",
            "vocab": vocab,
            "merges": [
                f"{enc[ord('a')]} {enc[ord('b')]}",
                f"{enc[ord('a')] + enc[ord('b')]} {enc[ord('c')]}",
            ],
        },
        "added_tokens": [],
        "normalizer": {"type": "NFC"},
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False},
        "decoder": {"type": "ByteLevel"},
    }
    tok = Tokenizer.from_str(json.dumps(j))
    if tok._get_native_encoder() is None:
        pytest.skip("native runtime unavailable")
    wp = tok._get_word_path()
    assert wp is not None
    words = [b"abc", b"ab", b"abcabc", b"xyz", b"a"]
    buf = np.frombuffer(b"".join(words), np.uint8)
    lens = np.array([len(w) for w in words], np.int32)
    ids, counts = wp._encode_words_packed(buf, lens)
    assert ids.dtype == np.int32 and ids.min() >= 32768
    bounds = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=bounds[1:])
    for w, word in enumerate(words):
        exp = wp.native.encode(word)
        assert ids[bounds[w] : bounds[w + 1]].tolist() == exp, word


def test_qc_table_lookup_parity(tok, pipeline):
    """Quotient-cuckoo probe == merge_ranks dict on every key, INF on
    misses (ops/hashtable.py QcTable; round-4 merge-kernel redesign)."""
    import jax.numpy as jnp

    from complexity_tokenizer_tpu.ops.hashtable import (
        INF_RANK,
        build_qc_table,
        qc_lookup_jnp,
    )

    mr = tok.bpe.merge_ranks
    qc = build_qc_table(mr, tok.bpe.merge_ops)
    assert qc is not None, "trained tokenizer should be qc-eligible"
    keys = list(mr.keys())
    a = jnp.asarray(np.array([k[0] for k in keys], np.int32))
    b = jnp.asarray(np.array([k[1] for k in keys], np.int32))
    t1 = jnp.asarray(qc.t1)
    t2 = jnp.asarray(qc.t2)
    valid = jnp.ones(len(keys), bool)
    rank, minted = qc_lookup_jnp(t1, t2, qc.size, a, b, valid)
    rank = np.asarray(rank)
    minted = np.asarray(minted)
    for i, k in enumerate(keys):
        assert rank[i] == mr[k]
        assert minted[i] == tok.bpe.merge_ops[mr[k]][1]
    # misses: random pairs not in the table -> INF_RANK
    rng = np.random.RandomState(0)
    miss = []
    while len(miss) < 500:
        p = (int(rng.randint(0, 1000)), int(rng.randint(0, 1000)))
        if p not in mr:
            miss.append(p)
    ma = jnp.asarray(np.array([p[0] for p in miss], np.int32))
    mb = jnp.asarray(np.array([p[1] for p in miss], np.int32))
    mrank, _ = qc_lookup_jnp(t1, t2, qc.size, ma, mb, jnp.ones(len(miss), bool))
    assert (np.asarray(mrank) == INF_RANK).all()
    # ~valid masks everything
    vrank, _ = qc_lookup_jnp(t1, t2, qc.size, a, b, jnp.zeros(len(keys), bool))
    assert (np.asarray(vrank) == INF_RANK).all()


def test_qc_table_eligibility():
    """Out-of-range ids/ranks refuse the qc form (CHD fallback); sparse
    non-affine minted ids are fine (the row stores the minted id)."""
    import jax.numpy as jnp

    from complexity_tokenizer_tpu.ops.hashtable import (
        build_qc_table,
        qc_lookup_jnp,
    )

    # non-affine minted ids build fine and look up exactly
    qc = build_qc_table(
        {(1, 2): 0, (3, 4): 7},
        {0: ((1, 2), 10), 7: ((3, 4), 99)},
    )
    assert qc is not None
    rank, minted = qc_lookup_jnp(
        jnp.asarray(qc.t1), jnp.asarray(qc.t2), qc.size,
        jnp.asarray(np.array([1, 3], np.int32)),
        jnp.asarray(np.array([2, 4], np.int32)),
        jnp.ones(2, bool),
    )
    assert np.asarray(rank).tolist() == [0, 7]
    assert np.asarray(minted).tolist() == [10, 99]
    # rank beyond u16
    assert (
        build_qc_table({(1, 2): 0x10000}, {0x10000: ((1, 2), 0x1005)})
        is None
    )
    # token id beyond the packable range
    assert (
        build_qc_table({(70000, 2): 0}, {0: ((70000, 2), 701)}) is None
    )
    # minted id beyond u16
    assert (
        build_qc_table({(1, 2): 0}, {0: ((1, 2), 0x10000)}) is None
    )
    # minted id of exactly 0xFFFF is REJECTED: a runtime-adjacent pair
    # (65535, 65535) packs to 0xFFFFFFFF = the empty-slot sentinel and
    # would false-hit on empty slots (ADVICE r4 high finding)
    assert (
        build_qc_table({(1, 2): 0}, {0: ((1, 2), 0xFFFF)}) is None
    )
    # ...and the lookup itself masks the sentinel pair: probing
    # (65535, 65535) must miss (INF_RANK), never alias an empty slot
    from complexity_tokenizer_tpu.ops.hashtable import INF_RANK

    rank, _ = qc_lookup_jnp(
        jnp.asarray(qc.t1), jnp.asarray(qc.t2), qc.size,
        jnp.asarray(np.array([0xFFFF], np.int32)),
        jnp.asarray(np.array([0xFFFF], np.int32)),
        jnp.ones(1, bool),
    )
    assert int(np.asarray(rank)[0]) == int(INF_RANK)


def test_merge_words_qc_matches_chd(tok, pipeline):
    """The qc and CHD fixpoints are bit-identical on a packed batch."""
    import jax.numpy as jnp

    from complexity_tokenizer_tpu.ops.merge import merge_words, merge_words_qc

    assert pipeline.qc_t1 is not None
    rng = np.random.RandomState(3)
    btt = np.asarray(pipeline.byte_token_table)
    letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", np.uint8)
    raw = letters[rng.randint(0, 27, size=(16, 128))]
    toks = btt[raw.astype(np.int32)]
    # word ids from the spaces (simple segmentation for the test)
    wid = np.cumsum(raw == ord(" "), axis=1).astype(np.int32)
    valid = np.ones_like(toks, bool)
    toks = np.where(valid, toks, -1).astype(np.int32)
    t = jnp.asarray(toks)
    w = jnp.asarray(wid)
    out_chd, cnt_chd = merge_words(
        t, w, pipeline.disp, pipeline.rows, pipeline.table_size,
        pipeline.n_buckets,
    )
    out_qc, cnt_qc = merge_words_qc(
        t, w, pipeline.qc_t1, pipeline.qc_t2, pipeline.qc_size
    )
    assert (np.asarray(out_chd) == np.asarray(out_qc)).all()
    assert (np.asarray(cnt_chd) == np.asarray(cnt_qc)).all()


def test_phased_fill_matches_unphased(monkeypatch):
    """Mid-fixpoint lane compaction (ops/merge.phased_merge_words) is
    bit-exact vs the unphased body, including words that vanish to OOV
    and 1-byte words.  Phasing is opt-in (the round-5 on-chip A/B
    measured it neutral — see wordpath._phase_n1), so the test enables
    it explicitly."""
    from helpers import trained_tokenizer

    tok = trained_tokenizer()
    if tok._get_native_encoder() is None:
        pytest.skip("native runtime unavailable")
    monkeypatch.setenv("CTOK_PHASE_N1", "6")
    wp = tok._get_word_path()
    assert wp._phase_n1 > 0
    rng = np.random.RandomState(11)
    words = [b"a", b"zz"]
    for _ in range(700):
        n = rng.randint(1, 24)
        words.append(
            bytes(rng.choice(list(b"abcdefghiqxZW"), n).astype(np.uint8))
        )
    buf = np.frombuffer(b"".join(words), np.uint8)
    lens = np.array([len(w) for w in words], np.int32)
    ids_p, cnt_p = wp._encode_words_packed(buf, lens)

    tok2 = trained_tokenizer()
    monkeypatch.setenv("CTOK_PHASE_N1", "0")
    wp2 = tok2._get_word_path()
    assert wp2._phase_n1 == 0
    assert wp2 is not wp
    ids_u, cnt_u = wp2._encode_words_packed(buf, lens)
    assert cnt_p.tolist() == cnt_u.tolist()
    assert ids_p.tolist() == ids_u.tolist()
    # and both match the native oracle
    bounds = np.zeros(len(cnt_p) + 1, np.int64)
    np.cumsum(np.where(cnt_p < 0, 0, cnt_p), out=bounds[1:])
    for w in range(0, len(words), 37):
        if cnt_p[w] < 0:
            continue
        assert (
            ids_p[bounds[w] : bounds[w + 1]].tolist()
            == wp.native.encode(words[w])
        )


def test_phased_fill_spill_redispatch(monkeypatch):
    """A pack of 1-byte words cannot halve (every lane stays alive):
    the phase-spill sentinel must drive the full-capacity redispatch
    and results stay exact."""
    from helpers import trained_tokenizer

    tok = trained_tokenizer()
    if tok._get_native_encoder() is None:
        pytest.skip("native runtime unavailable")
    monkeypatch.setenv("CTOK_PHASE_N1", "6")
    wp = tok._get_word_path()
    assert wp._phase_n1 > 0
    # >64 single-byte words per 128-lane row -> kept lanes exceed W/2
    words = [bytes([c]) for c in b"abcdefgh" * 40]
    buf = np.frombuffer(b"".join(words), np.uint8)
    lens = np.ones(len(words), np.int32)
    ids, counts = wp._encode_words_packed(buf, lens)
    assert counts.tolist() == [1] * len(words)
    bounds = np.arange(len(words) + 1)
    for w in range(0, len(words), 17):
        assert (
            ids[bounds[w] : bounds[w + 1]].tolist()
            == wp.native.encode(words[w])
        )
