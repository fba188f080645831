"""Native C++ host runtime vs the Python oracle — exact parity."""

import numpy as np
import pytest

from helpers import SAMPLE_TEXT, conformance_corpus, trained_tokenizer

native = pytest.importorskip("complexity_tokenizer_tpu.native")

if not native.available():
    pytest.skip("no C++ toolchain available", allow_module_level=True)


def _native_encoder(tok):
    from complexity_tokenizer_tpu.utils.bytelevel import bytes_to_unicode

    enc = bytes_to_unicode()
    byte_token = np.full(256, -1, dtype=np.int32)
    for b in range(256):
        tid = tok.bpe.vocab.get(enc[b])
        if tid is not None:
            byte_token[b] = tid
    return native.NativeEncoder(tok.bpe.merge_ranks, tok.bpe.merge_ops, byte_token)


def test_native_encode_matches_oracle():
    tok = trained_tokenizer()
    tok.use_device = False
    ne = _native_encoder(tok)
    for text in conformance_corpus() + [SAMPLE_TEXT]:
        normalized = tok.normalizer.normalize(text)
        expected = tok._encode_host(normalized, already_normalized=True)
        got = ne.encode(normalized.encode("utf-8"))
        assert got == expected, repr(text)


def test_native_encode_fuzz():
    tok = trained_tokenizer()
    ne = _native_encoder(tok)
    rng = np.random.RandomState(3)
    alphabet = list("abcdef '!.12é日 \n\t ")
    for _ in range(200):
        n = rng.randint(0, 60)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        normalized = tok.normalizer.normalize(text)
        expected = tok._encode_host(normalized, already_normalized=True)
        assert ne.encode(normalized.encode("utf-8")) == expected, repr(text)


def test_tokenizer_encode_uses_native():
    tok = trained_tokenizer()
    assert tok._get_native_encoder() is not None
    for text in conformance_corpus()[:10]:
        assert tok.encode(text) == tok._encode_host(text)


def test_native_pack_matches_python():
    from complexity_tokenizer_tpu.native import native_pack

    data = [b"hello", b"", b"a" * 10, "日本".encode()]
    arr, lens = native_pack(data, 16, 8)
    assert arr.shape == (8, 16)
    assert lens.tolist()[:4] == [5, 0, 10, 6]
    assert bytes(arr[0, :5]) == b"hello"
    assert arr[1].sum() == 0
    assert arr[4:].sum() == 0


def test_native_encode_batch_matches_host():
    tok = trained_tokenizer()
    ne = tok._get_native_encoder()
    assert ne is not None
    texts = conformance_corpus()
    normalized = [tok.normalizer.normalize(t) for t in texts]
    expected = [tok._encode_host(t, already_normalized=True) for t in normalized]
    got = ne.encode_batch([t.encode("utf-8") for t in normalized])
    assert got == expected
    # cache warm second pass identical
    got2 = ne.encode_batch([t.encode("utf-8") for t in normalized])
    assert got2 == expected


def test_encode_batch_backends_agree():
    tok = trained_tokenizer()
    texts = conformance_corpus()[:12] + ["with <s> token inside"]
    host = tok.encode_batch(texts, backend="host")
    assert tok.encode_batch(texts, backend="native") == host
    assert tok.encode_batch(texts, backend="auto") == host


def test_encode_batch_ragged():
    import numpy as np

    tok = trained_tokenizer()
    texts = conformance_corpus()
    flat, offsets = tok.encode_batch_ragged(texts)
    rows = tok.encode_batch(texts, backend="host")
    assert offsets[0] == 0 and offsets[-1] == len(flat)
    for i, r in enumerate(rows):
        np.testing.assert_array_equal(flat[offsets[i] : offsets[i + 1]], r)

def test_simd_scanner_fuzz_long_runs():
    """Pin the SSE2 run scanner (run_stop_mask16 / extend_run): random texts
    with long single-class runs crossing 16-byte block boundaries, mixed
    with multi-byte UTF-8 of both same and different classes."""
    tok = trained_tokenizer()
    ne = _native_encoder(tok)
    rng = np.random.RandomState(11)
    pieces = [
        "a" * 15, "b" * 16, "c" * 17, "d" * 33, "1" * 16, "2" * 31,
        " " * 16, " " * 17, "\t" * 20, "!" * 16, "?" * 18,
        "é" * 10, "日" * 6, "é" * 5, "'ll", "'s", "'", "x", " ",
    ]
    for _ in range(300):
        n = rng.randint(1, 8)
        text = "".join(pieces[rng.randint(len(pieces))] for _ in range(n))
        normalized = tok.normalizer.normalize(text)
        expected = tok._encode_host(normalized, already_normalized=True)
        assert ne.encode(normalized.encode("utf-8")) == expected, repr(text)


def test_ascii_boundary_scanner_fuzz():
    """Pin the whole-text ASCII boundary-bitmask scanner (AVX-512 path in
    encode_text): pure-ASCII texts with class transitions, isolated and
    multi-space runs, and contractions placed across 64-byte block edges,
    plus texts >2560 B to force the heap-buffer path.  Non-ASCII rows in
    the same batch verify the scalar fallback interleaves cleanly."""
    tok = trained_tokenizer()
    ne = _native_encoder(tok)
    rng = np.random.RandomState(23)
    pieces = [
        "word", "a", "B", "42", "7", "!", "!!", "...", " ", "  ", "   ",
        "\t", "\n", "'s", "'ll", "'re", "'t", "'", "don't", "it's",
        "x" * 63, "y" * 64, "z" * 65, " " * 63, " " * 64, "9" * 70,
    ]
    for trial in range(400):
        n = rng.randint(1, 12)
        text = "".join(pieces[rng.randint(len(pieces))] for _ in range(n))
        if trial % 10 == 0:
            text = text * 40  # >2560 B: heap-buffer path
        if trial % 7 == 0:
            text += "é"  # scalar fallback row
        normalized = tok.normalizer.normalize(text)
        expected = tok._encode_host(normalized, already_normalized=True)
        assert ne.encode(normalized.encode("utf-8")) == expected, repr(text[:80])
    # isolated space exactly at bit 63/0 of a block: the removal pass
    # carries pisol/pws across block edges
    for pad in (62, 63, 64, 126, 127, 128):
        for tail in ("a b", "1 !", "' 's", "ab  cd"):
            text = "q" * pad + " " + tail
            expected = tok._encode_host(text, already_normalized=True)
            assert ne.encode(text.encode("utf-8")) == expected, (pad, tail)


def test_short_cache_collision_and_reuse():
    """Words <= 8 bytes go through the inline-key ShortCache; verify heavy
    reuse and near-identical keys (same bytes, different lengths) stay
    exact across repeated batch calls."""
    tok = trained_tokenizer()
    ne = _native_encoder(tok)
    words = ["a", "aa", "aaa", "aaaa", "ab", "ba", "abc", "abcd",
             "abcdefgh", "abcdefg", " a", " ab", "1", "12", "123"]
    texts = [" ".join(words), " ".join(reversed(words))] * 5
    expected = [
        tok._encode_host(tok.normalizer.normalize(t), already_normalized=True)
        for t in texts
    ]
    for _ in range(3):
        got = ne.encode_batch([tok.normalizer.normalize(t).encode() for t in texts])
        assert got == expected


def test_fused_extension_matches_bytes_path():
    """The _ctok_ext fused entry (str-in, GIL-released) must agree with the
    ctypes bytes-in path and the host oracle, including added-token
    flagging."""
    from complexity_tokenizer_tpu.native import load_ext

    if load_ext() is None:
        pytest.skip("extension surface unavailable")
    tok = trained_tokenizer()
    ne = tok._get_native_encoder()
    texts = conformance_corpus() + ["has <s> inside", "", "plain"]
    normalized = [tok.normalizer.normalize(t) for t in texts]
    pats = tok._added_byte_patterns()
    flat, offs, flagged, nonascii = ne.encode_ragged_fused(
        normalized, False, pats
    )
    assert nonascii is None  # ascii_norm off: nothing flagged non-ASCII
    host = [tok._encode_host(t, already_normalized=True) for t in normalized]
    flagged = set(flagged or [])
    for i, h in enumerate(host):
        if i in flagged:
            assert offs[i] == offs[i + 1]  # flagged rows compact as empty
        else:
            assert flat[offs[i] : offs[i + 1]].tolist() == h, repr(texts[i])
    assert any("<s>" in t for t in texts) and flagged, "gate should flag <s>"


def test_native_decoder_matches_python():
    """Native ByteLevel decode (concat + cleanup + ws join) vs the Python
    path across options, invalid-UTF-8 rows, unknown ids, specials."""
    tok = trained_tokenizer()
    if tok._get_native_decoder() is None:
        pytest.skip("native decoder unavailable")
    texts = conformance_corpus()
    rows = tok.encode_batch(texts, backend="host")
    # weird rows: empty, unknown ids, special ids, id order reversed
    specials = sorted(tok.special_tokens.values())
    rows += [[], [999999, 5, -3], specials, list(reversed(rows[0]))]
    # invalid-UTF-8 row (a lone continuation-byte token): must flag and
    # take the exact lossy host path
    from complexity_tokenizer_tpu.utils.bytelevel import unicode_to_bytes

    u2b = unicode_to_bytes()
    for t, tid in tok.vocab._token_to_id.items():
        if len(t) == 1 and t in u2b and 0x80 <= u2b[t] < 0xC0:
            rows.append([tid, tid, tid])
            rows.append(rows[0] + [tid])
            break
    for skip in (False, True):
        for cleanup in (False, True):
            exp = [tok._decode_impl(r, skip, cleanup) for r in rows]
            got = tok.decode_batch_with_options(rows, skip, cleanup)
            assert got == exp, (skip, cleanup)
    # ragged mirror
    import numpy as np

    offs = np.zeros(len(rows) + 1, np.int64)
    np.cumsum([len(r) for r in rows], out=offs[1:])
    flat = np.fromiter((i for r in rows for i in r), np.int32, count=int(offs[-1]))
    exp = [tok._decode_impl(r, False, True) for r in rows]
    assert tok.decode_batch_ragged(flat, offs) == exp


def test_native_decoder_cleanup_table_fuzz():
    """Cleanup replace table + whitespace collapse must byte-match the
    Python implementation on adversarial punctuation/space patterns."""
    tok = trained_tokenizer()
    if tok._get_native_decoder() is None:
        pytest.skip("native decoder unavailable")
    rng = np.random.RandomState(5)
    pieces = [" .", " ,", '" ', ' "', "' ", " '", "( ", " )", "[ ", " ]",
              " - ", " -", "- ", "  ", "a", "b ", " c", "\t", "\n", "é", "日",
              ".", '"', "'", " ",
              # ws-join gating edges: unicode whitespace, leading/trailing
              # runs, cascaded quote patterns (" ' " hits both "' " and " '")
              "\u00a0", "\u3000", " ' ", "   x", "y   "]
    for _ in range(200):
        text = "".join(pieces[rng.randint(len(pieces))] for _ in range(rng.randint(1, 15)))
        ids = tok._encode_host(text)
        exp = tok._decode_impl(ids, False, True)
        got = tok.decode_batch([ids] * 9)  # batch >= 8 triggers fast path
        assert got == [exp] * 9, repr(text)


def test_set_decoder_invalidates_native_decoder():
    """set_decoder/set_post_processor must drop the cached native decoder
    (regression: a stale ByteLevel NativeDecoder survived set_decoder)."""
    tok = trained_tokenizer()
    if tok._get_native_decoder() is None:
        pytest.skip("native decoder unavailable")
    ids = tok.encode_batch(["hello world"] * 9, backend="host")
    tok.decode_batch(ids)  # builds + caches the native decoder
    tok.set_decoder(None)
    exp = [tok._decode_impl(r, False, True) for r in ids]
    assert tok.decode_batch(ids) == exp


def test_concurrent_encode_and_cache_insert_threads():
    """Serving pattern: several Python threads batch-encoding while device
    fills land (cache_insert rehashing the shared caches).  Every result
    must stay exact — the native work_mu serializes cache access."""
    import threading

    from helpers import conformance_corpus, trained_tokenizer

    tok = trained_tokenizer()
    ne = tok._get_native_encoder()
    if ne is None:
        pytest.skip("native runtime unavailable")
    texts = conformance_corpus() * 4
    normalized = [tok.normalizer.normalize(t) for t in texts]
    data = tok._prepare_bytes(normalized)
    host = [tok._encode_host(t, already_normalized=True) for t in normalized]
    # novel word stream to keep cache_insert rehashing mid-run
    rng = np.random.RandomState(5)
    errors: list = []

    def encoder():
        try:
            for _ in range(30):
                assert ne.encode_batch(data) == host
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def inserter():
        try:
            for k in range(60):
                n = 64
                lens = rng.randint(1, 17, size=n).astype(np.int32)
                buf = (rng.randint(0, 26, size=int(lens.sum())) + 97).astype(
                    np.uint8
                )
                rows = []
                off = 0
                for ln in lens:
                    w = buf[off : off + ln].tobytes()
                    rows.append(ne.encode(w))
                    off += ln
                ne.cache_insert(buf, lens, rows)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=encoder) for _ in range(2)] + [
        threading.Thread(target=inserter)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert ne.encode_batch(data) == host


def test_trailing_empty_rows_in_batch():
    """Zero-length texts at the very end of a batch sit at byte offset ==
    total and must still be assigned to a partition shard (they were once
    skipped, reading stale arena memory as their ids)."""
    from helpers import conformance_corpus, trained_tokenizer

    tok = trained_tokenizer()
    if tok._get_native_encoder() is None:
        pytest.skip("native runtime unavailable")
    base = conformance_corpus()
    for tail in (1, 2, 5):
        texts = base + [""] * tail
        host = [tok._encode_host(t) for t in texts]
        # repeat: the arena must hold stale counts from the prior call
        for _ in range(3):
            assert tok.encode_batch(texts) == host
            flat, offs = tok.encode_batch_ragged(texts)
            got = [
                flat[offs[i] : offs[i + 1]].tolist()
                for i in range(len(texts))
            ]
            assert got == host
    # empties interleaved and at the head too
    texts = [""] + base[:3] + ["", ""] + base[3:6] + [""]
    host = [tok._encode_host(t) for t in texts]
    assert tok.encode_batch(texts) == host


def test_pre_tokenize_fast_matches_oracle():
    """Native split_words + latin-1 translate must reproduce the Python
    ByteLevel.pre_tokenize output exactly, across unicode/fuzz inputs."""
    from helpers import conformance_corpus, trained_tokenizer

    tok = trained_tokenizer()
    if tok._pre_tokenize_fast("probe") is None:
        pytest.skip("extension surface unavailable")
    rng = np.random.RandomState(13)
    alphabet = list("abc ABZ '!.12\t\n") + ["é", "中", "日", "́", "\U0001f600"]
    cases = conformance_corpus() + [
        "", " ", "  x", "héllo wörld", "a" * 300,
    ] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ]
    for t in cases:
        normalized = tok.normalizer.normalize(t)
        exp = tok.pre_tokenizer.pre_tokenize(normalized)
        got = tok._pre_tokenize_fast(normalized)
        assert got == exp, repr(t)


def test_warm_start_parity_and_cache_hits(monkeypatch):
    """Vocabulary warm-start (round 4): pre-merged cache entries equal
    the host oracle encode, and warm-started words stop registering as
    misses (ctok_warm_start / Tokenizer._warm_start_native)."""
    from helpers import trained_tokenizer

    tok = trained_tokenizer()
    native = tok._get_native_encoder()
    if native is None:
        pytest.skip("native runtime unavailable")
    n = tok.warm_start()  # forced (small test vocab)
    assert n > 0
    # warm-started words stop registering as misses: any word still in
    # the miss scan must be a MULTI-token word (warm_start covers every
    # single-token vocab word; multi-token corpus words are the warm-
    # cache ARTIFACT's job, tested below)
    texts = ["hello world the fox and dog", "The thing that is more"]
    data = tok._prepare_bytes([tok.normalizer.normalize(t) for t in texts])
    bufs, lens = native.collect_miss_words(data, 128)
    import numpy as np

    from complexity_tokenizer_tpu.utils.bytelevel import bytes_to_unicode

    b2u = bytes_to_unicode()
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    raw = np.asarray(bufs, np.uint8).tobytes()
    for i in range(len(lens)):
        w = "".join(b2u[c] for c in raw[offs[i] : offs[i + 1]])
        assert w not in tok.bpe.vocab, f"vocab word {w!r} still misses"
    # parity through the production path (front cache + shared caches)
    got = tok.encode_batch(texts)
    want = [tok._encode_host(t) for t in texts]
    assert got == want


def test_warm_cache_artifact_roundtrip(tmp_path, monkeypatch):
    """Trainer-style warm-cache artifact: export -> fresh from_file
    bulk-load -> identical results; a stale blob (file edited) is
    rejected by the digest and silently recomputed."""
    import json as _json

    from helpers import trained_tokenizer_json

    from complexity_tokenizer_tpu.tokenizer import Tokenizer

    js = trained_tokenizer_json()
    p = tmp_path / "tok.json"
    p.write_text(js, encoding="utf-8")
    monkeypatch.setenv("CTOK_WARM_START", "1")  # force despite small vocab

    tok = Tokenizer.from_file(p)
    if tok._get_native_encoder() is None:
        pytest.skip("native runtime unavailable")
    n = tok.export_warm_cache([b" extraword", b" tail"])
    assert n > 0
    blob = tmp_path / "tok.warmcache.npz"
    assert blob.exists()

    tok2 = Tokenizer.from_file(p)
    native2 = tok2._get_native_encoder()
    assert tok2._warm_started
    # the exported extra word must be cached (no miss)
    _, lens = native2.collect_miss_words([b" extraword tail"], 128)
    assert len(lens) == 0
    texts = ["hello world", "the quick brown fox", "extraword tail"]
    assert tok2.encode_batch(texts) == [tok2._encode_host(t) for t in texts]

    # stale blob: edit the json (digest changes) -> blob ignored, results
    # still exact, and the recompute overwrites the blob with a new key
    p.write_text(js + "\n", encoding="utf-8")
    tok3 = Tokenizer.from_file(p)
    assert tok3._get_native_encoder() is not None
    assert tok3.encode_batch(texts) == [tok3._encode_host(t) for t in texts]


def test_warm_start_with_added_tokens_parity(monkeypatch):
    """Warm-started caches must not break added-token routing: a cache
    entry exists for the special token's BYTE form (it is the merge of
    those bytes, unused by the added-token path), while texts containing
    the token still route through the host matcher."""
    import json as _json

    from helpers import trained_tokenizer_json

    from complexity_tokenizer_tpu.tokenizer import Tokenizer

    monkeypatch.setenv("CTOK_WARM_START", "1")
    j = _json.loads(trained_tokenizer_json())
    j["added_tokens"] = [
        {
            "id": len(j["model"]["vocab"]),
            "content": "<|end|>",
            "special": True,
            "single_word": False,
            "lstrip": False,
            "rstrip": False,
            "normalized": False,
        }
    ]
    tok = Tokenizer.from_str(_json.dumps(j))
    if tok._get_native_encoder() is None:
        pytest.skip("native runtime unavailable")
    tok.warm_start()
    texts = [
        "hello world <|end|>",
        "<|end|> the fox",
        "no special here",
        "that's<|end|>tight",
    ]
    got = tok.encode_batch(texts)
    want = [tok._encode_host(t) for t in texts]
    assert got == want
