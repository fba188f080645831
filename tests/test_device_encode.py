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
