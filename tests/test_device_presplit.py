"""Device pre-split kernel vs the host GPT-2 scanner — byte-for-byte."""

import numpy as np
import pytest

from helpers import conformance_corpus, SAMPLE_TEXT

jax = pytest.importorskip("jax")


def _run_device(texts):
    import jax.numpy as jnp

    from complexity_tokenizer_tpu.ops.presplit import class_table_jnp, presplit

    data = [t.encode("utf-8") for t in texts]
    L = max((len(d) for d in data), default=1) or 1
    B = len(texts)
    arr = np.zeros((B, L), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, d in enumerate(data):
        arr[i, : len(d)] = np.frombuffer(d, dtype=np.uint8)
        lens[i] = len(d)
    start, word_id, valid = jax.jit(presplit)(
        jnp.asarray(arr), jnp.asarray(lens), class_table_jnp()
    )
    return np.asarray(start), np.asarray(word_id), np.asarray(valid), lens


def test_presplit_matches_oracle():
    from complexity_tokenizer_tpu.ops.presplit import presplit_reference_np

    texts = conformance_corpus() + [SAMPLE_TEXT]
    start, word_id, valid, lens = _run_device(texts)
    for i, text in enumerate(texts):
        ref_start, ref_wid = presplit_reference_np(text)
        n = lens[i]
        assert n == len(ref_start)
        np.testing.assert_array_equal(start[i, :n], ref_start, err_msg=repr(text))
        np.testing.assert_array_equal(word_id[i, :n], ref_wid, err_msg=repr(text))
        assert not valid[i, n:].any()


def test_presplit_exhaustive_ascii_pairs():
    # all printable-ASCII 3-grams around contraction chars: dense local-rule
    # coverage where the scanner's tricky cases live
    import itertools

    chars = [" ", "'", "s", "l", "r", "e", "a", "1", ".", "\n", "\t", '"']
    texts = ["".join(p) for p in itertools.product(chars, repeat=3)]
    from complexity_tokenizer_tpu.ops.presplit import presplit_reference_np

    start, word_id, valid, lens = _run_device(texts)
    for i, text in enumerate(texts):
        ref_start, ref_wid = presplit_reference_np(text)
        n = lens[i]
        np.testing.assert_array_equal(start[i, :n], ref_start, err_msg=repr(text))
        np.testing.assert_array_equal(word_id[i, :n], ref_wid, err_msg=repr(text))


def test_presplit_multibyte():
    texts = [
        "héllo wörld",
        "日本語 text",
        "🎉🚀 emoji",
        "é's contraction",
        "Ελληνικά'll test",
        "a b",  # nbsp is WS class
        " line sep ",
    ]
    from complexity_tokenizer_tpu.ops.presplit import presplit_reference_np

    start, word_id, valid, lens = _run_device(texts)
    for i, text in enumerate(texts):
        ref_start, ref_wid = presplit_reference_np(text)
        n = lens[i]
        np.testing.assert_array_equal(start[i, :n], ref_start, err_msg=repr(text))
        np.testing.assert_array_equal(word_id[i, :n], ref_wid, err_msg=repr(text))
