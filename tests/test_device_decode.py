"""Device decode pipeline vs host decode — exact string parity."""

import pytest

from helpers import conformance_corpus, trained_tokenizer

jax = pytest.importorskip("jax")


def test_device_decode_roundtrip():
    tok = trained_tokenizer()
    texts = [t for t in conformance_corpus() if t]
    id_batches = [tok._encode_host(t) for t in texts]
    host = [tok._decode_impl(ids, False, False) for ids in id_batches]
    pipeline = tok._get_decode_pipeline()
    assert pipeline is not None
    dev = pipeline.decode_batch(id_batches, skip_special=False)
    assert dev == host
    # and through the public API (>= 8 rows routes to device)
    assert tok.decode_batch_with_options(id_batches, False, False) == host


def test_device_decode_skip_special():
    tok = trained_tokenizer()
    bos, eos = tok.bos_token_id, tok.eos_token_id
    batch = [[bos] + tok._encode_host("hello world") + [eos]] * 8
    host = [tok._decode_impl(ids, True, False) for ids in batch]
    pipeline = tok._get_decode_pipeline()
    dev = pipeline.decode_batch(batch, skip_special=True)
    assert dev == host
    assert "<s>" not in dev[0]


def test_device_decode_empty_rows():
    tok = trained_tokenizer()
    pipeline = tok._get_decode_pipeline()
    assert pipeline.decode_batch([[], [], []]) == ["", "", ""]


def test_device_decode_invalid_ids():
    tok = trained_tokenizer()
    pipeline = tok._get_decode_pipeline()
    big = tok.vocab_size + 1000
    host = tok._decode_impl([big, *tok._encode_host("hi")], False, False)
    dev = pipeline.decode_batch([[big, *tok._encode_host("hi")]])[0]
    assert dev == host
