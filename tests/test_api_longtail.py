"""Long-tail API surface: methods without dedicated coverage elsewhere
(get_special_tokens_mask, num_special_tokens_to_add, encode_with_truncation,
batch pairs, from_buffer, batch_encode_plus, BPE-dropout determinism).
Semantics pinned against the reference (file:line cites inline)."""

import pytest
from helpers import conformance_corpus, trained_tokenizer, trained_tokenizer_json

from complexity_tokenizer_tpu.core.postprocessors import (
    BertProcessing,
    RobertaProcessing,
    TemplateProcessing,
)
from complexity_tokenizer_tpu.tokenizer import Tokenizer


def test_get_special_tokens_mask():
    # mod.rs:899-913: with already_has_special_tokens, membership by token
    # string; unknown ids are 0; without the flag, all zeros
    tok = trained_tokenizer()
    spec = sorted(tok.special_tokens.values())
    ids = tok.encode("hello world") + spec + [999999]
    mask = tok.get_special_tokens_mask(ids, already_has_special_tokens=True)
    assert len(mask) == len(ids)
    assert mask[-1] == 0  # unknown id
    assert all(mask[len(ids) - 1 - len(spec) + i] == 1 for i in range(len(spec)))
    assert tok.get_special_tokens_mask(ids, already_has_special_tokens=False) == [
        0
    ] * len(ids)


def test_num_special_tokens_to_add():
    # mod.rs:915-932: Bert 2/3, Roberta 2/4, Template counts non-$ parts
    tok = trained_tokenizer()
    tok.set_post_processor(None)
    assert tok.num_special_tokens_to_add(False) == 0
    tok.set_post_processor(BertProcessing(cls=("[CLS]", 1), sep=("[SEP]", 2)))
    assert tok.num_special_tokens_to_add(False) == 2
    assert tok.num_special_tokens_to_add(True) == 3
    tok.set_post_processor(RobertaProcessing(bos=("<s>", 1), eos=("</s>", 2)))
    assert tok.num_special_tokens_to_add(False) == 2
    assert tok.num_special_tokens_to_add(True) == 4
    tok.set_post_processor(
        TemplateProcessing(
            single="<s> $A </s>",
            pair="<s> $A </s> $B </s>",
            special_tokens=[("<s>", 1), ("</s>", 2)],
        )
    )
    assert tok.num_special_tokens_to_add(False) == 2
    assert tok.num_special_tokens_to_add(True) == 3


def test_encode_with_truncation_and_stride():
    tok = trained_tokenizer()
    long_text = " ".join(conformance_corpus()[:6]) * 3
    full = tok.encode_to_encoding(long_text)
    enc = tok.encode_with_truncation(long_text, max_length=16)
    assert len(enc) == 16
    assert enc.ids == full.ids[:16]
    assert enc.n_overflowing() >= 1
    # stride windows overlap by `stride` (encoding.rs:175-223)
    enc_s = tok.encode_with_truncation(long_text, max_length=16, stride=4)
    assert len(enc_s) == 16
    w0 = enc_s.overflowing[0]
    assert w0.ids[:4] == enc_s.ids[-4:]
    # pair variant merges before truncation (mod.rs pair quirk)
    enc_p = tok.encode_with_truncation("hello world", "the fox", max_length=8)
    assert len(enc_p) <= 8


def test_encode_batch_pairs():
    tok = trained_tokenizer()
    pairs = [("hello world", "the fox"), ("a", "b"), ("", "x")]
    encs = tok.encode_batch_pairs_to_encoding(pairs)
    assert len(encs) == 3
    for (a, b), e in zip(pairs, encs):
        ref = tok.encode_pair_to_encoding(a, b)
        assert e.ids == ref.ids
        assert e.type_ids == ref.type_ids
    padded = tok.encode_batch_pairs_with_padding(pairs)
    target = max(len(e) for e in encs)
    assert all(len(e) == target for e in padded)
    padded16 = tok.encode_batch_pairs_with_padding(pairs, max_length=16)
    assert all(len(e) >= min(16, len(o)) for e, o in zip(padded16, encs))


def test_from_buffer_and_batch_encode_plus():
    js = trained_tokenizer_json()
    tok = Tokenizer.from_buffer(js.encode("utf-8"))
    texts = ["hello world", "the fox"]
    encs = tok.batch_encode_plus(texts)
    refs = [tok.encode_to_encoding(t) for t in texts]
    assert [e.ids for e in encs] == [r.ids for r in refs]
    one = tok.encode_plus(texts[0])
    assert one.ids == refs[0].ids


def test_bpe_dropout_deterministic_and_coarser():
    # bpe.rs:7-28: xorshift64 seeded 12345 — our host tier is deterministic
    # (the reference is thread-local, i.e. nondeterministic under rayon)
    tok = trained_tokenizer()
    bpe = tok.bpe
    text = "the quick brown fox jumps over the lazy dog"
    word = tok.core_pretokenize(text)[0] if hasattr(tok, "core_pretokenize") else None
    base = bpe.encode("hello")
    # the PRNG advances across calls (as the reference's thread-local RNG
    # does); determinism is at the call-sequence level: a fresh instance
    # replays the same sequence
    seq_a = [bpe.encode_with_dropout(w, 0.5) for w in ("hello", "world") * 3]
    bpe2 = trained_tokenizer().bpe
    seq_b = [bpe2.encode_with_dropout(w, 0.5) for w in ("hello", "world") * 3]
    assert seq_a == seq_b
    assert bpe.encode_with_dropout("hello", 0.0) == base
    # dropout=1.0 blocks every merge -> pure char seeds
    all_drop = bpe.encode_with_dropout("hello", 1.0)
    assert len(all_drop) >= len(base)


def test_call_pair_validation():
    tok = trained_tokenizer()
    with pytest.raises(ValueError):
        tok(["a", "b", "c"], text_pair=["x"])
    with pytest.raises(TypeError):
        tok(["a", "b"], text_pair="cd")


def test_backend_host_honored_everywhere():
    """backend='host' (CTOK_ENCODE_BACKEND=host) must force the oracle on
    encode() and encode_batch_ragged(), not just encode_batch()."""
    import numpy as np

    tok = trained_tokenizer()
    texts = ["hello world", "it's 42!"]
    expected = [tok._encode_host(t) for t in texts]
    tok.encode_backend = "host"
    try:
        assert tok.encode(texts[0]) == expected[0]
        flat, offs = tok.encode_batch_ragged(texts)
        got = [list(flat[offs[i] : offs[i + 1]]) for i in range(len(texts))]
        assert got == expected
    finally:
        tok.encode_backend = "auto"


def test_return_tensors_unpadded_error_message():
    tok = trained_tokenizer()
    with pytest.raises(ValueError, match="requires padding"):
        tok(["hi", "a much longer sentence"], return_tensors="np").input_ids


def test_getitem_unknown_key_raises():
    tok = trained_tokenizer()
    enc = tok(["hello world"])
    with pytest.raises(KeyError):
        enc["nonsense"]
    assert enc["input_ids"] == enc.input_ids
    assert enc["attention_mask"] == enc.attention_mask
