"""Tokenizer orchestrator tests: load, encode/decode round-trips,
__call__ semantics, added tokens, save/load stability."""

import json

import pytest

from complexity_tokenizer_tpu.tokenizer import Tokenizer

from helpers import conformance_corpus, trained_tokenizer, trained_tokenizer_json


MINIMAL_JSON = json.dumps(
    {
        "version": "1.0",
        "model": {
            "type": "BPE",
            "vocab": {"h": 0, "e": 1, "l": 2, "o": 3, " ": 4, "w": 5, "r": 6, "d": 7},
            "merges": [],
        },
        "added_tokens": [],
    }
)


def test_load_minimal():
    tok = Tokenizer.from_str(MINIMAL_JSON)
    assert tok.vocab_size == 8


def test_load_from_file(tmp_path):
    p = tmp_path / "tokenizer.json"
    p.write_text(MINIMAL_JSON)
    tok = Tokenizer.from_file(p)
    assert tok.vocab_size == 8


def test_merges_array_format():
    j = json.loads(MINIMAL_JSON)
    j["model"]["vocab"].update({"he": 8})
    j["model"]["merges"] = [["h", "e"]]
    tok = Tokenizer.from_str(json.dumps(j))
    assert tok.bpe.merge_ranks == {(0, 1): 0}


def test_roundtrip_encode_decode():
    tok = trained_tokenizer()
    tok.use_device = False
    for text in conformance_corpus():
        ids = tok.encode(text)
        decoded = tok.decode_with_options(
            ids, skip_special_tokens=False, clean_up_tokenization_spaces=False
        )
        # ByteLevel pipeline is lossless up to normalization: decode
        # returns the NFC form the normalizer produced before encoding
        expected = tok.normalizer.normalize(text) if tok.normalizer else text
        assert decoded == expected, (text, ids, decoded)


def test_special_token_inference():
    tok = trained_tokenizer()
    assert tok.bos_token == "<s>"
    assert tok.eos_token == "</s>"
    assert tok.pad_token == "<pad>"
    assert tok.unk_token == "<unk>"
    assert tok.bos_token_id == tok.token_to_id("<s>")
    assert set(tok.all_special_tokens) >= {"<s>", "</s>", "<pad>", "<unk>"}


def test_added_token_not_matched_through_bytelevel_split():
    # Parity quirk: ByteLevel pre-tokenization splits "</s>" into multiple
    # words ("</", "s", ">") BEFORE added-token matching, so multi-char
    # specials never match in raw text — exactly like the reference
    # (mod.rs:551-609 runs added-token matching per pre-tokenized word).
    tok = trained_tokenizer()
    tok.use_device = False
    eos = tok.token_to_id("</s>")
    ids = tok.encode("hello</s>world")
    assert eos not in ids


def test_added_token_matching_whitespace_pretok():
    # With a Whitespace pre-tokenizer the added token survives as a word
    # substring and is matched (longest-first, split-around semantics).
    from complexity_tokenizer_tpu.core.pretokenizers import Whitespace

    tok = trained_tokenizer()
    tok.use_device = False
    tok.pre_tokenizer = Whitespace()
    eos = tok.token_to_id("</s>")
    ids = tok.encode("abc</s>def")
    assert eos in ids
    # chunks around the token are BPE'd separately
    left = ids[: ids.index(eos)]
    right = ids[ids.index(eos) + 1 :]
    assert left and right


def test_added_token_single_word():
    tok = trained_tokenizer()
    tok.use_device = False
    tok.add_token_with_config("cafe", 9999, special=False, single_word=True)
    # inside an alphanumeric word: first occurrence fails single_word check
    ids_embedded = tok.encode("xcafex")
    assert 9999 not in ids_embedded
    ids_alone = tok.encode("cafe")
    assert 9999 in ids_alone


def test_call_single_and_batch():
    tok = trained_tokenizer()
    tok.use_device = False
    be = tok("Hello, world!")
    assert len(be) == 1
    assert be.input_ids[0]
    assert be.attention_mask[0] == [1] * len(be.input_ids[0])

    be2 = tok(["Hello", "a longer text right here"], padding="longest")
    lens = [len(x) for x in be2.input_ids]
    assert lens[0] == lens[1]
    am = be2.attention_mask
    assert am[0].count(1) < lens[0]


def test_call_truncation_stride():
    tok = trained_tokenizer()
    tok.use_device = False
    text = "word " * 50
    be = tok(text, truncation=True, max_length=10, stride=2)
    enc = be[0]
    assert len(enc) == 10
    assert enc.n_overflowing() > 0


def test_call_max_length_padding():
    tok = trained_tokenizer()
    tok.use_device = False
    be = tok("hi", padding="max_length", max_length=16)
    assert len(be.input_ids[0]) == 16


def test_tokenize_and_convert():
    tok = trained_tokenizer()
    tok.use_device = False
    tokens = tok.tokenize("hello world")
    assert tokens
    ids = tok.convert_tokens_to_ids(tokens)
    assert all(i is not None for i in ids)
    back = tok.convert_ids_to_tokens(ids)
    assert back == tokens
    assert tok.convert_tokens_to_string(tokens) == "hello world"


def test_save_load_stability(tmp_path):
    tok = trained_tokenizer()
    tok.use_device = False
    p = tmp_path / "tokenizer.json"
    tok.save(p)
    tok2 = Tokenizer.from_file(p)
    tok2.use_device = False
    for text in conformance_corpus()[:10]:
        assert tok.encode(text) == tok2.encode(text)


def test_save_pretrained(tmp_path):
    tok = trained_tokenizer()
    tok.save_pretrained(tmp_path)
    assert (tmp_path / "tokenizer.json").exists()
    assert (tmp_path / "tokenizer_config.json").exists()
    assert (tmp_path / "special_tokens_map.json").exists()
    cfg = json.loads((tmp_path / "tokenizer_config.json").read_text())
    assert cfg["bos_token"] == "<s>"


def test_decode_skip_special():
    tok = trained_tokenizer()
    tok.use_device = False
    ids = [tok.bos_token_id] + tok.encode("hello") + [tok.eos_token_id]
    full = tok.decode_with_options(ids, False, False)
    assert "<s>" in full
    stripped = tok.decode_with_options(ids, True, False)
    assert "<s>" not in stripped and "hello" in stripped


def test_clean_up_tokenization_spaces():
    tok = trained_tokenizer()
    assert tok.clean_up_tokenization_spaces("hello , world !") == "hello, world!"


def test_prepare_for_model():
    tok = trained_tokenizer()
    tok.use_device = False
    ids = tok.encode("hello")
    enc = tok.prepare_for_model(ids, padding="max_length", max_length=12)
    assert len(enc) == 12


def test_num_special_tokens_to_add():
    tok = trained_tokenizer()
    from complexity_tokenizer_tpu.core.postprocessors import TemplateProcessing

    tok.post_processor = TemplateProcessing(
        single="<s> $A </s>",
        pair="<s> $A </s> $B </s>",
        special_tokens=[("<s>", 2), ("</s>", 0)],
    )
    assert tok.num_special_tokens_to_add(False) == 2
    assert tok.num_special_tokens_to_add(True) == 3


def test_post_processor_applied_in_call():
    tok = trained_tokenizer()
    tok.use_device = False
    from complexity_tokenizer_tpu.core.postprocessors import TemplateProcessing

    bos = tok.bos_token_id
    eos = tok.eos_token_id
    tok.post_processor = TemplateProcessing(
        single="<s> $A </s>", special_tokens=[("<s>", bos), ("</s>", eos)]
    )
    be = tok("hello")
    ids = be.input_ids[0]
    assert ids[0] == bos and ids[-1] == eos
    enc = be[0]
    assert enc.special_tokens_mask[0] == 1 and enc.special_tokens_mask[-1] == 1


def test_chat_template():
    tok = trained_tokenizer()
    tok.use_device = False
    tok.chat_template = "{% some template with <|im_start|> %}"
    msgs = [
        {"role": "system", "content": "be helpful"},
        {"role": "user", "content": "hi"},
    ]
    text = tok.apply_chat_template(msgs, add_generation_prompt=True, tokenize=False)
    assert "<|im_start|>system" in text
    assert text.endswith("<|im_start|>assistant\n")
    ids = tok.apply_chat_template(msgs, tokenize=True)
    assert isinstance(ids, list) and ids


def test_add_special_tokens_dict():
    tok = trained_tokenizer()
    n = tok.add_special_tokens({"additional": "<NEW>"})
    assert n == 1
    assert "<NEW>" in tok.special_tokens


def test_enable_padding_truncation_config():
    tok = trained_tokenizer()
    tok.enable_padding(direction="left", length=64)
    assert tok.padding().strategy == "max_length"
    assert tok.padding_side == "left"
    tok.no_padding()
    assert tok.padding() is None
    tok.enable_truncation(128, stride=16, strategy="only_first", direction="left")
    t = tok.truncation()
    assert t.max_length == 128 and t.stride == 16
    tok.no_truncation()
    assert tok.truncation() is None


def test_train_new_from_iterator():
    tok = trained_tokenizer()
    new = tok.train_new_from_iterator(
        ["aaa bbb aaa", "bbb aaa bbb", "ab ab ab"], vocab_size=300
    )
    assert new.vocab_size > 4
    assert new.pre_tokenizer == tok.pre_tokenizer
    ids = new.encode("aaa")
    assert ids


def test_encoding_offsets_path():
    tok = trained_tokenizer()
    tok.use_device = False
    enc = tok.encode_to_encoding("hello world")
    assert len(enc.offsets) == len(enc.ids)
    assert enc.word_ids[0] == 0


def test_explicit_setters_and_callable_special_tokens():
    """Reference exposes set_* methods (bindings/tokenizer.rs:409-441) and a
    special_tokens() method returning a dict (bindings/tokenizer.rs:285-289)."""
    tok = trained_tokenizer()
    tok.set_model_max_length(1024)
    assert tok.model_max_length == 1024
    tok.set_padding_side("left")
    assert tok.padding_side == "left"
    tok.set_truncation_side("left")
    assert tok.truncation_side == "left"
    tok.set_chat_template("{{messages}}")
    assert tok.chat_template == "{{messages}}"
    tok.set_chat_template(None)
    assert tok.chat_template is None
    # both attribute-style (mapping) and reference call-style access work
    assert isinstance(tok.special_tokens, dict)
    assert tok.special_tokens() == dict(tok.special_tokens)


def test_call_fast_path_full_field_parity():
    """__call__'s native fast path (lazy offsets) must match the eager
    offset-tracking path on every Encoding field, including stride-overflow
    windows and offsets materialized after truncation."""
    tok = trained_tokenizer()
    texts = [
        "hello world, it's fine",
        "the quick brown fox jumps over the lazy dog again and again",
        "short",
        "numbers 123 456 and punct !?",
    ] * 3
    fast = tok(texts, truncation=True, max_length=8, stride=3,
               return_offsets_mapping=True)
    slow = [tok._call_one(t, None, True) for t in texts]
    for e in slow:
        if len(e) > 8:
            e.truncate_with_stride(8, 3)
    for fe, se in zip(fast.encodings(), slow):
        assert fe.ids == se.ids
        assert fe.tokens == se.tokens
        assert fe.offsets == se.offsets
        assert fe.word_ids == se.word_ids
        assert fe.attention_mask == se.attention_mask
        assert fe.special_tokens_mask == se.special_tokens_mask
        assert fe.type_ids == se.type_ids
        assert fe.sequence_ids == se.sequence_ids
        assert len(fe.overflowing) == len(se.overflowing)
        for fo, so in zip(fe.overflowing, se.overflowing):
            assert (fo.ids, fo.offsets, fo.word_ids) == (so.ids, so.offsets, so.word_ids)


def test_call_no_special_tokens_branch_parity():
    """add_special_tokens=False takes the full-encode branch (added tokens
    honored, NO offsets) exactly like bindings/tokenizer.rs:70-97."""
    tok = trained_tokenizer()
    texts = ["hello world", "it's a <s> test"]
    be = tok(texts, add_special_tokens=False)
    for enc, t in zip(be.encodings(), texts):
        assert enc.ids == tok.encode(t)
        assert enc.offsets == []


def test_encode_batch_to_encoding_matches_single():
    """The batch Encoding path (native fast construction, deferred aux)
    must be field-identical to per-text encode_to_encoding."""
    from helpers import conformance_corpus, trained_tokenizer

    tok = trained_tokenizer()
    texts = conformance_corpus()
    batch = tok.encode_batch_to_encoding(texts)
    for t, b in zip(texts, batch):
        a = tok.encode_to_encoding(t)
        assert a.ids == b.ids, repr(t)
        assert a.tokens == b.tokens, repr(t)
        assert a.attention_mask == b.attention_mask
        assert a.type_ids == b.type_ids
        assert a.special_tokens_mask == b.special_tokens_mask
        assert a.offsets == b.offsets, repr(t)
        assert a.word_ids == b.word_ids, repr(t)
