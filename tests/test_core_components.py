"""Ports of the reference's inline unit tests for L0-L2 components.

Every expectation below is lifted verbatim from the reference's
``#[cfg(test)]`` modules so the host tier is pinned to identical behavior:
normalizers.rs:223-283, pretokenizers.rs:605-718, postprocessors.rs:298-355,
decoders.rs:253-314, encoding.rs:465-576, bpe.rs:219-250, vocab.rs:156-172.
"""

import pytest

from complexity_tokenizer_tpu.core import (
    bpe,
    decoders,
    encoding,
    normalizers,
    postprocessors,
    pretokenizers,
)
from complexity_tokenizer_tpu.core.vocab import SpecialTokens, Vocab
from complexity_tokenizer_tpu.utils.bytelevel import bytes_to_unicode, unicode_to_bytes


# ---------------------------------------------------------------------------
# normalizers.rs tests
# ---------------------------------------------------------------------------


def test_nfc():
    assert normalizers.NFC().normalize("é") == "é"


def test_lowercase():
    assert normalizers.Lowercase().normalize("HELLO World") == "hello world"


def test_strip_accents():
    n = normalizers.StripAccents()
    assert n.normalize("café") == "cafe"
    assert n.normalize("naïve") == "naive"


def test_sequence_bert_style():
    assert normalizers.bert_normalizer().normalize("  CAFÉ  ") == "cafe"


def test_bert_normalizer():
    n = normalizers.BertNormalizer(
        clean_text=True, handle_chinese_chars=True, strip_accents=True, lowercase=True
    )
    assert n.normalize("HELLO") == "hello"
    assert n.normalize("Café") == "cafe"


def test_bert_normalizer_chinese():
    n = normalizers.BertNormalizer(
        clean_text=True, handle_chinese_chars=True, strip_accents=None, lowercase=True
    )
    assert " 世 " in n.normalize("Hello世界")


def test_precompiled():
    n = normalizers.Precompiled(charsmap=[("ﬁ", "fi"), ("ﬂ", "fl")])
    assert n.normalize("ﬁle") == "file"


# ---------------------------------------------------------------------------
# pretokenizers.rs tests
# ---------------------------------------------------------------------------


def test_whitespace():
    assert pretokenizers.Whitespace().pre_tokenize("hello world") == ["hello", "world"]


def test_punctuation():
    assert pretokenizers.Punctuation().pre_tokenize("hello, world!") == [
        "hello",
        ",",
        " world",
        "!",
    ]


def test_digits():
    pt = pretokenizers.Digits(individual_digits=True)
    assert pt.pre_tokenize("hello123world") == ["hello", "1", "2", "3", "world"]


def test_gpt2():
    assert len(pretokenizers.GPT2().pre_tokenize("Hello, world!")) > 1


def test_metaspace():
    pt = pretokenizers.Metaspace(replacement="▁", add_prefix_space=True)
    assert pt.pre_tokenize("hello world")[0].startswith("▁")


def test_bert_pretokenizer():
    pt = pretokenizers.BertPreTokenizer()
    assert pt.pre_tokenize("Hello, world!") == ["Hello", ",", "world", "!"]


def test_bert_pretokenizer_chinese():
    assert pretokenizers.BertPreTokenizer().pre_tokenize("Hello世界") == [
        "Hello",
        "世",
        "界",
    ]


def test_char_delimiter_split():
    pt = pretokenizers.CharDelimiterSplit(delimiter="_")
    assert pt.pre_tokenize("hello_world_test") == ["hello", "world", "test"]


def test_unicode_scripts():
    result = pretokenizers.UnicodeScripts().pre_tokenize("Helloこんにちは")
    assert result == ["Hello", "こんにちは"]


def test_split_isolated():
    pt = pretokenizers.Split(
        pattern=r"\s", behavior=pretokenizers.SplitBehavior.ISOLATED
    )
    assert pt.pre_tokenize("hello world test") == ["hello", " ", "world", " ", "test"]


def test_split_merged_with_previous():
    pt = pretokenizers.Split(
        pattern=r"!", behavior=pretokenizers.SplitBehavior.MERGED_WITH_PREVIOUS
    )
    assert pt.pre_tokenize("hello! world!") == ["hello!", " world!"]


def test_split_merged_with_next():
    pt = pretokenizers.Split(
        pattern=r"\$", behavior=pretokenizers.SplitBehavior.MERGED_WITH_NEXT
    )
    assert pt.pre_tokenize("price $100 and $50") == ["price ", "$100 and ", "$50"]


def test_split_contiguous():
    pt = pretokenizers.Split(
        pattern=r"\d", behavior=pretokenizers.SplitBehavior.CONTIGUOUS
    )
    assert pt.pre_tokenize("abc123def456") == ["abc", "123", "def", "456"]


# GPT-2 scanner: simplified-pattern semantics pinned explicitly (these match
# the rust regex's leftmost-first behavior for the no-lookahead pattern).


def test_gpt2_scanner_contractions():
    assert pretokenizers.gpt2_split("that's it") == ["that", "'s", " it"]
    assert pretokenizers.gpt2_split("I'll you've we're he'd I'm isn't") == [
        "I",
        "'ll",
        " you",
        "'ve",
        " we",
        "'re",
        " he",
        "'d",
        " I",
        "'m",
        " isn",
        "'t",
    ]


def test_gpt2_scanner_whitespace_runs():
    # two spaces: \s+ wins over space-prefixed letter run (no lookahead)
    assert pretokenizers.gpt2_split("a  b") == ["a", "  ", "b"]
    assert pretokenizers.gpt2_split("a b") == ["a", " b"]
    assert pretokenizers.gpt2_split(" a") == [" a"]
    assert pretokenizers.gpt2_split("a ") == ["a", " "]


def test_gpt2_scanner_punct():
    assert pretokenizers.gpt2_split("a!'s") == ["a", "!'", "s"]
    assert pretokenizers.gpt2_split("x'ref") == ["x", "'re", "f"]
    assert pretokenizers.gpt2_split("1'2") == ["1", "'", "2"]
    assert pretokenizers.gpt2_split("a 's") == ["a", " '", "s"]
    assert pretokenizers.gpt2_split("a\n's") == ["a", "\n", "'s"]


def test_gpt2_scanner_matches_regex_module():
    regex = pytest.importorskip("regex")
    pat = regex.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
    )
    cases = [
        "Hello, world! that's   it.",
        "I'll say  you've 42 cats... 'tis",
        "héllo wörld ÀÉ 日本語 123abc!!!'s",
        "  leading and trailing  ",
        "tabs\tand\nnewlines\r\nmixed  nbsp",
        "price $100 & $50's'",
        "",
        "'",
        "'s",
        "''",
        "don'ts x'll'd",
    ]
    for text in cases:
        expected = pat.findall(text)
        assert pretokenizers.gpt2_split(text) == expected, text


def test_byte_level_pretokenize():
    pt = pretokenizers.ByteLevel(add_prefix_space=False)
    words = pt.pre_tokenize("Hello world")
    assert words[0] == "Hello"
    assert words[1] == "Ġworld"


# ---------------------------------------------------------------------------
# postprocessors.rs tests
# ---------------------------------------------------------------------------


def test_bert_processing():
    p = postprocessors.BertProcessing(cls=("[CLS]", 101), sep=("[SEP]", 102))
    assert p.process([1, 2, 3]) == [101, 1, 2, 3, 102]


def test_roberta_processing():
    p = postprocessors.RobertaProcessing(bos=("<s>", 0), eos=("</s>", 2))
    assert p.process([1, 2, 3]) == [0, 1, 2, 3, 2]


def test_template_processing():
    p = postprocessors.TemplateProcessing(
        single="<s> $A </s>",
        pair="<s> $A </s> $B </s>",
        special_tokens=[("<s>", 0), ("</s>", 2)],
    )
    assert p.process([5, 6]) == [0, 5, 6, 2]
    assert p.process([5, 6], [7]) == [0, 5, 6, 2, 7, 2]
    assert p.compile_single() == ([0], [2])


def test_truncation_strategies():
    ids, pair = postprocessors.truncate_ids(
        [1, 2, 3, 4, 5], None, 3, postprocessors.TruncationStrategy.ONLY_FIRST
    )
    assert ids == [1, 2, 3]
    ids, pair = postprocessors.truncate_ids(
        [1, 2, 3], [4, 5, 6, 7, 8], 5, postprocessors.TruncationStrategy.ONLY_SECOND
    )
    assert ids == [1, 2, 3] and pair == [4, 5]
    ids, pair = postprocessors.truncate_ids(
        [1, 2, 3], [4, 5, 6, 7, 8], 5, postprocessors.TruncationStrategy.LONGEST_FIRST
    )
    assert len(ids) + len(pair) == 5


def test_pad_ids():
    assert postprocessors.pad_ids([1, 2, 3], 5, 0) == [1, 2, 3, 0, 0]
    assert postprocessors.pad_ids([1, 2, 3], 5, 0, pad_left=True) == [0, 0, 1, 2, 3]


# ---------------------------------------------------------------------------
# decoders.rs tests
# ---------------------------------------------------------------------------


def test_metaspace_decode():
    d = decoders.Metaspace(replacement="▁", add_prefix_space=True)
    assert d.decode(["▁Hello", "▁world"]) == "Hello world"


def test_wordpiece_decode():
    d = decoders.WordPiece(prefix="##", cleanup=True)
    assert d.decode(["Hello", "##world"]) == "Helloworld"


def test_byte_level_decode():
    assert "Hello" in decoders.ByteLevel().decode(["ĠHello", "Ġworld"])


def test_ctc_decode():
    d = decoders.CTC(pad_token="<pad>", word_delimiter_token="|")
    tokens = ["H", "H", "E", "<pad>", "L", "L", "O", "|", "W"]
    assert d.decode(tokens) == "HELO W"


def test_fuse_decode():
    assert decoders.Fuse().decode(["Hello", " ", "World"]) == "Hello World"


def test_strip_decode():
    d = decoders.Strip(content="_", start=1, stop=1)
    assert d.decode(["_Hello_"]) == "Hello"


def test_bpe_suffix_decode():
    d = decoders.BPEDecoder(suffix="</w>")
    assert d.decode(["hi</w>", "there</w>"]) == "hi there"


# ---------------------------------------------------------------------------
# encoding.rs tests
# ---------------------------------------------------------------------------


def test_encoding_from_ids():
    enc = encoding.Encoding.from_ids([1, 2, 3], ["a", "b", "c"])
    assert len(enc) == 3
    assert enc.attention_mask == [1, 1, 1]
    assert enc.type_ids == [0, 0, 0]
    assert enc.sequence_ids == [0, 0, 0]


def test_encoding_padding():
    enc = encoding.Encoding.from_ids([1, 2], ["a", "b"])
    enc.pad(5, 0, "<pad>", False)
    assert len(enc) == 5
    assert enc.attention_mask == [1, 1, 0, 0, 0]
    assert enc.sequence_ids == [0, 0, None, None, None]


def test_encoding_truncation():
    enc = encoding.Encoding.from_ids([1, 2, 3, 4, 5], list("abcde"))
    enc.truncate(3)
    assert len(enc) == 3
    assert len(enc.overflowing) == 1
    assert len(enc.overflowing[0]) == 2


def test_truncate_with_stride():
    enc = encoding.Encoding.from_ids(list(range(10)), [str(i) for i in range(10)])
    enc.truncate_with_stride(4, 2)
    assert len(enc) == 4
    # windows: [2..6], [4..8], [6..10]
    assert [o.ids for o in enc.overflowing] == [[2, 3, 4, 5], [4, 5, 6, 7], [6, 7, 8, 9]]


def test_added_token():
    t = encoding.AddedToken.special_token("<eos>")
    t.lstrip = True
    assert t.special and t.lstrip and not t.normalized


def test_char_to_token():
    enc = encoding.Encoding.from_ids([1, 2, 3], ["hello", " ", "world"])
    enc.offsets = [(0, 5), (5, 6), (6, 11)]
    assert enc.char_to_token(0) == 0
    assert enc.char_to_token(4) == 0
    assert enc.char_to_token(5) == 1
    assert enc.char_to_token(6) == 2
    assert enc.char_to_token(11) is None


def test_token_to_chars():
    enc = encoding.Encoding.from_ids([1, 2], ["hello", "world"])
    enc.offsets = [(0, 5), (5, 10)]
    assert enc.token_to_chars(0) == (0, 5)
    assert enc.token_to_chars(1) == (5, 10)
    assert enc.token_to_chars(2) is None


def test_word_to_tokens():
    enc = encoding.Encoding.from_ids([1, 2, 3, 4], ["hel", "lo", "wor", "ld"])
    enc.word_ids = [0, 0, 1, 1]
    assert enc.word_to_tokens(0) == (0, 2)
    assert enc.word_to_tokens(1) == (2, 4)
    assert enc.word_to_tokens(2) is None


def test_word_to_chars():
    enc = encoding.Encoding.from_ids([1, 2, 3, 4], ["hel", "lo", "wor", "ld"])
    enc.word_ids = [0, 0, 1, 1]
    enc.offsets = [(0, 3), (3, 5), (6, 9), (9, 11)]
    assert enc.word_to_chars(0) == (0, 5)
    assert enc.word_to_chars(1) == (6, 11)


def test_n_words():
    enc = encoding.Encoding.from_ids([1, 2, 3, 4, 5], list("abcde"))
    enc.word_ids = [0, 0, 1, 2, 2]
    assert enc.n_words() == 3


# ---------------------------------------------------------------------------
# bpe.rs + vocab.rs tests
# ---------------------------------------------------------------------------


def test_basic_encode_decode():
    vocab = {
        "h": 0,
        "e": 1,
        "l": 2,
        "o": 3,
        "he": 4,
        "ll": 5,
        "hel": 6,
        "hell": 7,
        "hello": 8,
        "lo": 9,
        "llo": 10,
    }
    merges = [
        ("h", "e"),
        ("he", "l"),
        ("hel", "l"),
        ("hell", "o"),
        ("l", "l"),
        ("l", "o"),
        ("l", "lo"),
    ]
    tok = bpe.BpeTokenizer(vocab, merges)
    assert tok.encode("hello") == [8]
    assert tok.decode([8]) == "hello"


def test_bpe_oov_chars_dropped():
    tok = bpe.BpeTokenizer({"a": 0, "b": 1}, [])
    assert tok.encode("aXbY") == [0, 1]
    assert tok.encode("XY") == []


def test_vocab_special_tokens():
    token_to_id = {"<unk>": 0, "<s>": 1, "</s>": 2, "<pad>": 3, "hello": 4}
    vocab = Vocab(token_to_id, SpecialTokens())
    assert vocab.unk_id() == 0
    assert vocab.bos_id() == 1
    assert vocab.eos_id() == 2
    assert vocab.pad_id() == 3
    assert len(vocab) == 5


def test_merges_well_formed():
    vocab = {"a": 0, "b": 1, "ab": 2, "abb": 3}
    ranks, ops = bpe.build_merge_tables(vocab, [("a", "b"), ("ab", "b")])
    assert bpe.merges_well_formed(ranks, ops)
    # ill-formed: merge 0 uses product of merge 1
    vocab2 = {"a": 0, "b": 1, "ab": 2, "aba": 3}
    ranks2, ops2 = bpe.build_merge_tables(vocab2, [("ab", "a"), ("a", "b")])
    assert not bpe.merges_well_formed(ranks2, ops2)


def test_byte_level_alphabet_bijection():
    enc = bytes_to_unicode()
    dec = unicode_to_bytes()
    assert len(enc) == 256
    assert enc[ord("a")] == "a"
    assert enc[0x20] == "Ġ"
    for b in range(256):
        assert dec[enc[b]] == b
