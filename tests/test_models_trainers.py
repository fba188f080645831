"""Ports of models.rs + trainer tests (models.rs:823-969, trainer.rs:658-706,
bpe_trainer.rs:474-524, trainers.rs:552-589)."""

from complexity_tokenizer_tpu.models import (
    ByteLevelBpeModel,
    CharBpeModel,
    UnigramModel,
    WordLevelModel,
    WordPieceModel,
)
from complexity_tokenizer_tpu.trainers import (
    BpeTrainer,
    BpeTrainerBuilder,
    BpeTrainerConfig,
    InlBpeTrainer,
    TrainerConfig,
    UnigramTrainer,
    UnigramTrainerConfig,
    WordPieceTrainer,
    WordPieceTrainerConfig,
)


def test_wordpiece():
    vocab = {"[UNK]": 0, "hello": 1, "world": 2, "##ing": 3, "play": 4, "##ed": 5}
    model = WordPieceModel(vocab, "##", "[UNK]", 100)
    assert model.encode("hello world") == [1, 2]
    assert model.decode([1, 2]) == "hello world"


def test_wordpiece_subwords():
    vocab = {"[UNK]": 0, "play": 1, "##ing": 2, "##ed": 3}
    model = WordPieceModel(vocab, "##", "[UNK]", 100)
    assert model.encode("playing") == [1, 2]
    assert model.decode([1, 2]) == "playing"


def test_wordpiece_max_chars():
    vocab = {"[UNK]": 0, "a": 1}
    model = WordPieceModel(vocab, "##", "[UNK]", 3)
    assert model.encode("aaaa") == [0]


def test_unigram():
    vocab = [
        ("<unk>", -10.0),
        ("a", -1.0),
        ("b", -1.0),
        ("c", -1.0),
        ("ab", -0.5),
        ("bc", -0.5),
        ("abc", -0.2),
    ]
    model = UnigramModel(vocab, "<unk>")
    tokens = model.encode("abc")
    assert len(tokens) == 1
    assert model.id_to_token(tokens[0]) == "abc"


def test_word_level():
    vocab = {"<unk>": 0, "hello": 1, "world": 2}
    model = WordLevelModel(vocab, "<unk>")
    assert model.encode("hello world") == [1, 2]
    assert model.decode([1, 2]) == "hello world"
    assert model.encode("hello unknown") == [1, 0]


def test_char_bpe():
    vocab = {"<unk>": 0, "h": 1, "i</w>": 2, "hi</w>": 3}
    merges = [("h", "i</w>")]
    model = CharBpeModel(vocab, merges, "</w>", "<unk>")
    assert model.encode("hi") == [3]
    assert model.decode([3]) == "hi"


def test_byte_level_bpe():
    vocab = {"<unk>": 0, "Ġ": 1, "h": 2, "i": 3, "Ġh": 4, "hi": 5, "Ġhi": 6}
    merges = [("Ġ", "h"), ("h", "i"), ("Ġh", "i")]
    model = ByteLevelBpeModel(vocab, merges, "<unk>", True)
    tokens = model.encode("hi")
    assert tokens
    assert "hi" in model.decode(tokens)


def test_bpe_trainer_basic():
    trainer = (
        BpeTrainerBuilder()
        .vocab_size(100)
        .min_frequency(1)
        .show_progress(False)
        .build()
    )
    texts = ["hello world", "hello there", "world hello", "hello hello hello"]
    vocab, merges = trainer.train(texts)
    assert len(vocab) >= 4
    assert merges
    # "hello" should be learnable as a token
    assert "hello" in vocab


def test_bpe_trainer_with_suffix():
    trainer = (
        BpeTrainerBuilder()
        .vocab_size(50)
        .min_frequency(1)
        .end_of_word_suffix("</w>")
        .show_progress(False)
        .build()
    )
    vocab, _ = trainer.train(["hello world"])
    assert any("</w>" in k for k in vocab)


def test_bpe_trainer_config():
    config = BpeTrainerConfig(vocab_size=10000, min_frequency=5)
    trainer = BpeTrainer(config)
    assert trainer.config.vocab_size == 10000
    assert trainer.config.min_frequency == 5


def test_inl_trainer_basic(tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("hello world hello world\nhello hello hello\n")
    trainer = InlBpeTrainer(TrainerConfig(vocab_size=300, min_frequency=1))
    trainer.train([p])
    assert trainer.vocab_size > 10
    assert trainer.num_merges > 0
    out = tmp_path / "tok.json"
    trainer.save(out)
    from complexity_tokenizer_tpu.tokenizer import Tokenizer

    tok = Tokenizer.from_file(out)
    tok.use_device = False
    ids = tok.encode("hello world")
    assert ids
    assert tok.decode_with_options(ids, False, False) == "hello world"


def test_inl_zeroed_matches_classic_greedy(tmp_path):
    # INL params zeroed -> scores are plain pair frequencies
    p = tmp_path / "c.txt"
    p.write_text("aaa bbb aaa bbb ccc\n")
    trainer = InlBpeTrainer(
        TrainerConfig(
            vocab_size=300, min_frequency=1, inl_alpha=0.0, inl_beta=0.0, inl_gate=0.0
        )
    )
    trainer.train([p])
    assert trainer.num_merges > 0


def test_inl_streaming_accumulation():
    trainer = InlBpeTrainer(TrainerConfig(vocab_size=300, min_frequency=1))
    trainer.count_batch(["hello world"])
    trainer.count_batch(["hello there", "world hello"])
    trainer.finish_training()
    assert trainer.vocab_size > 10


def test_wordpiece_trainer():
    config = WordPieceTrainerConfig(vocab_size=100, min_frequency=1)
    trainer = WordPieceTrainer(config)
    model = trainer.train_from_texts(["hello world", "hello there", "world peace"])
    assert model.vocab_size > 0
    assert model.encode("hello")


def test_unigram_trainer():
    config = UnigramTrainerConfig(
        vocab_size=50, initial_vocab_size=100, n_iterations=2
    )
    trainer = UnigramTrainer(config)
    model = trainer.train_from_texts(["hello world", "hello there", "world peace"])
    assert model.vocab_size > 0


def test_inl_byte_alphabet_size():
    from complexity_tokenizer_tpu.utils.bytelevel import bytes_to_unicode

    assert len(bytes_to_unicode()) == 256
    enc = bytes_to_unicode()
    assert enc[ord("a")] == "a"
    assert enc[ord("Z")] == "Z"


def test_trainer_native_count_matches_python():
    """The native corpus scanner's word counts must equal the ByteLevel
    pre-tokenize counts exactly (keys are encoded words)."""
    from collections import Counter

    import numpy as np

    from complexity_tokenizer_tpu.core import pretokenizers as PT
    from complexity_tokenizer_tpu.trainers.inl_trainer import (
        InlBpeTrainer,
        TrainerConfig,
    )

    rng = np.random.RandomState(3)
    alphabet = list("abc ABC '!.12é日 \n\t0")
    texts = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
             for _ in range(300)]
    texts += ["don't it's we're I'll", "  lead", "trail  ", "", "ééé 日本語"]
    tr = InlBpeTrainer(TrainerConfig(vocab_size=300, min_frequency=1))
    got = tr._count_words(texts)
    ptok = PT.ByteLevel(add_prefix_space=False)
    norm = tr.config.normalizer
    exp = Counter()
    for t in texts:
        if norm is not None:
            t = norm.normalize(t)
        for w in ptok.pre_tokenize(t):
            if len(w) >= tr.config.min_word_length:
                exp[w] += 1
    assert got == exp


def test_wordpiece_device_matches_host_fuzz():
    """Device greedy longest-match kernel (rolling-hash CHD + exact verify)
    vs the host scalar loop, over a trained-style vocab and adversarial
    words (SURVEY C17)."""
    import numpy as np

    from complexity_tokenizer_tpu.models.wordpiece import WordPieceModel
    from complexity_tokenizer_tpu.ops.wordpiece_device import (
        WordPieceDevice,
        build_wordpiece_tables,
    )

    rng = np.random.RandomState(9)
    # vocab with singles, multi-char pieces, continuations, unicode
    vocab = {"[UNK]": 0}
    pieces = set()
    for _ in range(400):
        n = rng.randint(1, 6)
        pieces.add("".join(rng.choice(list("abcdeé日")) for _ in range(n)))
    for p in sorted(pieces):
        vocab.setdefault(p, len(vocab))
        vocab.setdefault("##" + p, len(vocab))
    m = WordPieceModel(vocab)
    t = build_wordpiece_tables(m)
    assert t is not None
    dev = WordPieceDevice(t)

    words = []
    for _ in range(300):
        n = rng.randint(0, 20)
        words.append("".join(rng.choice(list("abcdefé日z")) for _ in range(n)))
    words += ["x" * 150, "a" * 100, "a" * 101, ""]  # UNK-limit edges
    got = dev.tokenize_words(words)
    for i in getattr(dev, "last_poisoned", []):
        got[i] = m.tokenize_word(words[i])
    exp = [m.tokenize_word(w) for w in words]
    assert got == exp

    # batch API end-to-end
    texts = [" ".join(words[k : k + 7]) for k in range(0, 280, 7)]
    assert m.encode_batch(texts) == [m.encode(t_) for t_ in texts]


def test_wordpiece_device_literal_prefix_words():
    """A vocab entry that literally starts with the continuation prefix
    ("##abc") must match at word start by its full spelling — the start==0
    probe in models.rs:63-66 looks up the raw substring.  Regression: the
    device table used to hold only the continuation-seeded form, silently
    diverging from the host on words that literally begin with "##"."""
    from complexity_tokenizer_tpu.models.wordpiece import WordPieceModel
    from complexity_tokenizer_tpu.ops.wordpiece_device import (
        WordPieceDevice,
        build_wordpiece_tables,
    )

    vocab = {"[UNK]": 0, "#": 1, "##abc": 2, "a": 3, "b": 4, "c": 5,
             "##b": 6, "##c": 7, "##a": 8, "##1": 9, "1": 10, "##": 11}
    m = WordPieceModel(vocab)
    dev = WordPieceDevice(build_wordpiece_tables(m))
    words = ["##abc", "##1", "abc", "a1c", "#", "##", "ab", "x##abc", "a##1"]
    got = dev.tokenize_words(words)
    for i in getattr(dev, "last_poisoned", []):
        got[i] = m.tokenize_word(words[i])
    assert got == [m.tokenize_word(w) for w in words]

    # empty continuation prefix: every entry is matchable both plain and
    # as a continuation
    m2 = WordPieceModel({"[UNK]": 0, "ab": 1, "a": 2, "b": 3, "c": 4},
                        continuing_subword_prefix="")
    dev2 = WordPieceDevice(build_wordpiece_tables(m2))
    words2 = ["abc", "abab", "cab", "bbb"]
    got2 = dev2.tokenize_words(words2)
    for i in getattr(dev2, "last_poisoned", []):
        got2[i] = m2.tokenize_word(words2[i])
    assert got2 == [m2.tokenize_word(w) for w in words2]


def test_wordpiece_device_no_unk_in_vocab():
    from complexity_tokenizer_tpu.models.wordpiece import WordPieceModel
    from complexity_tokenizer_tpu.ops.wordpiece_device import (
        WordPieceDevice,
        build_wordpiece_tables,
    )

    m = WordPieceModel({"ab": 0, "##c": 1}, unk_token="[UNK]")  # UNK absent
    t = build_wordpiece_tables(m)
    dev = WordPieceDevice(t)
    words = ["abc", "abz", "zz", "ab"]
    got = dev.tokenize_words(words)
    exp = [m.tokenize_word(w) for w in words]
    assert got == exp


def test_wordlevel_device_matches_host():
    """Device whole-word CHD lookup + exact verify vs dict lookup."""
    import numpy as np

    from complexity_tokenizer_tpu.models.wordlevel import WordLevelModel

    rng = np.random.RandomState(4)
    words = sorted({"".join(rng.choice(list("abcé日")) for _ in range(rng.randint(1, 9)))
                    for _ in range(300)})
    vocab = {"<unk>": 0}
    for w in words:
        vocab.setdefault(w, len(vocab))
    m = WordLevelModel(vocab)
    assert m._get_device() is not None
    texts = [" ".join(rng.choice(words + ["zzz", "missing", "日日日日"]) for _ in range(10))
             for _ in range(40)] + ["", "  ", "x" * 300]
    assert m.encode_batch(texts) == [m.encode(t) for t in texts]


def test_unigram_device_matches_host_fuzz():
    """Device Viterbi (scan DP + CHD piece lookup + f32-ambiguity
    poisoning) must be bit-exact vs the host f64 DP through encode_batch
    (SURVEY C17)."""
    import numpy as np

    from complexity_tokenizer_tpu.models.unigram import UnigramModel

    rng = np.random.RandomState(6)
    pieces = sorted({"".join(rng.choice(list("abxé日")) for _ in range(rng.randint(1, 5)))
                     for _ in range(150)})
    vocab = [("<unk>", -10.0)] + [(p, float(-rng.uniform(1, 8))) for p in pieces]
    m = UnigramModel(vocab)
    assert m._get_device() is not None
    texts = ["".join(rng.choice(list("abxézq日")) for _ in range(rng.randint(0, 35)))
             for _ in range(250)]
    texts += ["", "q", "qq", "a" * 120, "ab" * 60]
    assert m.encode_batch(texts) == [m.tokenize(t) for t in texts]


def test_unigram_device_exact_tie_poisons_to_host():
    """Same-multiset segmentations are exact ties in any precision; the
    ambiguity guard must route them to host rather than guess."""
    from complexity_tokenizer_tpu.models.unigram import UnigramModel

    # 'aa' can split as [a][a] or use piece 'aa': craft equal totals
    m = UnigramModel([("<unk>", -10.0), ("a", -2.0), ("aa", -4.0)])
    texts = ["aaaa", "aa", "aaa"]
    assert m.encode_batch(texts) == [m.tokenize(t) for t in texts]


def test_charbpe_device_matches_host_fuzz():
    """CharBPE device path (shared C1 kernel + </w> seeding) vs host."""
    import numpy as np

    from complexity_tokenizer_tpu.models.charbpe import CharBpeModel

    # well-formed merge table built like a trainer would emit
    merges = [("l", "o"), ("lo", "w</w>"), ("e", "r</w>"), ("w", "e"),
              ("lo", "w"), ("n", "e"), ("ne", "w</w>"), ("we", "er</w>")]
    vocab = {"<unk>": 0}
    for sym in "lowernstuv":
        vocab.setdefault(sym, len(vocab))
        vocab.setdefault(sym + "</w>", len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    m = CharBpeModel(vocab, merges)
    rng = np.random.RandomState(8)
    texts = [" ".join("".join(rng.choice(list("lowernstz")) for _ in range(rng.randint(1, 9)))
                      for _ in range(rng.randint(0, 8))) for _ in range(120)]
    texts += ["", "low lower newer", "x" * 200]
    assert m.encode_batch(texts) == [m.encode(t) for t in texts]


def test_bytelevel_bpe_device_matches_host_fuzz():
    """ByteLevelBpeModel device path (space-attachment splitting + shared
    C1 kernel) vs host."""
    import numpy as np

    from complexity_tokenizer_tpu.models.bytelevel_bpe import ByteLevelBpeModel
    from complexity_tokenizer_tpu.utils.bytelevel import bytes_to_unicode

    enc = bytes_to_unicode()
    A = [enc[ord(c)] for c in "helowrd"]
    SP = enc[ord(" ")]
    merges = [(A[0], A[1]), (A[0] + A[1], A[2]), (SP, A[0]),
              (A[3], A[4]), (A[5], A[6])]
    vocab = {"<unk>": 0}
    for ch in set("".join(a + b for a, b in merges)) | set(A) | {SP}:
        vocab.setdefault(ch, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    m = ByteLevelBpeModel(vocab, merges)
    rng = np.random.RandomState(12)
    texts = [" ".join("".join(rng.choice(list("helowrdz é")) for _ in range(rng.randint(1, 8)))
                      for _ in range(rng.randint(0, 6))) for _ in range(120)]
    texts += ["", "hello world", "  double  spaces  "]
    assert m.encode_batch(texts) == [m.encode(t) for t in texts]
