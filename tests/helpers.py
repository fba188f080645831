"""Shared fixtures: a deterministic conformance corpus and a trained
byte-level BPE tokenizer.json (built once per session with the INL trainer,
INL terms zeroed = classic BPE)."""

import functools
import json

SAMPLE_TEXT = """
The quick brown fox jumps over the lazy dog. It's a test, isn't it?
Hello, world! Numbers: 123 456 7890. Prices are $5.99 and $120.00 today.
We're testing contractions: I'll, you've, they'd, he's, she'll, won't.
Multiple   spaces and
newlines\tand tabs appear here. CAFÉ café naïve déjà vu résumé.
日本語のテキストもあります。 Русский текст здесь. Ελληνικά γράμματα.
Mixed123alpha456numeric. punctuation!!! ... --- (parens) [brackets] {braces}
emoji: 🎉🚀 and symbols: © ® ™ € £ ¥
""".strip()


def conformance_corpus():
    """Deterministic texts covering the BASELINE.json config families."""
    base = [
        "Hello, world!",
        "The quick brown fox jumps over the lazy dog.",
        "that's it, we're done - isn't it?",
        "  leading spaces",
        "trailing spaces  ",
        "a  b   c    d",
        "tabs\tand\nnewlines\r\nhere",
        "123 456.789 $100 50%",
        "CAFÉ café naïve déjà",
        "日本語テキスト and English",
        "Ελληνικά Русский العربية עברית",
        "emoji 🎉 test 🚀 done",
        "'s starts with contraction",
        "ends with quote'",
        "''double'' 'single'",
        "x'll y've z're w'd v'm u't t's",
        "a!'s b?'t c.'re",
        "",
        " ",
        "   ",
        "don'ts and won'ts",
        "price $100 and $50's",
        "under_scores and-dashes",
        "UPPERCASE lowercase MiXeD",
        " nbsp\u00a0emspace\u2003ideographic\u3000ws",
        # NFC-unstable rows (decomposed accents, combining reordering,
        # Hangul jamo): exercise the device normalization stability
        # check's host-rewrite routing (ops/normalize_device.py)
        "cafe\u0301 decomposed re\u0301sume\u0301",
        "orderings d\u0323\u0307 and d\u0307\u0323 differ",
        "\ud55c\uad6d\uc5b4 and jamo \u1100\u1161 sequence",
        " nbsp emspace　ideographic",
    ]
    # mixed lengths for bucketing coverage
    long1 = " ".join(["word%d" % i for i in range(100)])
    long2 = "supercalifragilisticexpialidocious " * 20
    long3 = SAMPLE_TEXT.replace("\n", " ")
    return base + [long1, long2, long3]


@functools.lru_cache(maxsize=None)
def trained_tokenizer_json(vocab_size: int = 800) -> str:
    """Train a small byte-level BPE tokenizer; returns tokenizer.json text."""
    from complexity_tokenizer_tpu.trainers.inl_trainer import (
        InlBpeTrainer,
        TrainerConfig,
    )

    config = TrainerConfig(
        vocab_size=vocab_size,
        min_frequency=1,
        inl_alpha=0.0,
        inl_beta=0.0,
        inl_gate=0.0,
    )
    trainer = InlBpeTrainer(config)
    texts = [SAMPLE_TEXT] * 3 + conformance_corpus()
    trainer.train_from_texts(texts)
    import io

    buf = io.StringIO()
    j = {
        "version": "1.0",
        "model": {
            "type": "BPE",
            "vocab": trainer.vocab,
            "merges": [f"{a} {b}" for a, b in trainer.merges],
        },
        "added_tokens": [
            {
                "id": i,
                "content": tok,
                "special": True,
                "single_word": False,
                "lstrip": False,
                "rstrip": False,
                "normalized": False,
            }
            for i, tok in enumerate(config.special_tokens)
        ],
        "normalizer": {"type": "NFC"},
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False},
        "decoder": {"type": "ByteLevel"},
    }
    json.dump(j, buf, ensure_ascii=False)
    return buf.getvalue()


def trained_tokenizer(vocab_size: int = 800):
    """A fresh Tokenizer per call (tests mutate them); JSON is cached."""
    from complexity_tokenizer_tpu.tokenizer import Tokenizer

    return Tokenizer.from_str(trained_tokenizer_json(vocab_size))
