from . import bpe, decoders, encoding, normalizers, postprocessors, pretokenizers, vocab

__all__ = [
    "bpe",
    "decoders",
    "encoding",
    "normalizers",
    "postprocessors",
    "pretokenizers",
    "vocab",
]
