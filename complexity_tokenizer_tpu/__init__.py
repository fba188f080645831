"""complexity_tokenizer_tpu — TPU-native BPE tokenizer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Complexity-ML/complexity-tokenizer: HuggingFace tokenizer.json loading, the
full encode pipeline (normalize -> pre-split -> BPE merge -> post-process)
running on device over fixed-width byte tensors, batch decode, training
(classic BPE, INL-BPE, WordPiece, Unigram), and multi-host scaling over a
``jax.sharding.Mesh``.

Public surface mirrors the reference's Python module registration
(`/root/reference/src/lib.rs:47-67`).
"""

from .version import __version__  # noqa: F401

__all__ = ["__version__"]


def __getattr__(name):
    # Lazy imports keep `import complexity_tokenizer_tpu` light (no jax
    # initialization until a device path is touched).
    if name in ("Tokenizer", "Encoding", "BatchEncoding"):
        from . import tokenizer as _t

        return getattr(_t, name)
    if name in ("Trainer", "WordPieceTrainer", "UnigramTrainer", "BpeTrainer"):
        from . import trainers as _tr

        return getattr(_tr, name)
    if name in (
        "WordPieceModel",
        "UnigramModel",
        "WordLevelModel",
        "CharBpeModel",
        "ByteLevelBpeModel",
    ):
        from . import models as _m

        return getattr(_m, name)
    if name in ("Normalizer", "PreTokenizer", "PostProcessor", "Decoder"):
        from . import components as _c

        return getattr(_c, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
