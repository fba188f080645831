from .bytelevel_bpe import ByteLevelBpeModel
from .charbpe import CharBpeModel
from .unigram import UnigramModel
from .wordlevel import WordLevelModel
from .wordpiece import WordPieceModel

__all__ = [
    "ByteLevelBpeModel",
    "CharBpeModel",
    "UnigramModel",
    "WordLevelModel",
    "WordPieceModel",
]
