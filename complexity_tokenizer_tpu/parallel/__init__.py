from . import mesh
from .encode import shard_encode_pipeline
from .mesh import batch_sharding, data_mesh, initialize_distributed

__all__ = [
    "mesh",
    "shard_encode_pipeline",
    "batch_sharding",
    "data_mesh",
    "initialize_distributed",
]


def __getattr__(name):
    if name == "DistributedInlTrainer":
        from .trainer import DistributedInlTrainer

        return DistributedInlTrainer
    if name == "DistributedUnigramTrainer":
        from .unigram_trainer import DistributedUnigramTrainer

        return DistributedUnigramTrainer
    if name == "DistributedWordPieceTrainer":
        from .wordpiece_trainer import DistributedWordPieceTrainer

        return DistributedWordPieceTrainer
    raise AttributeError(name)
