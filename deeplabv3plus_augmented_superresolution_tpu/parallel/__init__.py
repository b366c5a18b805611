from .mesh import aug_sharding, data_sharding, make_mesh, replicated
from .sharded import make_asr_batch_fn, shard_batch

__all__ = [
    "aug_sharding",
    "data_sharding",
    "make_mesh",
    "replicated",
    "make_asr_batch_fn",
    "shard_batch",
]
