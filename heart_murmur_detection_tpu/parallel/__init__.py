from .mesh import (
    data_parallel_mesh,
    put_replicated,
    replicate_sharding,
    shard_batch,
)
