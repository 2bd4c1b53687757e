from .mesh import (
    data_parallel_mesh,
    make_data_parallel_step,
    replicate_sharding,
    shard_batch,
)
