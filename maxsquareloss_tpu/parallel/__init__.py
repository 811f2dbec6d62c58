from maxsquareloss_tpu.parallel.mesh import (
    batch_sharding,
    data_parallel_mesh,
    replicate,
    replicate_tree,
    shard_batch,
)
