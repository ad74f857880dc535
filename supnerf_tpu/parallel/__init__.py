from supnerf_tpu.parallel.mesh import (
    make_mesh,
    replicate_sharding,
    batch_sharding,
    shard_pytree_batch,
)
