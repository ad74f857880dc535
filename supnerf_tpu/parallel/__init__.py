from supnerf_tpu.parallel.mesh import (
    make_mesh,
    maybe_init_distributed,
    replicate_sharding,
    batch_sharding,
    shard_pytree_batch,
)
