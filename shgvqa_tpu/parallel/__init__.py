from shgvqa_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    partition_params,
    shard_batch,
    shard_state,
)
