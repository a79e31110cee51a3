from convtasnet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    init_distributed,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
