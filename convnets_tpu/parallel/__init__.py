from convnets_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
    init_distributed,
)
