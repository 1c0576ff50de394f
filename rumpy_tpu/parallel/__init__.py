from rumpy_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
