from dualvgr_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
