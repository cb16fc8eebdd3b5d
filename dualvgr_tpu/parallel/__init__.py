from dualvgr_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_mesh,
    maybe_initialize_distributed,
    prefetch_to_device,
    replicate,
    replicated_sharding,
    shard_batch,
)
