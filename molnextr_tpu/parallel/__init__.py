from molnextr_tpu.parallel.mesh import (
    data_sharding,
    local_batch_size,
    make_mesh,
    pad_to_devices,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "local_batch_size",
    "pad_to_devices",
]
