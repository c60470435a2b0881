from molnextr_tpu.parallel.distributed import (
    barrier,
    gather_arrays,
    initialize,
    is_main_process,
    process_count,
)
from molnextr_tpu.parallel.mesh import (
    data_sharding,
    local_batch_size,
    make_mesh,
    pad_to_devices,
    replicated,
    shard_batch,
    shard_batch_group,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "shard_batch_group",
    "local_batch_size",
    "pad_to_devices",
    "initialize",
    "process_count",
    "is_main_process",
    "gather_arrays",
    "barrier",
]
