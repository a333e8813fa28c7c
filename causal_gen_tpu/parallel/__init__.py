from causal_gen_tpu.parallel.distributed import (
    host_shard_indices,
    initialize_multihost,
    make_global_batch,
)
from causal_gen_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_partition_spec,
    replicate,
    shard_batch,
    shard_params_tp,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "shard_batch",
    "replicate",
    "param_partition_spec",
    "shard_params_tp",
    "initialize_multihost",
    "host_shard_indices",
    "make_global_batch",
]
