from agenda_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    shard_params_fsdp,
    param_sharding_rules,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "shard_params_fsdp",
    "param_sharding_rules",
]
