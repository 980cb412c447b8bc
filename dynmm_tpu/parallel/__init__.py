"""Device-mesh / sharding helpers (pjit SPMD scale-out)."""

from dynmm_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    make_global_batch,
    ProcessShard,
    shard_params,
    replicate,
    MODEL_SHARDING_RULES,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "make_global_batch",
    "ProcessShard",
    "shard_params",
    "replicate",
    "MODEL_SHARDING_RULES",
]
