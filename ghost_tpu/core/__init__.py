from ghost_tpu.core.precision import Policy, DEFAULT_POLICY, FULL_PRECISION
from ghost_tpu.core.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from ghost_tpu.core.loss_scale import DynamicLossScale

__all__ = [
    "Policy",
    "DEFAULT_POLICY",
    "FULL_PRECISION",
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "DynamicLossScale",
]
