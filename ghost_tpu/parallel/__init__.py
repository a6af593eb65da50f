from ghost_tpu.parallel.dp import shard_train_step, replicate_state
from ghost_tpu.parallel.zero import zero_shard_opt_state, state_shardings

__all__ = [
    "shard_train_step",
    "replicate_state",
    "zero_shard_opt_state",
    "state_shardings",
]
