from ghost_tpu.parallel.dp import shard_train_step, replicate_state
from ghost_tpu.parallel.ep import make_expert_mesh, moe_apply_expert_parallel
from ghost_tpu.parallel.pp import (
    make_pipe_mesh,
    pipeline_apply,
    stack_block_params,
)
from ghost_tpu.parallel.sp import make_seq_mesh, ring_attention
from ghost_tpu.parallel.zero import zero_shard_opt_state, state_shardings

__all__ = [
    "shard_train_step",
    "replicate_state",
    "make_pipe_mesh",
    "pipeline_apply",
    "stack_block_params",
    "make_seq_mesh",
    "ring_attention",
    "make_expert_mesh",
    "moe_apply_expert_parallel",
    "zero_shard_opt_state",
    "state_shardings",
]
