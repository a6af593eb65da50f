"""ZeRO-style optimizer-state sharding via NamedSharding.

The reference ships DistributedFusedAdam/LAMB: optimizer state sharded
across ranks with reductions overlapped with backprop, implemented as
multi-tensor CUDA kernels + Python bucket drivers (reference
apex/apex/contrib/optimizers/distributed_fused_adam.py:9,32-39,
apex/csrc/multi_tensor_distopt_adam.cu). Under GSPMD the same memory
win is a sharding annotation on the optimizer pytree: each Adam moment
leaf is split along its largest dimension divisible by the data-axis
size; XLA inserts the reduce-scatter/all-gather pair around the update
and overlaps it with the backward pass.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ghost_tpu.core.mesh import DATA_AXIS


def _leaf_spec(x, axis_size: int) -> P:
    shape = getattr(x, "shape", ())
    for dim, size in enumerate(shape):
        if size % axis_size == 0 and size >= axis_size:
            return P(*([None] * dim), DATA_AXIS)
    return P()


def opt_state_shardings(mesh: Mesh, opt_state: Any) -> Any:
    """Per-leaf NamedShardings splitting moments across the data axis."""
    axis_size = mesh.shape[DATA_AXIS]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, _leaf_spec(x, axis_size)), opt_state
    )


def zero_shard_opt_state(mesh: Mesh, opt_state: Any) -> Any:
    """Place an optimizer state tree with ZeRO sharding."""
    return jax.device_put(opt_state, opt_state_shardings(mesh, opt_state))


def state_shardings(mesh: Mesh, state: Any, zero_fields=("g_opt", "d_opt")) -> Any:
    """Sharding tree for a TrainState: params/stats replicated, optimizer
    moments ZeRO-sharded. Pass to jax.device_put or jit in_shardings."""
    axis_size = mesh.shape[DATA_AXIS]
    repl = NamedSharding(mesh, P())

    def build(path_prefix, subtree):
        if path_prefix in zero_fields:
            return jax.tree.map(
                lambda x: NamedSharding(mesh, _leaf_spec(x, axis_size)), subtree
            )
        return jax.tree.map(lambda _: repl, subtree)

    # flax.struct dataclass: iterate dataclass fields
    import dataclasses

    out = {}
    for f in dataclasses.fields(state):
        out[f.name] = build(f.name, getattr(state, f.name))
    return type(state)(**out)
