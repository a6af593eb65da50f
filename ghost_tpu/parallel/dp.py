"""Data-parallel train-step wiring — the apex DDP/SyncBN equivalent.

The reference's multi-device story is apex DistributedDataParallel:
param broadcast at init + bucketed NCCL grad allreduce overlapped with
backward (reference apex/apex/parallel/distributed.py:129-200), plus
SyncBatchNorm kernels for cross-process batch stats (reference
apex/csrc/welford.cu, apex/apex/parallel/sync_batchnorm.py:9).

Under jit + GSPMD all of it is sharding annotations:

  * batch arrays sharded on the mesh "data" axis;
  * params/optimizer state replicated (or ZeRO-sharded, see zero.py);
  * XLA inserts the grad psum over ICI and overlaps it with the
    backward pass via its latency-hiding scheduler — no buckets to
    tune, no streams;
  * BN statistics: the train step computes jnp.mean over the GLOBAL
    batch axis (global-view semantics), which IS synchronized batch
    norm; nothing per-replica exists to desynchronize.

`jax.distributed.initialize` is the multi-host launcher replacing
apex.parallel.multiproc (reference apex/apex/parallel/multiproc.py:5-35).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ghost_tpu.core.mesh import DATA_AXIS


def replicate_state(mesh: Mesh, state: Any) -> Any:
    """Broadcast the train state to every device (DDP param broadcast,
    reference apex/apex/parallel/distributed.py:560 equivalent)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def shard_batch_on_mesh(mesh: Mesh, batch: Any) -> Any:
    """Device-put batch arrays with the leading axis on "data"."""
    def put(x):
        ndim = getattr(x, "ndim", 0)
        spec = P(DATA_AXIS, *([None] * (ndim - 1))) if ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def _check_batch_sharding(mesh: Mesh, batch: Any) -> None:
    """Catch the two silent DDP misconfigurations GSPMD can't error on:
    a batch whose leading axis doesn't divide over "data" (XLA would
    pad-replicate and quietly train on duplicated samples), and a batch
    leaf committed to a non-data-leading layout (XLA would insert an
    all-to-all resharding every step instead of failing)."""
    n_data = mesh.shape.get(DATA_AXIS, 1)
    for path, leaf in jax.tree_util.tree_flatten_with_path(batch)[0]:
        ndim = getattr(leaf, "ndim", 0)
        if not ndim:
            continue
        name = jax.tree_util.keystr(path)
        if leaf.shape[0] % n_data:
            raise ValueError(
                f"batch leaf {name} has leading dim {leaf.shape[0]}, not "
                f"divisible by mesh '{DATA_AXIS}' size {n_data}")
        sharding = getattr(leaf, "sharding", None)
        if (isinstance(sharding, NamedSharding) and sharding.mesh == mesh
                and sharding.spec):
            lead = sharding.spec[0]
            if lead is not None and lead != DATA_AXIS:
                raise ValueError(
                    f"batch leaf {name} is sharded with leading axis "
                    f"{lead!r}; expected '{DATA_AXIS}' "
                    f"(use shard_batch_on_mesh)")


def shard_train_step(
    mesh: Mesh,
    step_fn: Callable,
    donate_state: bool = True,
    check_shardings: bool = True,
) -> Callable:
    """Compile `step_fn(state, batch, ...) -> (state, ...)` for the mesh.

    Inputs carry their shardings (replicate_state / shard_batch_on_mesh);
    jit propagates them and XLA inserts the grad psum over ICI. The
    state buffer is donated so params update in place. Each call first
    validates the batch layout (`_check_batch_sharding`) — the failure
    modes apex DDP surfaces as NCCL size mismatches are silent
    performance bugs under GSPMD, so they're checked eagerly here.
    """
    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())
    if not check_shardings:
        return jitted

    def step(state, batch, *args, **kwargs):
        _check_batch_sharding(mesh, batch)
        return jitted(state, batch, *args, **kwargs)

    step.jitted = jitted
    return step


def launch_multihost(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up (apex.parallel.multiproc equivalent)."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
