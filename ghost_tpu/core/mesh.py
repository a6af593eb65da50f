"""Device mesh and sharding helpers.

The reference's only multi-device machinery is apex DDP (bucketed NCCL
allreduce, reference apex/apex/parallel/distributed.py:129) plus SyncBN
and ZeRO-sharded optimizers. Under JAX SPMD all of that collapses into
mesh + sharding annotations: grads are psum'd by XLA over ICI, BN stats
are pmean'd inside the step, and optimizer state inherits the params'
NamedSharding (see parallel/zero.py).

Conventions:
  axis "data"  — batch / video-frame axis (DDP equivalent)
  axis "model" — channel/tensor axis for wide convs (optional TP)
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    data: int | None = None,
    model: int = 1,
) -> Mesh:
    """Build a ("data", "model") mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_mesh_1d(axis: str, num_devices: int,
                 devices: Sequence[jax.Device] | None = None) -> Mesh:
    """A 1-D (axis,) mesh over the first `num_devices` devices — the
    shared constructor behind parallel.{pp,sp,ep}'s named helpers."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < num_devices:
        raise ValueError(
            f"need {num_devices} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:num_devices]), (axis,))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of arrays with the batch dim sharded on "data"."""

    def put(x):
        return jax.device_put(x, data_sharding(mesh, ndim=np.ndim(x)))

    return jax.tree.map(put, batch)
