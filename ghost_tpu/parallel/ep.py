"""Expert parallelism: MoE expert stacks sharded over an "expert" axis.

The reference has NO expert parallelism (SURVEY.md §2.5 — its complete
distributed surface is DDP + SyncBN + ZeRO); this closes the last
letter of the dp/tp/pp/sp/ep matrix for the rebuild. `nn/moe.py`
defines the layer so that its output is LINEAR in the expert axis:
y = sum_e gate_e(x) * f_e(x). Expert parallelism is then the natural
partition of that sum — each device holds E/n experts' params
(leading dim sharded on "expert"), computes its partial gate-weighted
sum for all tokens, and a single `psum` over ICI produces the exact
dense result. The router is tiny and runs replicated.

This is the dense-dispatch variant (every device sees every token):
exact, static-shape, no capacity factor, no dropped tokens — the right
trade at face-swap scale where token counts are modest and experts are
the memory cost being sharded. The classic all_to_all token-routing
variant only wins when tokens x experts FLOPs dominate the a2a
bandwidth; it drops in behind the same `expert_contrib` contract if
ever needed.
"""

from __future__ import annotations

from typing import Sequence

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ghost_tpu.nn.moe import expert_contrib, gate_weights

EXPERT_AXIS = "expert"


def make_expert_mesh(num_devices: int,
                     devices: Sequence[jax.Device] | None = None) -> Mesh:
    """A 1-D ("expert",) mesh over the first `num_devices` devices."""
    from ghost_tpu.core.mesh import make_mesh_1d

    return make_mesh_1d(EXPERT_AXIS, num_devices, devices)


def moe_apply_expert_parallel(params: dict, x: jax.Array, *,
                              mesh: Mesh, axis: str = EXPERT_AXIS,
                              top_k: int = 2,
                              batch_axis: str | None = None) -> jax.Array:
    """`nn.moe.moe_apply` with experts sharded over `axis`.

    params: as `init_moe_params` (num_experts divisible by the axis
    size). x: (..., D), replicated. Output matches the dense reference
    exactly (tested on the 8-device CPU mesh, fwd and grads — the psum
    transposes cleanly so training shards the same way). batch_axis
    optionally shards the token dim over a second mesh axis (2-D
    data x expert composition; the expert psum stays on `axis`).
    """
    n = mesh.shape[axis]
    num_experts = params["w1"].shape[0]
    if num_experts % n:
        raise ValueError(f"{num_experts} experts not divisible by "
                         f"{n} devices")
    eps = num_experts // n
    shape = x.shape
    xf = x.reshape(-1, shape[-1])

    expert_leaves = {k: params[k] for k in ("w1", "b1", "w2", "b2")}
    router = params["router"]

    def local_fn(ep, router, xf):
        idx = jax.lax.axis_index(axis)
        gates = gate_weights({"router": router}, xf, top_k)
        local_gates = jax.lax.dynamic_slice_in_dim(
            gates, idx * eps, eps, axis=1)
        partial = expert_contrib(ep, xf, local_gates)
        return jax.lax.psum(partial, axis)

    x_spec = P(batch_axis)
    shmap = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), expert_leaves),
                  P(), x_spec),
        out_specs=x_spec)
    return shmap(expert_leaves, router, xf).reshape(shape)
